#!/usr/bin/env python3
"""Single-node comparison bar (builder tooling): time each oracle SQL in
DuckDB on the same sf tables. The reference delegates all query work to a
single-node SQL engine, so DuckDB-on-the-same-queries is the honest
'single-node throughput' baseline for BENCH comparison.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception:
                best = -1.0
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    total = sum(v for v in times.values() if v > 0)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                      "unit": "sec", "queries": times, "sf": sfdir}))

if __name__ == "__main__":
    main()
