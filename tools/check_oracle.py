#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (builder tooling only,
not part of the library). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name ...]

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same sf tables, and compares: column set, row count, and value hash
(columns sorted by name, rows sorted by all columns, floats rounded).
"""
import duckdb, json, math, sys, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        if only and name not in only:
            continue
        cur = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        scols = [d[0] for d in cur.description]
        srows = cur.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(srows)} rows")
            continue
        try:
            cur = con.execute(oracle[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            continue
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        if sc != oc:
            n_fail += 1
            print(f"  [FAIL-cols] {name}: spark={sc} duck={oc}")
        elif len(sr) != len(orr):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(sr)} duck={len(orr)}")
        elif sr != orr:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"  [FAIL-vals] {name}: first diffs {diffs}")
        else:
            n_pass += 1
            print(f"  [ok       ] {name}: {len(sr)} rows")
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
