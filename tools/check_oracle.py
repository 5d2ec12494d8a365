#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (builder tooling only,
not part of the library). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name ...]

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same sf tables, and compares: column set, row count, and value hash
(columns sorted by name, rows sorted by all columns, floats rounded).
"""
import duckdb, json, math, re, sys, os, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Closed set of output types the driver's comparator renders the same
# way on both engines. Anything else (HUGEINT from SUM(integer), UHUGEINT,
# INTERVAL, ...) hash-mismatches driver-side even when values are equal,
# so it is a hard local error: cast the column in the oracle SQL.
#
# SCALAR TYPES ONLY (r8 rule): the driver canonicalizes rows via pandas
# sort_values over all columns, which throws "unhashable type:
# numpy.ndarray" on ANY list/struct/map cell — so non-scalar top-level
# output columns are a hard FAIL-type on BOTH the oracle side and the
# Spark side. Serialize arrays with array_join (Spark) /
# array_to_string (DuckDB) before output, as a2/a8/tx13 do.
# BLOB was dropped from the set in r9: no query outputs raw bytes (binary
# payloads are hex-/hash-serialized before output) and raw BLOB rendering
# parity was never proven.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
                 "TIMESTAMP WITH TIME ZONE"}

def type_ok(t):
    t = str(t).strip()
    # Non-scalar output is never OK, whatever the element type.
    if t.endswith("[]") or t.startswith(("STRUCT(", "MAP(", "UNION(")):
        return False
    if re.fullmatch(r"DECIMAL\(\d+,\s*\d+\)", t):
        return True
    return t in ALLOWED_TYPES

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
    # Coverage closure (r10 rule, after the round-9 hole where 8 dead
    # queries silently vanished from the record): every query Verify
    # attempted must be accounted for. Verify writes _failures.json for
    # queries that threw and _attempted.json for the set it ran (which
    # SPARK_GRAFT_ONLY can restrict); any ATTEMPTED oracle entry with
    # neither a parquet dir nor a failure entry is ALSO a miss (e.g. a
    # stale outdir). Without _attempted.json (older outdirs) the closure
    # assumes the full oracle set was attempted.
    def load_json(fname, default):
        p = os.path.join(outdir, fname)
        return json.load(open(p)) if os.path.exists(p) else default
    fail_manifest = load_json("_failures.json", {})
    attempted = set(load_json("_attempted.json", list(oracle)))
    # INTENTIONAL (r11, was implicit in r10): a query that THREW fails
    # the run even when it has no oracle entry — rows-only queries are
    # part of the declared surface, and "threw" is broken regardless of
    # how the result would have been scored. Non-oracle failures get a
    # distinct tag so the two cases stay distinguishable in the record.
    for name, msg in sorted(fail_manifest.items()):
        if only and name not in only:
            continue
        n_fail += 1
        tag = "FAIL-run " if name in oracle else "FAIL-run*"  # * = rows-only query
        print(f"  [{tag}] {name}: query threw in Verify: {msg[:200]}")
    # a failed query's dir (if stale from an earlier run) must not be
    # re-scored as a result
    names = [n for n in names if n not in fail_manifest]
    missing = sorted((set(oracle) & attempted) - set(names) - set(fail_manifest))
    for name in missing:
        if only and name not in only:
            continue
        n_fail += 1
        print(f"  [FAIL-miss] {name}: oracle entry has no Verify output dir")
    for name in names:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            srel = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            scols = list(srel.columns)
            stypes = [str(t) for t in srel.types]
            srows = srel.fetchall()
        except Exception as e:
            # e.g. a dir left half-written by a crashed Verify: fail the
            # row, never the whole gate script
            n_fail += 1
            print(f"  [FAIL-read] {name}: unreadable output dir: {e}")
            continue
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(srows)} rows")
            continue
        sbad = [(c, t) for c, t in zip(scols, stypes) if not type_ok(t)]
        if sbad:
            n_fail += 1
            print(f"  [FAIL-type] {name}: non-portable SPARK output columns"
                  f" {sbad} — serialize/cast them in the Spark query")
            continue
        try:
            rel = con.sql(oracle[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            continue
        bad = [(c, t) for c, t in zip(ocols, otypes) if not type_ok(t)]
        if bad:
            n_fail += 1
            print(f"  [FAIL-type] {name}: engine-typed oracle columns {bad}"
                  f" — cast them (e.g. CAST(... AS BIGINT)) in the oracle SQL")
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
            # per-query wall time: at large SFs a handful of
            # deliberately-naive verification oracles dominate the gate's
            # runtime — make that visible instead of silent
            print(f"  [ok       ] {name}: {len(sr)} rows ({time.time() - t0:.1f}s)",
                  flush=True)
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
