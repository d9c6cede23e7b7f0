#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script executes
each oracle SQL in DuckDB over the same parquet tables and diffs against
the engine's parquet output (columns sorted by name, rows sorted, exact
compare with a float diagnostic on mismatch)."""
import duckdb, glob, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    return df[sorted(df.columns)].reset_index(drop=True)

def cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output")
            nfail += 1
            continue
        try:
            mine = canon(con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf())
            ref = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            nfail += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            nfail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            nfail += 1
            continue
        a = [[cell(v) for v in row] for row in mine.itertuples(index=False)]
        b = [[cell(v) for v in row] for row in ref.itertuples(index=False)]
        a.sort(); b.sort()
        if a == b:
            print(f"PASS {name} ({len(ref)} rows)")
            npass += 1
        else:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {bad}")
            nfail += 1
    # rows-only queries
    for d in sorted(glob.glob(f"{out}/q*")):
        name = os.path.basename(d)
        if name in oracle or (only and name not in only):
            continue
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only: {n})")
        if n > 0: npass += 1
        else: nfail += 1
    print(f"\n{npass} passed, {nfail} failed")
    sys.exit(1 if nfail else 0)

main()
