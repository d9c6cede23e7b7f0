#!/usr/bin/env python3
"""DuckDB-side benchmark of the oracle SQL for the headline queries —
the comparison baseline for BENCH (1 warmup + 3 timed, median).
Usage: bench_duckdb.py <sfdir> <verify_outdir_with_oracle_json> [q1,q2,...]
"""
import duckdb, json, sys, time, statistics

HEADLINE = ["q_scan_pushdown", "q1_agg", "q_agg_distinct", "q_grouping_sets",
            "q3_top_revenue", "q5_region_revenue", "q_join_inner", "q_join_semi",
            "q_join_asof", "q_window_ranking", "q_window_running", "q_distinct_on",
            "q_topn", "q_union_all", "q_recursive_cte", "q_sessionize",
            "q_stream_tumbling", "q_dedup_exact", "q_dedup_minhash_sig",
            "q_sim_topk", "q_text_quality", "q_text_fingerprint"]
# the extended set is timed too (per-query pairs in the artifact) but its
# total is NOT folded into "value" — graft.Bench keeps the 22-query core
# total protocol-identical round-over-round
EXTENDED = ["q_ds11_channel_growth", "q_join_range", "q_geo_distance",
            "q_dedup_span", "q_window_groups", "q_cb09", "q_cb33",
            "q_job06a", "q_job09a", "q_h2o_g10", "q_h2o_j05",
            "q_window_median_unbounded", "q_ldbc_bi4", "q_ldbc_ic2",
            "q_jb2", "q_rn_transform_agg"]
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

sf = sys.argv[1]
out = sys.argv[2]
names = sys.argv[3].split(",") if len(sys.argv) > 3 else HEADLINE + EXTENDED
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
# DUCK_NATIVE=1: load-then-query, the reference harness's own protocol
# (tables ingested into native storage before timing — mirrors graft's
# warmed buffer pool). Default stays view-over-parquet for continuity
# with earlier rounds' numbers.
import os
if os.environ.get("DUCK_NATIVE"):
    for t in TABLES:
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
else:
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
res = {}
for n in names:
    if n not in oracle:
        continue
    sql = oracle[n]
    try:
        con.execute(sql).fetchall()  # warmup
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            ts.append(time.time() - t0)
        res[n] = statistics.median(ts)
    except Exception as e:
        res[n] = -1.0
        print(f"[bench_duckdb] {n} failed: {e}", file=sys.stderr)
# "value" stays the CORE-22 total (protocol continuity across rounds);
# extended queries ride only in "queries" for per-query ratio visibility
core_total = sum(v for n, v in res.items() if v >= 0 and n in HEADLINE)
print(json.dumps({"metric": "duckdb_total",
                  "value": core_total,
                  "total_extended": sum(v for v in res.values() if v >= 0),
                  "unit": "sec", "queries": res, "sf": sf}))
