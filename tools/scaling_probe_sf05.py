"""Core-count scaling probe at sf0.5 (r13 verdict #7).

The driver's 8-vs-32-core block runs at sf0.1, where headliners are
dominated by per-job scheduling constants and every ratio reads ≈1 — a
genuinely serial plan could hide. This probe times the top sf0.5-marginal
queries at sf0.5 under $SPARK_GRAFT_CPUS ∈ {8, 32} (one fresh process per
core count — run this script once per setting), with the bench sentinel
printed so box drift between the two runs is visible.

Protocol per query: identical to bench.py (untimed warmup, median of 3
noop-sink runs). Results merge into tools/scaling_sf05.json keyed by the
core count.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scaling_probe_sf05.py
    SPARK_GRAFT_CPUS=8  python tools/scaling_probe_sf05.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

BIG_DIR = "/root/repo/.localdata/sf0.5"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_sf05.json")

# top sf0.5 spark marginals (slope_sf05.json, post-r14 fixes) + the two
# heaviest spark-only CC consumers — the queries whose scale behavior
# matters most; sub-second-marginal queries can't be distinguished from
# constants at any core count.
QUERIES = [
    "docs_edit_distance_pairs",
    "docs_minhash_pairs",
    "graph_lpa_communities",
    "docs_jaccard_capped_pairs",
    "graph_pagerank_trade",
    "graph_assortativity",
    "graph_kcore_trade",
    "graph_bfs_hops_trade",
    "emb_dup_clusters",
    "docs_canonical_manifest",
    "emb_semantic_dedup",
    "docs_duplicate_ngram_spans",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from data_engineering_project_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"scaling_probe_c{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))
        },
    )
    queries = entrymod.queries()

    # bench sentinel: fixed-size reference job, printed so the two core
    # counts' box speeds are comparable
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 2654435761 % 97)").collect()
    sentinel = time.perf_counter() - t0

    rows = {}
    for name in QUERIES:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"scaling_c{cpus}:{name}")
        rows[name] = round(bench._time_spark(fn, spark, BIG_DIR, 3), 3)
        print(f"c{cpus} {name:36s} {rows[name]:7.2f}", flush=True)

    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            merged = json.load(fh)
    merged[f"c{cpus}"] = {
        "sentinel_sec": round(sentinel, 3),
        "sf_dir": BIG_DIR,
        "queries": rows,
    }
    if "c8" in merged and "c32" in merged:
        merged["ratio_c8_over_c32"] = {
            q: (
                round(merged["c8"]["queries"][q] / merged["c32"]["queries"][q], 2)
                if merged["c32"]["queries"].get(q)
                else None
            )
            for q in merged["c32"]["queries"]
            if q in merged["c8"]["queries"]
        }
    with open(OUT, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(f"wrote {OUT} (sentinel {sentinel:.2f}s)")


if __name__ == "__main__":
    main()
