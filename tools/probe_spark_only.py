"""Spark-only sf0.1 -> sf0.5 probe for slope-EXCLUDED queries.

Some catalog queries have DuckDB twins that are recursive CTEs (connected
components) which grind 400+ s at sf0.5 — tools/slope_big.py excludes them
from the ratio instrument (the jaccard_bucket_probe precedent). This tool
re-measures their SPARK side only, with the identical timing protocol
(untimed warmup, median of N noop-sink runs via bench._time_spark), and
merges the numbers into tools/slope_sf05.json with slope=null plus the
standing exclusion note, so the absolute-marginal trend line stays visible
across rounds.

Usage:
    python tools/probe_spark_only.py <query> [query...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

BIG_DIR = "/root/repo/.localdata/sf0.5"
SMALL_DIR = "/root/testdata/sf0.1"
EXCLUDED_NOTE = (
    "recursive-CTE DuckDB twin (connected components) grinds 400+ s at "
    "sf0.5 (emb_dup_clusters' one full r13 read: duck 4.98->442.67 s, "
    "spark slope 0.11) — spark-only probe instead, post-presplit"
)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: probe_spark_only.py <query> [query...]")
    if not os.path.isdir(BIG_DIR):
        sys.exit(f"{BIG_DIR} missing — run tools/make_sf.py first")

    from data_engineering_project_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="probe_spark_only",
        master=f"local[{bench.CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(bench.CPUS) * 2, 8)),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "slope_sf05.json"
    )

    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        ts_small = bench._time_spark(fn, spark, SMALL_DIR, runs)
        ts_big = bench._time_spark(fn, spark, BIG_DIR, runs)
        rec = {
            "spark_sf0.1": round(ts_small, 3),
            "spark_sf0.5": round(ts_big, 3),
            "d_spark": round(ts_big - ts_small, 3),
            "slope": None,
            "excluded": EXCLUDED_NOTE,
        }
        with open(path) as fh:
            payload = json.load(fh)
        payload["queries"][name] = rec
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(
            f"{name:32s} spark {rec['spark_sf0.1']:6.2f}->{rec['spark_sf0.5']:6.2f}"
            f"  d_spark {rec['d_spark']:6.2f}  wall {time.perf_counter() - t0:5.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
