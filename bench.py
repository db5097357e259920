"""Benchmark the engine's headline queries.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], forcing full materialization through the noop
sink (no driver-side collect cost), and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# every catalog query participates; these are the headline subset reported
# individually (scan-heavy, join-heavy, window, text, vector — one per class)
HEADLINE = (
    "hourly_report_dense",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "top_customers_by_revenue",
    "running_revenue_window",
    "top3_orders_per_customer",
    "distinct_supplier_counts",
    "docs_fingerprint_dedup",
    "docs_quality_scores",
    "docs_jaccard_vs_query",
    "emb_cosine_topk",
    "emb_lsh_bucket_profile",
    # second wave: join/window/pivot/skew/UDF classes
    "events_asof_purchase_click",
    "purchase_click_attribution_1h",
    "events_daily_type_pivot",
    "events_salted_type_stats",
    "q18_large_orders",
    "docs_frame_sampling",
    "emb_ivf_topk",
    "docs_bpe_token_stats",
    # third wave: pure-pushdown scan and sketch classes
    "q6_forecast_revenue",
    "events_cms_heavy_hitters",
)


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(os.path.normpath(path))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> None:
    from data_engineering_project_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(CPUS) * 2, 8)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # untimed warmup run: planning + codegen JIT dominate at bench SF and
        # amortize to zero at production scale; report steady-state execution
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)  # median
        spreads[name] = round(samples[-1] - samples[0], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread_max_minus_min": spreads,
                "runs_per_query": runs,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
