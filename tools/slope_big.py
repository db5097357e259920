"""Re-measure the slope weak set over sf0.1 -> sf0.5 (round-11 verdict #1/#2).

The standing instrument (bench.py) estimates the marginal per-row cost ratio
from the sf0.01 -> sf0.1 delta — a 17 MB spread over which DuckDB's marginal
is often single-digit milliseconds, so the ratio flips in and out of the >2x
weak set on scheduling noise (``suppliers_cooccurrence`` 10.9 -> out -> 12.3
across three rounds). This tool uses the deterministic local upscale
(``tools/make_sf.py`` -> .localdata/sf0.5) as the big point: a 5x data delta
(~85 MB) puts every DuckDB denominator far above the 50 ms noise floor, so
one measurement settles each entry.

Protocol per (query, sf): identical to bench.py — untimed warmup (plan +
codegen JIT), then median of N noop-sink runs (Spark) / fetchall runs
(DuckDB). Slope = (t_spark(0.5) - t_spark(0.1)) / (t_duck(0.5) - t_duck(0.1)).

Usage:
    python tools/make_sf.py                       # once, writes .localdata/sf0.5
    python tools/slope_big.py [names...]          # default: the r11 weak set

Writes tools/slope_sf05.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # reuse the exact timing protocol (warmup + median of runs)

BIG_DIR = "/root/repo/.localdata/sf0.5"
SMALL_DIR = "/root/testdata/sf0.1"
NOISE_FLOOR_SEC = 0.05

# the nine >2x entries from BENCH_r11 / VERDICT r11, worst first —
# ALL DISPOSITIONED in r12 on the big denominator (annotations = outcome;
# the standing table lives in slope_sf05.json / ROADMAP round-12):
WEAK_SET = (
    "suppliers_cooccurrence",       # 12.3 -> 6.61 FLOOR (4-variant A/B)
    "docs_bigram_lm_score",         # 7.5  -> 0.92 FIXED (packed-int keys)
    "events_balanced_downsample",   # 7.5  -> 1.19 cleared
    "q1_pricing_summary",           # 6.8  -> null (zero marginal) cleared
    "running_revenue_window",       # 4.8  -> 0.62 cleared (beats DuckDB)
    "graph_pagerank_trade",         # 4.2  -> 1.17 cleared
    "docs_quality_scores",          # 3.7  -> 1.84 cleared
    "docs_duplicate_ngram_spans",   # 2.6  -> 0.57 cleared (beats DuckDB)
    "graph_kcore_trade",            # 2.1  -> 0.80 cleared (beats DuckDB)
)


def main() -> None:
    names = tuple(sys.argv[1:]) or WEAK_SET
    if not os.path.isdir(BIG_DIR):
        sys.exit(f"{BIG_DIR} missing — run tools/make_sf.py first")

    from data_engineering_project_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="slope_big",
        master=f"local[{bench.CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(bench.CPUS) * 2, 8)),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    con_small = bench._duckdb_conn(SMALL_DIR)
    con_big = bench._duckdb_conn(BIG_DIR)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "slope_sf05.json"
    )

    def _flush(out: dict) -> None:
        # MERGE into the standing table after EVERY query (a wave killed
        # by a wall-clock timeout must not discard finished measurements
        # — the r13 wave-2 lesson; re-measuring one query must not
        # discard the other entries' evidence either)
        prior: dict = {}
        if os.path.exists(path):
            try:
                with open(path) as fh:
                    prior = json.load(fh).get("queries", {})
            except (OSError, ValueError):
                prior = {}
        payload = {
            "small": SMALL_DIR,
            "big": BIG_DIR,
            "runs_per_point": runs,
            "noise_floor_sec": NOISE_FLOOR_SEC,
            "queries": {**prior, **out},
        }
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1)

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        ts_small = bench._time_spark(fn, spark, SMALL_DIR, runs)
        ts_big = bench._time_spark(fn, spark, BIG_DIR, runs)
        td_small = bench._time_duckdb(con_small, oracles[name], runs)
        td_big = bench._time_duckdb(con_big, oracles[name], runs)
        d_spark, d_duck = ts_big - ts_small, td_big - td_small
        rec = {
            "spark_sf0.1": round(ts_small, 3),
            "spark_sf0.5": round(ts_big, 3),
            "duck_sf0.1": round(td_small, 3),
            "duck_sf0.5": round(td_big, 3),
            "d_spark": round(d_spark, 3),
            "d_duck": round(d_duck, 3),
            "slope": (
                round(d_spark / d_duck, 2)
                if d_spark > 0 and d_duck >= NOISE_FLOOR_SEC
                else None
            ),
            "wall_sec": round(time.perf_counter() - t0, 1),
        }
        out[name] = rec
        _flush(out)
        print(
            f"{name:32s} spark {rec['spark_sf0.1']:6.2f}->{rec['spark_sf0.5']:6.2f}"
            f"  duck {rec['duck_sf0.1']:6.3f}->{rec['duck_sf0.5']:6.3f}"
            f"  slope {rec['slope']}",
            flush=True,
        )

    print(f"wrote {path}")


if __name__ == "__main__":
    main()
