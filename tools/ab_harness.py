"""Shared A/B timing harness for plan experiments (committed so the
evidence chain behind ROADMAP's perf notes survives the sandbox).

Times each named variant at the target SF dir and its /10 sibling with the
bench's own protocol — noop-sink materialization, untimed warmup, median of
N — and prints per-variant medians plus the marginal delta t(sf) - t(sf/10)
(the scheduling constants cancel in the subtraction; the marginal number is
the one that predicts cluster-scale behavior, same as bench.py's slope).

Usage from a concrete experiment script:

    from tools.ab_harness import run_ab
    run_ab({"v0_current": fn0, "v1_candidate": fn1}, rows_probe=fn0)
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _smaller_sf_dir(path: str) -> str | None:
    # explicit override: lets an A/B use the big local denominators
    # (SF_DIR=.localdata/sf0.5, SMALL=/root/testdata/sf0.1) instead of
    # the default /10 sibling convention (round-12: tools/make_sf.py)
    override = os.environ.get("SPARK_GRAFT_SF_SMALL_DIR")
    if override:
        return override if os.path.isdir(override) else None
    base = os.path.basename(os.path.normpath(path))
    if not base.startswith("sf"):
        return None
    try:
        smaller = float(base[2:]) / 10
    except ValueError:
        return None
    sib = os.path.join(os.path.dirname(os.path.normpath(path)), f"sf{smaller:g}")
    return sib if os.path.isdir(sib) else None


def _median_noop(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def run_ab(
    variants: dict[str, Callable],
    *,
    equivalence_check: bool = True,
) -> dict:
    """Time every variant; first entry is the incumbent. When
    ``equivalence_check``, assert all variants return identical sorted
    rows at the SMALL sf first — a fast variant that changes answers is
    not a variant."""
    from data_engineering_project_spark.session import get_spark

    spark = get_spark(
        app_name="ab",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(CPUS) * 2, 8)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    small = _smaller_sf_dir(SF_DIR)
    if equivalence_check and small:
        frames = {
            name: sorted(map(str, fn(spark, small).collect()))
            for name, fn in variants.items()
        }
        base = next(iter(frames.values()))
        for name, rows in frames.items():
            assert rows == base, f"variant {name!r} changes the answer"

    out: dict[str, dict] = {}
    for name, fn in variants.items():
        big = _median_noop(fn, spark, SF_DIR)
        rec = {"t_big": round(big, 3)}
        if small:
            t_small = _median_noop(fn, spark, small)
            rec["t_small"] = round(t_small, 3)
            rec["marginal"] = round(big - t_small, 3)
        out[name] = rec
    result = {"sf_dir": SF_DIR, "runs": RUNS, "variants": out}
    print(json.dumps(result, indent=1))
    return result
