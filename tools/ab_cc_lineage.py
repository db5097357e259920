"""A/B the connected_components sym-leaf strategy on the real dedup edges.

The r13 blocked-pairs presplit widened the upstream lineage the CC loop's
per-round joins embed; this tool measures, on docs_canonical_manifest's
actual edge input, whether truncating ``sym``'s lineage (localCheckpoint)
beats caching its rows under the full plan (persist), and what each costs
per round. Interleaved A/B/A/B order so JIT/page-cache drift cannot favor
one variant.

Usage:
    python tools/ab_cc_lineage.py <variant> [sf_dir] [reps]   # one fresh session
    for v in a b; do ... done                                  # alternate processes

Session-reuse caveat, measured: 40+ rounds of localCheckpoint per run pile
RDD blocks into the block manager faster than the ContextCleaner drains
them, so within-session timings degrade monotonically (sym-build read
5.8 -> 26.7 s across one session). Variants are therefore compared across
FRESH processes, alternated by the caller.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "localCheckpoint"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def _star_on(edges: DataFrame) -> DataFrame:
    from data_engineering_project_spark.operators.components import (
        connected_components_star,
    )

    return connected_components_star(edges, src="u", dst="v")


def _cc(sym: DataFrame, tag: str) -> DataFrame:
    fold_count = tag in ("foldcount", "jump", "quotient8", "quotient20")
    jump = tag == "jump"
    cap = {"quotient8": 8, "quotient20": 20}.get(tag, 40)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for rnd in range(cap):
        t0 = time.perf_counter()
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        half = labels.join(
            neighbor_min, labels["node"] == neighbor_min["node2"], "left"
        ).select(
            "node",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        if jump:
            lookup = labels.select(
                F.col("node").alias("c_node"),
                F.col("component").alias("c_comp"),
            )
            half = half.join(
                lookup, half["component"] == lookup["c_node"], "left"
            ).select(
                "node",
                "_old",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("c_comp"), F.col("component")),
                ).alias("component"),
            )
        new_labels = half.localCheckpoint()
        if fold_count:
            changed = new_labels.filter(
                F.col("component") != F.col("_old")
            ).count()
        else:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
        labels = new_labels.select("node", "component")
        print(
            f"    [{tag}] round {rnd}: {time.perf_counter() - t0:.2f}s"
            f" changed={changed}",
            flush=True,
        )
        if changed == 0:
            return labels
    if tag.startswith("quotient"):
        t0 = time.perf_counter()
        la = labels.select(F.col("node").alias("a"), F.col("component").alias("ca"))
        lb = labels.select(F.col("node").alias("b"), F.col("component").alias("cb"))
        quotient = (
            sym.join(la, "a")
            .join(lb, "b")
            .select(F.col("ca").alias("u"), F.col("cb").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        q = _star_on(quotient).select(
            F.col("node").alias("component"), F.col("component").alias("_root")
        )
        out = (
            labels.join(q, "component", "left")
            .select(
                "node",
                F.coalesce(F.col("_root"), F.col("component")).alias("component"),
            )
        )
        out.write.format("noop").mode("overwrite").save()
        print(f"    [{tag}] quotient escalation: {time.perf_counter() - t0:.2f}s", flush=True)
        return out
    raise RuntimeError(f"no convergence in {cap} rounds")


def run_variant(spark, variant: str) -> float:
    from data_engineering_project_spark.plans.extended_queries import (
        _blocked_pairs,
    )

    t0 = time.perf_counter()
    edges = _blocked_pairs(spark, SF_DIR).filter(F.col("c") >= 0.35)
    base = edges.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).unionByName(
        edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    ).distinct()
    sym = base.persist() if variant == "persist" else base.localCheckpoint()
    t_sym = time.perf_counter() - t0
    labels = _cc(sym, variant)
    labels.write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t0
    if variant == "persist":
        sym.unpersist()
    print(f"  {variant}: sym-build {t_sym:.2f}s total {total:.2f}s", flush=True)
    return total


def main() -> None:
    from data_engineering_project_spark.session import get_spark

    spark = get_spark(
        app_name="ab_cc_lineage",
        master=f"local[{bench.CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(bench.CPUS) * 2, 8)),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"warmup {VARIANT}", flush=True)
    run_variant(spark, VARIANT)
    ts = [run_variant(spark, VARIANT) for _ in range(REPS)]
    print(f"{VARIANT}: {[round(t, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
