"""Stage attribution for emb_semantic_dedup (largest remaining sf0.5
marginal after the r14 blocked-pairs/PQ kernels: d_spark 11.3 s,
slope 1.00).

Phases (bench session, untimed warm pass, 3-run averages):

    count  — the adaptive-k sizing action
    fit    — kmeans_assignments + blocks persist materialization
    pairs  — within-cell pair join + prune + final agg (noop sink)

Usage: python tools/ab_semantic_dedup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def run_once(spark, record) -> None:
    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators.clustering import (
        kmeans_assignments,
    )
    from data_engineering_project_spark.plans import similarity_queries as SQ
    from data_engineering_project_spark.sources.tables import load_table

    def tick(name, t0):
        if record is not None:
            record[name] = record.get(name, 0.0) + (time.perf_counter() - t0)
        return time.perf_counter()

    t0 = time.perf_counter()
    e = load_table(spark, SF_DIR, "embeddings")
    n = e.filter(F.col("embedding").isNotNull()).count()
    k = max(SQ.KM_K, -(-n // SQ.SD_CELL))
    t0 = tick("count", t0)

    assigned = kmeans_assignments(
        e, vec_col="embedding", id_col="vec_id", k=k, n_iter=SQ.KM_ITER,
        scale=SQ.KM_SCALE, keep_vec=True,
    )
    lnorm2 = lambda col: F.aggregate(
        F.transform(col, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    blocks = assigned.withColumn(
        "sn", F.sqrt(lnorm2(F.col("q")).cast("double"))
    ).repartition(
        spark.sparkContext.defaultParallelism, F.col("cluster")
    ).persist()
    blocks.count()
    t0 = tick("fit", t0)

    a = blocks.select(
        F.col("cluster").alias("cl_a"),
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("sn").alias("sn_a"),
    )
    b = blocks.select(
        F.col("cluster").alias("cl_b"),
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("sn").alias("sn_b"),
    )
    ldot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = a.join(
        b, (F.col("cl_a") == F.col("cl_b")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "id_b",
        (ldot.cast("double") / (F.col("sn_a") * F.col("sn_b"))).alias("c"),
    )
    pruned = (
        pairs.filter(F.col("c") >= SQ.SD_TAU)
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.lit(1).alias("hit"))
    )
    out = (
        blocks.join(pruned, "vec_id", "left")
        .groupBy(F.col("cluster").cast("bigint").alias("cluster"))
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.count("hit").cast("bigint").alias("n_pruned"),
            F.coalesce(
                F.sum(F.when(F.col("hit").isNotNull(), F.col("vec_id"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("pruned_id_sum"),
        )
    )
    out.write.format("noop").mode("overwrite").save()
    blocks.unpersist()
    tick("pairs", t0)


def main() -> None:
    from data_engineering_project_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab_semantic_dedup",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))
        },
    )
    run_once(spark, None)
    record: dict = {}
    runs = 3
    for _ in range(runs):
        run_once(spark, record)
    out = {k: round(v / runs, 3) for k, v in record.items()}
    out["total"] = round(sum(out.values()), 3)
    out["sf_dir"] = SF_DIR
    print(json.dumps(out))


if __name__ == "__main__":
    main()
