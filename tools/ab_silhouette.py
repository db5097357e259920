"""A/B cost attribution for emb_centroid_silhouette (r13 wave-B slope 4.24,
d_spark 1.098 s at sf0.5).

Incumbent shape: k broadcast centroid ROWS crossJoin the corpus (N×k rows),
S.cosine recomputes norm(embedding) k times per vector and norm(cv) N times
per centroid (the exact pattern the r13 norm-precompute commit removed from
the pair stages), and per_vec = groupBy(vec_id) SHUFFLES all N×k scored
rows back together. The centroid build separately posexplodes N×D rows
through two exchanges.

Candidates:
- v1_mapside_score: collect the k centroids into ONE row (clabel, cv, ‖cv‖)
  and broadcast it; own/best-other cosines become array HOFs over that row
  — norms evaluated once per vector and once per centroid, NO per-vector
  shuffle (guide §2.2/§3: the only remaining exchange is the k-row final
  groupBy(label) over map-side partials).
- v2_dimsum_cent: v1 plus the centroid build as 64 per-dimension avg
  columns on groupBy(label) — one small exchange of partial aggregates
  instead of posexplode's N×D row generation + (label,pos) hash agg.
  avg(F.get(emb, i)) reproduces posexplode semantics (NULL-skipping per
  dimension, double accumulation).

Usage (big-denominator protocol, same as ab_pii.py):
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_silhouette.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import similarity as S
from data_engineering_project_spark.plans.similarity_queries import (
    EMB_DIM,
    emb_centroid_silhouette as v0_current,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def _cvec_posexplode(e: DataFrame) -> DataFrame:
    expl = e.select(
        "label", F.posexplode("embedding").alias("pos", "v0")
    ).select("label", "pos", F.col("v0").cast("double").alias("v"))
    cent = expl.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    return (
        cent.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
        .select(F.col("label").alias("clabel"), "cv")
    )


def _cvec_dimsum(e: DataFrame) -> DataFrame:
    sums = e.groupBy("label").agg(
        *[
            F.avg(F.get("embedding", i).cast("double")).alias(f"c{i}")
            for i in range(EMB_DIM)
        ]
    )
    return sums.select(
        F.col("label").alias("clabel"),
        F.array(*[F.col(f"c{i}") for i in range(EMB_DIM)]).alias("cv"),
    )


def _mapside(spark: SparkSession, sf_dir: str, cvec_fn) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cents = cvec_fn(e).agg(
        F.collect_list(
            F.struct(
                F.col("clabel"),
                F.col("cv"),
                S.norm(F.col("cv")).alias("cn"),
            )
        ).alias("cents")
    )
    ne = S.norm(F.col("embedding"))
    own = F.get(
        F.filter(F.col("cents"), lambda c: c["clabel"] == F.col("label")), 0
    )
    own_cos = S.dot(F.col("embedding"), own["cv"]) / (F.col("ne") * own["cn"])
    best_other_cos = F.array_max(
        F.transform(
            F.filter(F.col("cents"), lambda c: c["clabel"] != F.col("label")),
            lambda c: S.dot(F.col("embedding"), c["cv"])
            / (F.col("ne") * c["cn"]),
        )
    )
    per_vec = (
        e.crossJoin(F.broadcast(cents))
        .withColumn("ne", ne)
        .select(
            "label",
            own_cos.alias("own_cos"),
            best_other_cos.alias("best_other_cos"),
        )
    )
    a = 1 - F.col("own_cos")
    b = 1 - F.col("best_other_cos")
    s_micro = F.floor((b - a) / F.greatest(a, b) * 1000000 + F.lit(0.5)).cast(
        "bigint"
    )
    from data_engineering_project_spark.functions.scalars import half_up_ratio

    return (
        per_vec.select("label", s_micro.alias("s_micro"))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            half_up_ratio(
                F.sum("s_micro"),
                F.lit(1000000) * F.count("*").cast("decimal(38,0)"),
                6,
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


def v1_mapside_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mapside(spark, sf_dir, _cvec_posexplode)


def v2_dimsum_cent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mapside(spark, sf_dir, _cvec_dimsum)


if __name__ == "__main__":
    run_ab(
        {
            "v0_current": v0_current,
            "v1_mapside_score": v1_mapside_score,
            "v2_dimsum_cent": v2_dimsum_cent,
        }
    )
