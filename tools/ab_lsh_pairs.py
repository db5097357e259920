"""A/B cost attribution for emb_lsh_near_pairs (r13 wave-C slope 5.01,
d_spark 6.1 s at sf0.5).

Incumbent (v0, the pre-r13 shape, reproduced inline): within-bucket
self-join scored by `cosine(vec_a, vec_b)` per pair — that is THREE
interpreted zip_with/aggregate folds per pair (the dot and BOTH norms; the
blocked-pairs stage had already moved its norms per-vector in 352224e, the
LSH scorer never did).

Candidate (v1, the committed rewrite): `S.blocked_cosine_pairs` — norms
once per vector, presplit compiled dot, wf-gated fold fallback. Identical
IEEE op order, so cosines are bit-identical (run_ab asserts row equality
at the small SF).

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_lsh_pairs.py
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
    emb_lsh_near_pairs as v1_presplit,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def v0_fold_per_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id",
        "embedding",
        S.lsh_bucket(F.col("embedding"), EMB_DIM, 8, 42).alias("bucket"),
    )
    left = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"), "bucket"
    )
    right = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), "bucket"
    )
    pairs = left.join(right, on="bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        S.cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
    )
    return scored.filter(F.col("cosine") > 0.3).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


if __name__ == "__main__":
    run_ab({"v0_fold_per_pair": v0_fold_per_pair, "v1_presplit": v1_presplit})


def v2_vec_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    buckets = S.lsh_buckets_vectorized(e, dim=EMB_DIM, n_planes=8, seed=42)
    bucketed = e.select("vec_id", "embedding").join(buckets, "vec_id")
    pairs = S.blocked_cosine_pairs(
        bucketed, id_col="vec_id", vec_col="embedding",
        block_col="bucket", dim=EMB_DIM,
    )
    return pairs.filter(F.col("cosine") > 0.3).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )
