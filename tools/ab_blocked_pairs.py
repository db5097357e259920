"""A/B cost attribution for the shared `_blocked_pairs` stage (r13: the
pair stage is ~9.6 s of docs_canonical_manifest's ~10 s at sf0.1, and five
queries flow through it: emb_blocked_near_pairs, emb_dup_threshold_curve,
emb_dup_clusters, docs_canonical_manifest, emb_semantic_dedup's cousin).

Incumbent per-pair score: `S.dot` = zip_with + aggregate — higher-order
functions are CodegenFallback in Catalyst, so every one of the O(sum of
block^2) pairs pays an interpreted 64-step fold (lambda closure per
element) instead of compiled arithmetic.

Candidates:
- v1_unrolled: dot expanded to 64 explicit `F.get(a,i)*F.get(b,i)` terms,
  left-associated from a 0.0 literal — the SAME IEEE evaluation order as
  the fold, but every node (GetArrayItem, Cast, Multiply, Add) is
  codegen'd. A size gate (both arrays exactly 64 long) falls back to the
  old fold expression for ragged/NULL inputs, so semantics are identical
  on ANY input, not just the well-formed tables.
- v2_presplit: each side projects the 64 elements into scalar double
  columns BEFORE the join; the pair score is a plain column dot (no array
  access at pair time). Tests whether GetArrayItem-at-pair-time matters.

Timed on the emb_blocked_near_pairs consumer (pair stage + threshold
filter — no CC scaffold, so the A/B isolates the stage under test).

Usage (big-denominator protocol, same as ab_silhouette.py):
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_blocked_pairs.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import similarity as S
from data_engineering_project_spark.plans.extended_queries import (
    emb_blocked_near_pairs as v0_current,
)
from data_engineering_project_spark.sources.tables import load_table

from tools.ab_harness import run_ab

DIM = 64


def _dot_unrolled(a, b):
    terms = [
        F.get(a, i).cast("double") * F.get(b, i).cast("double")
        for i in range(DIM)
    ]
    expanded = functools.reduce(lambda acc, t: acc + t, terms, F.lit(0.0))
    return F.when(
        (F.size(a) == DIM) & (F.size(b) == DIM), expanded
    ).otherwise(S.dot(a, b))


def _pairs_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(spark.sparkContext.defaultParallelism, F.col("label"))
    return e.select(
        "vec_id", "label", "embedding", S.norm(F.col("embedding")).alias("nrm")
    )


def _near_pairs(pairs: DataFrame) -> DataFrame:
    return pairs.filter(F.col("c") >= 0.35).select(
        "id_a", "id_b", "label", F.round("c", 6).alias("cosine")
    )


def v1_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _pairs_base(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("id_a"),
        "label",
        F.col("embedding").alias("vec_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("vec_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(
        b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "id_a",
        "id_b",
        "label",
        (
            _dot_unrolled(F.col("vec_a"), F.col("vec_b"))
            / (F.col("nrm_a") * F.col("nrm_b"))
        ).alias("c"),
    )
    return _near_pairs(pairs)


def v2_presplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _pairs_base(spark, sf_dir)
    well_formed = F.size("embedding") == DIM
    split = e.select(
        "vec_id",
        "label",
        "nrm",
        well_formed.alias("wf"),
        F.col("embedding"),
        *[
            F.get("embedding", i).cast("double").alias(f"x{i}")
            for i in range(DIM)
        ],
    )
    a = split.select(
        F.col("vec_id").alias("id_a"),
        "label",
        F.col("nrm").alias("nrm_a"),
        F.col("wf").alias("wf_a"),
        F.col("embedding").alias("vec_a"),
        *[F.col(f"x{i}").alias(f"a{i}") for i in range(DIM)],
    )
    b = split.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("nrm").alias("nrm_b"),
        F.col("wf").alias("wf_b"),
        F.col("embedding").alias("vec_b"),
        *[F.col(f"x{i}").alias(f"b{i}") for i in range(DIM)],
    )
    terms = [F.col(f"a{i}") * F.col(f"b{i}") for i in range(DIM)]
    expanded = functools.reduce(lambda acc, t: acc + t, terms, F.lit(0.0))
    dot = F.when(F.col("wf_a") & F.col("wf_b"), expanded).otherwise(
        S.dot(F.col("vec_a"), F.col("vec_b"))
    )
    pairs = a.join(
        b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "id_a",
        "id_b",
        "label",
        (dot / (F.col("nrm_a") * F.col("nrm_b"))).alias("c"),
    )
    return _near_pairs(pairs)


def v3_presplit_r13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r13 production shape, now kept as
    S.blocked_cosine_pairs_presplit — the r14 Arrow kernel's baseline."""
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(spark.sparkContext.defaultParallelism, F.col("label"))
    pairs = S.blocked_cosine_pairs_presplit(
        e, id_col="vec_id", vec_col="embedding", block_col="label", dim=DIM
    ).withColumnRenamed("cosine", "c")
    return _near_pairs(pairs)


if __name__ == "__main__":
    # r14: v0_current routes through the Arrow applyInArrow kernel
    # (S.blocked_cosine_pairs); v3 is the r13 presplit production shape.
    run_ab(
        {
            "v0_current": v0_current,
            "v3_presplit_r13": v3_presplit_r13,
        }
    )


def _dot_unrolled_nogate(a, b):
    terms = [
        F.get(a, i).cast("double") * F.get(b, i).cast("double")
        for i in range(DIM)
    ]
    return functools.reduce(lambda acc, t: acc + t, terms, F.lit(0.0))


def v1b_unrolled_nogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _pairs_base(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("id_a"),
        "label",
        F.col("embedding").alias("vec_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("vec_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(
        b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "id_a",
        "id_b",
        "label",
        (
            _dot_unrolled_nogate(F.col("vec_a"), F.col("vec_b"))
            / (F.col("nrm_a") * F.col("nrm_b"))
        ).alias("c"),
    )
    return _near_pairs(pairs)
