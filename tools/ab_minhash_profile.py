"""A/B cost attribution for docs_minhash_signature_profile (r13 wave-C
slope 7.82, d_spark 13.7 s at sf0.5 — the largest new find of the wave).

Incumbent: the EXPRESSION-form signature head — `array_min(transform(sh,
md5(...)))` per row. `minhash_signature`'s own docstring carries the
warning: transform/array_min towers are CodegenFallback, so every
shingle's md5 runs through an interpreted closure. The operator family
already has the fix (`minhash_signatures` = explode + min-agg, "stays
inside whole-stage codegen at any signature width") — the profile query
just never took it because it needs n_shingles and must KEEP empty-shingle
docs.

Candidate v1_explode: repartition on doc_id (the minhash_signatures
spread=True shape — hashing spreads across cores, and the groupBy reuses
the exchange so there is no SECOND shuffle), explode_outer the shingle
array (empty/NULL-shingle docs survive as one NULL row), md5 in a compiled
Project, then count(s) + min(md5) per doc. count("s") skips the NULL of
explode_outer → 0 for empty docs; min of the all-NULL group → NULL —
exactly the expression form's (size=0, array_min=NULL).

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_minhash_profile.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import dedup as D
from data_engineering_project_spark.plans.dedup_queries import (
    docs_minhash_signature_profile as v0_current,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def v1_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    ex = d.select(
        "doc_id", F.explode_outer(D.shingles(F.col("text"), 3)).alias("s")
    )
    return ex.groupBy("doc_id").agg(
        F.count("s").cast("bigint").alias("n_shingles"),
        F.min(F.md5(F.concat(F.lit("0:"), F.col("s")))).alias("minhash_0"),
    )


if __name__ == "__main__":
    run_ab({"v0_current": v0_current, "v1_explode": v1_explode})
