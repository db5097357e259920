"""Curation operators: unit behaviors the oracle parity suite can't see.

Parity (values vs DuckDB) for the four `docs_*` curation queries runs via
`tests/test_oracle_parity.py` automatically; these tests pin the operator
semantics that matter independent of any fixture: strict n-grams, redaction
masking, and quota-sample determinism under repartitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e"),
            Row(doc_id=2, text="a b"),  # shorter than k=4
            Row(doc_id=3, text="x x x x x x"),
        ]
    )


def test_word_ngrams_strict_no_short_doc_fallback(docs):
    out = {
        r["doc_id"]: r["ng"]
        for r in docs.select(
            "doc_id", C.word_ngrams(F.col("text"), 4).alias("ng")
        ).collect()
    }
    assert out[1] == ["a b c d", "b c d e"]
    # a 2-token doc has NO 4-grams — must not fabricate a whole-doc shingle
    assert out[2] == []
    assert out[3] == ["x x x x"] * 3  # order-preserving, repeats kept


def test_redact_pii_masks_every_family(spark):
    df = spark.createDataFrame(
        [Row(t="mail bob@corp.io id 123-45-6789 call 555-0199 done")]
    )
    red = df.select(C.redact_pii(F.col("t")).alias("r")).head()["r"]
    assert red == "mail [EMAIL] id [SSN] call [PHONE] done"
    counts = df.select(
        *[C.pii_count(F.col("t"), k).alias(k) for k in C.PII_PATTERNS]
    ).head()
    assert (counts["email"], counts["ssn"], counts["phone"]) == (1, 1, 1)


def test_quota_sample_deterministic_across_partitioning(spark):
    df = spark.range(200).select(
        (F.col("id") % 5).cast("string").alias("host"), F.col("id").alias("doc_id")
    )
    kept1 = {
        r["doc_id"]
        for r in C.quota_sample(df.repartition(1), "host", 7)
        .filter("quota_keep")
        .collect()
    }
    kept2 = {
        r["doc_id"]
        for r in C.quota_sample(df.repartition(13, "doc_id"), "host", 7)
        .filter("quota_keep")
        .collect()
    }
    assert kept1 == kept2  # hash order, not arrival order
    assert len(kept1) == 5 * 7


def test_quota_sample_keeps_all_below_quota(spark):
    df = spark.range(4).select(F.lit("h").alias("host"), F.col("id").alias("doc_id"))
    out = C.quota_sample(df, "host", 10).filter("quota_keep")
    assert out.count() == 4
