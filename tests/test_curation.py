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


def test_leakage_safe_split_contract(spark, tmp_path):
    """docs_leakage_safe_split: duplicate documents (including case
    variants unified by the ASCII fold) must NEVER straddle splits under
    the fp_safe scheme, and the naive doc_id scheme must measurably leak
    on the same corpus (the sf fixtures have no dupes, so the audit
    column is exercised here and by the hostile sweeps)."""
    from data_engineering_project_spark.plans.catalog import queries

    rows = []
    # 200 exact copies: doc_id-hash assignment scatters them 80/10/10
    for i in range(200):
        rows.append((i, "the quick brown fox", 19, "en", "srcA"))
    # case variants share a fingerprint only through the ASCII fold
    rows.append((200, "Hello World", 11, "en", "srcB"))
    rows.append((201, "HELLO WORLD", 11, "en", "srcB"))
    rows.append((202, "hello world", 11, "en", "srcB"))
    # a unique doc: a group of one can never straddle
    rows.append((203, "completely unique text", 22, "en", "srcB"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars int, lang string, source string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = queries()["docs_leakage_safe_split"](spark, str(tmp_path)).collect()
    by = {(r["scheme"], r["split"]): r for r in out}

    safe = [r for r in out if r["scheme"] == "fp_safe"]
    assert safe and all(r["straddling_groups"] == 0 for r in safe)
    # each fingerprint group lives in exactly ONE split under fp_safe:
    # 3 groups total (copies, hello-case family, unique)
    assert sum(r["n_groups"] for r in safe) == 3
    assert sum(r["n_docs"] for r in safe) == 204

    naive = [r for r in out if r["scheme"] == "naive"]
    assert sum(r["n_docs"] for r in naive) == 204
    # 200 ids hash across all three splits -> the copy group straddles;
    # it is counted once per split it appears in
    assert sum(r["straddling_groups"] for r in naive) >= 2
