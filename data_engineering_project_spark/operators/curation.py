"""Corpus-curation operators: contamination, PII, repetition, domain quotas.

The filtering/safety layer of a training-data pipeline (not in the reference,
which never inspects its payloads — SURVEY.md §2 'absent, required by brief'):

- **benchmark contamination**: does a training document contain n-grams from a
  held-out evaluation set? (the standard n-gram-overlap decontamination check)
- **PII detection / redaction**: regex family over the text column, detect
  counts + masked rewrite — map-only, codegen'd, no UDF.
- **repetition features**: Gopher-style duplicate-word / duplicate-n-gram
  ratios used as quality-filter signals.
- **per-domain quotas**: cap documents per registered host with a
  deterministic hash order (the CommonCrawl "don't let one domain dominate
  the corpus" rule), plus blocklist filtering.

All pure `pyspark.sql.functions` expressions; the only shuffles are the
explicit groupBys/windows the semantics require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.text import tokens


def word_ngrams(text: Column, k: int) -> Column:
    """STRICT word k-grams in document order (may repeat; fewer than ``k``
    tokens → empty array). Differs from ``dedup.shingles`` which falls back
    to a whole-doc shingle for short texts — a contamination check must not
    manufacture n-grams that are not in the document."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    make = lambda i: F.array_join(F.slice(toks, i + 1, k), " ")  # noqa: E731
    return F.when(n >= k, F.transform(idx, make)).otherwise(
        F.array().cast("array<string>")
    )


# regex family kept to syntax both Java (Spark) and RE2-ish (oracle) engines
# interpret identically: character classes + bounded repetition only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"555-[0-9]{4}",
}

#: redaction order matters only for overlapping patterns; SSN before phone so
#: the 3-2-4 shape is consumed before any bare digit-dash run.
REDACTION_ORDER = ("email", "ssn", "phone")


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (JVM ``regexp_count``, map-only)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def redact_pii(text: Column) -> Column:
    """Mask every PII match with ``[KIND]`` markers, one codegen'd
    regexp_replace chain (no UDF, no extra pass over the data)."""
    out = text
    for kind in REDACTION_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def quota_sample(
    df: DataFrame,
    key: str | Column,
    quota: int,
    *,
    order_by: Column | None = None,
    keep_col: str = "quota_keep",
) -> DataFrame:
    """Keep at most ``quota`` rows per key, deterministically.

    Order within a key is a hash of the row's identity (caller-supplied
    ``order_by``), NOT arrival order — so the sample is stable across
    partitioning, retries, and cluster size (same reproducibility design as
    ``operators/sampling.py``). One shuffle on ``key``; the window never
    sorts globally. Skew note: a pathologically hot key concentrates in one
    task — at 100 TB pre-filter counts with AQE skew handling on, or
    two-phase (per-partition quota then exact top-up).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    if order_by is None:
        # hash the FULL row identity — hashing only the key would be
        # constant within a partition and silently degrade to arrival order
        order_by = F.md5(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
        )
    w = Window.partitionBy(key_col).orderBy(order_by)
    return df.withColumn(keep_col, F.row_number().over(w) <= quota)


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str | Column,
    budget: int,
    shard_col: Column,
    order_by: Column,
    out_shard: str = "shard",
    out_seq: str = "seq_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to the
    training sequence its FIRST token lands in.

    The packing rule actual LLM pipelines use at scale: concatenate
    documents in a deterministic order and cut every ``budget`` tokens —
    a document starting at cumulative offset c goes to sequence
    ``c div budget`` (the last doc of a sequence may straddle the boundary).
    First-fit bin packing would need sequential global state; this
    formulation is one window sum per shard, embarrassingly parallel
    across shards.

    ``shard_col`` bounds the window's partition (production: a
    hash-derived shard per worker); ``order_by`` must be a deterministic
    total order (hash of identity, NOT arrival order) so the packing is
    reproducible across partitioning, retries, and cluster size.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(tok).over(w), F.lit(0))
    return df.withColumn(out_shard, shard_col).withColumn(
        out_seq, offset.cast("bigint") / F.lit(budget)
    ).withColumn(out_seq, F.floor(F.col(out_seq)).cast("bigint"))
