"""A/B: docs_bigram_lm_score explode-shape levers (round-12 verdict #1).

At the big sf0.1 -> sf0.5 denominator the query's slope settled at 3.19 —
the only stable >2x entry besides suppliers_cooccurrence. Plan-read
hypothesis: the per-position ``substring(text, i, 2)`` inside the transform
is O(i) on UTF8String (byte-walk from the start to find codepoint i for
multibyte safety), so each doc pays a QUADRATIC character walk to emit its
bigrams; DuckDB's vectorized substr amortizes this better. Candidates:

- v1_split_chars: ``split(text, '')`` once per doc (one linear pass), then
  array-indexed ``ch[i] || ch[i+1]`` — O(1) per bigram after the split.
- v2_packed_int: v1 plus packed-codepoint bigram keys
  (``ascii(ch[i]) * 1114112 + ascii(ch[i+1])``, collision-free up to the
  max codepoint) — the join/groupBy key becomes a long instead of a 2-char
  UTF8String: cheaper hash, compare, and persist bytes. The key never
  leaves the query (output is per-doc scores), so the representation is
  free to change.

Run with the big denominators:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_bigram_lm_variants.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_spark.plans.text_queries import (
    docs_bigram_lm_score,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab

MAXCP = 1114112  # 0x110000: > max Unicode codepoint, so a*MAXCP+b is injective


def _score_from_pos(pos, key_first_char, key_second_distinct):
    """Shared model-build + scoring tail over an exploded (doc_id, b)
    positions frame; the two key-decomposition lambdas abstract over the
    string vs packed-int representation."""
    from pyspark.storagelevel import StorageLevel

    pos = pos.persist(StorageLevel.MEMORY_AND_DISK)
    model = pos.groupBy("b").agg(F.count("*").cast("bigint").alias("cb"))
    ctx = model.groupBy(key_first_char(F.col("b")).alias("x")).agg(
        F.sum("cb").cast("bigint").alias("cx")
    )
    vocab = model.agg(key_second_distinct().alias("v"))
    term = (
        model.join(F.broadcast(ctx), key_first_char(model["b"]) == ctx["x"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "b",
            F.floor(
                (
                    F.log((F.col("cx") + F.col("v")).cast("double"))
                    - F.log((F.col("cb") + 1).cast("double"))
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("t_micro"),
        )
    )
    score = (
        pos.join(F.broadcast(term), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("t_micro").cast("bigint").alias("s_micro"),
            F.count("*").cast("bigint").alias("n_bigrams"),
        )
    )
    return (
        score.orderBy(
            (F.col("s_micro").cast("double") / F.col("n_bigrams")).desc(),
            "doc_id",
        )
        .limit(20)
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("s_micro") / 1000000.0 / F.col("n_bigrams"), 6
            ).alias("avg_nll_nats"),
        )
    )


def v1_split_chars(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.filter(F.length("text") >= 2)
        .select("doc_id", F.split("text", "").alias("ch"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ch) - 2), "
                    "i -> ch[i] || ch[i + 1])"
                )
            ).alias("b"),
        )
    )
    return _score_from_pos(
        pos,
        lambda b: F.substring(b, 1, 1),
        lambda: F.expr(
            "CAST(count(DISTINCT substring(b, 2, 1)) AS BIGINT)"
        ),
    )


def v2_packed_int(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.filter(F.length("text") >= 2)
        .select("doc_id", F.split("text", "").alias("ch"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ch) - 2), "
                    f"i -> ascii(ch[i]) * {MAXCP}L + ascii(ch[i + 1]))"
                )
            ).alias("b"),
        )
    )
    return _score_from_pos(
        pos,
        lambda b: (b / MAXCP).cast("bigint"),
        lambda: F.expr(f"CAST(count(DISTINCT b % {MAXCP}L) AS BIGINT)"),
    )


if __name__ == "__main__":
    run_ab(
        {
            "v0_substring_walk": docs_bigram_lm_score,
            "v1_split_chars": v1_split_chars,
            "v2_packed_int": v2_packed_int,
        }
    )
