"""Text-analysis column expressions — the LLM-data-pipeline primitives.

All pure `pyspark.sql.functions` expressions (JVM-side, codegen'd): token
counting, punctuation/stopword ratios, fingerprints. No UDFs — at 100 TB the
difference between a codegen'd regex and a Python UDF is the whole job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal English stopword list used by the quality heuristics; a deployment
# passes its own per-language lists
DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

PUNCT_RE = r"[.,!?;:]"
WS_RE = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (trim first so leading/trailing space doesn't
    produce empty tokens)."""
    return F.split(F.trim(text), WS_RE)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def token_set(text: Column) -> Column:
    """Distinct tokens — the unit set for Jaccard similarity."""
    return F.array_distinct(tokens(text))


def punct_count(text: Column) -> Column:
    """Count punctuation chars as length delta after stripping them."""
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_RE, ""))


def word_membership_count(text: Column, words: Sequence[str]) -> Column:
    """How many tokens fall in a fixed word set (vectorized: filter over the
    token array against an array literal)."""
    wordlit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(wordlit, t)))


def stopword_count(text: Column, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    return word_membership_count(text, stopwords)


def fingerprint(text: Column) -> Column:
    """Normalized-content digest (lower + trim + MD5): the dedup shuffle key.

    Grouping on a 32-char digest instead of full document bodies is what
    keeps exact dedup's shuffle narrow at 100 TB. MD5 (not xxhash64) so the
    value is portable across engines, including the DuckDB oracle.
    """
    return F.md5(F.lower(F.trim(text)))


def jaccard(a_tokens: Column, b_tokens: Column) -> Column:
    """Jaccard similarity of two token-set columns."""
    inter = F.size(F.array_intersect(a_tokens, b_tokens))
    union = F.size(a_tokens) + F.size(b_tokens) - inter
    return inter.cast("double") / union
