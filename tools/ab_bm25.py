"""A/B: docs_bm25_search scan-shape levers (round-12).

At the sf0.1 -> sf0.5 denominator the BM25 row read slope 2.09 with a
solid 3.06 s Spark marginal. Plan-read: ``per_doc`` (tokenize + interpreted
HOF fold) is computed TWICE — once under the global stats aggregate and
once under the scoring join — so the dominant interpreted pass runs 2x.

- v1_persist: persist the tiny per_doc frame (doc_id + 5 ints), one
  tokenize/fold pass total.
- v2_regexp_count: no token array at all — dl and each term's tf are
  ``regexp_count`` with zero-width boundary lookarounds over the folded
  text (``(?<![a-z0-9])term(?![a-z0-9])``), whole-stage-codegen native;
  identical integers to the token-equality counts by construction of the
  ``[^a-z0-9]+`` splitter. Persisted the same way.

Run:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_bm25.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_engineering_project_spark.operators.text import (
    ascii_lower,
    normalized_tokens,
)
from data_engineering_project_spark.plans.search_queries import (
    _BM25_B,
    _BM25_K1,
    _SAMPLE_K,
    _SEARCH_TERMS,
    docs_bm25_search,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def _rank(per_doc):
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_SEARCH_TERMS))
        ],
    )
    k1, b = _BM25_K1, _BM25_B
    joined = per_doc.crossJoin(F.broadcast(stats))

    def term_score(i: int):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        tf = F.col(f"tf_{i}")
        return idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )

    score = term_score(0)
    for i in range(1, len(_SEARCH_TERMS)):
        score = score + term_score(i)
    return (
        joined.filter(
            sum(F.col(f"tf_{i}") for i in range(len(_SEARCH_TERMS))) > 0
        )
        .select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_SAMPLE_K)
    )


def v1_persist(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = normalized_tokens(F.col("text"))
    acc0 = F.struct(
        F.lit(0).alias("dl"),
        *[F.lit(0).alias(f"t{i}") for i in range(len(_SEARCH_TERMS))],
    )

    def step(a, x):
        return F.struct(
            (a["dl"] + (x != "").cast("int")).alias("dl"),
            *[
                (a[f"t{i}"] + (x == t).cast("int")).alias(f"t{i}")
                for i, t in enumerate(_SEARCH_TERMS)
            ],
        )

    folded = F.aggregate(toks, acc0, step)
    per_doc = docs.select(
        "doc_id",
        folded["dl"].alias("dl"),
        *[
            folded[f"t{i}"].alias(f"tf_{i}")
            for i in range(len(_SEARCH_TERMS))
        ],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return _rank(per_doc)


def v2_regexp_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    low = ascii_lower(F.col("text"))
    per_doc = docs.select(
        "doc_id",
        F.regexp_count(low, F.lit("[a-z0-9]+")).alias("dl"),
        *[
            F.regexp_count(
                low, F.lit(f"(?<![a-z0-9]){t}(?![a-z0-9])")
            ).alias(f"tf_{i}")
            for i, t in enumerate(_SEARCH_TERMS)
        ],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return _rank(per_doc)


if __name__ == "__main__":
    run_ab(
        {
            "v0_double_fold": docs_bm25_search,
            "v1_persist": v1_persist,
            "v2_regexp_count": v2_regexp_count,
        }
    )
