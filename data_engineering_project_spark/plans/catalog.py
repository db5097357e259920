"""Query catalog: every operator the engine claims, as (Spark plan, DuckDB oracle) pairs.

Each entry maps a query name to:
  - ``fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation
  - ``sql: str | None``                 — the ANSI-SQL oracle DuckDB runs over
    the same parquet tables (``None`` for non-SQL-expressible operators →
    the driver records a weaker rows-only check)

Column names are aliased identically on both sides (the driver sorts columns
by name before value-hashing). Double-typed aggregates are ROUND()ed to the
same precision on both sides so partial-aggregation order cannot flip a bit.

The catalog covers SURVEY.md §2's inventory (reference file:line cited per
query) plus the training-data-pipeline operators (dedup, similarity, text
analysis) that a 100 TB deployment needs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    sql: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, Query] = {}


def register(name: str, sql: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def _ordered_names() -> list[str]:
    """Driver-sample ordering (round-5 verdict item #1): the driver hashes a
    bounded sample per round, so emit the riskiest names first —

      1. changed-since-last-green-hash (includes never-hashed additions and
         forced-stale seeds) — the hard artifact no longer reflects the
         shipped plan;
      2. then fresh names, oldest green round first, so long-unhashed rows
         keep rotating through;

    per the committed ``plans/fingerprints.json`` snapshot, refreshed at each
    round start by ``tools/update_fingerprints.py`` (which also subsumes the
    old "never checked first" rule: a name with no snapshot entry sorts into
    bucket 1)."""
    from data_engineering_project_spark.plans.fingerprints import staleness_order

    return staleness_order(QUERIES)


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: QUERIES[name].sql
        for name in _ordered_names()
        if QUERIES[name].sql is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effect)."""
    global _LOADED
    if _LOADED:
        return
    from data_engineering_project_spark.plans import (  # noqa: F401
        analytics_queries,
        behavior_queries,
        cdc_queries,
        core_queries,
        curation_queries,
        dedup_queries,
        extended_queries,
        graph_queries,
        inference_queries,
        ingest_queries,
        profile_queries,
        pruning_queries,
        quality_queries,
        relational_queries,
        search_queries,
        sharding_queries,
        similarity_queries,
        stats_queries,
        text_queries,
        timeseries_queries,
    )

    _LOADED = True
