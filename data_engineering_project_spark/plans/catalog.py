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


def _driver_checked() -> set[str]:
    """Query names that already have a driver correctness row in ANY prior
    round (``CORRECTNESS_r*.json`` at the repo root). The driver samples a
    fixed number of queries per round; emitting never-checked names first
    rotates the sample toward the unchecked set so cumulative driver coverage
    converges on the whole catalog."""
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    seen: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            # Only a GREEN row counts as checked. An ``err``/mismatch row
            # (e.g. a query whose oracle was added after a ``no_oracle``
            # sample) must re-enter the front of the rotation, else it
            # would stay unverified forever (round-3 verdict item #3).
            if isinstance(row, dict) and row.get("hash_match") is True:
                seen.add(name)
    return seen


def _ordered_names() -> list[str]:
    checked = _driver_checked()
    names = list(QUERIES)
    return [n for n in names if n not in checked] + [n for n in names if n in checked]


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
