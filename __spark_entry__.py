"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``data_engineering_project_spark.plans.catalog`` — the query
catalog where every operator from SURVEY.md §2 (plus the training-data
pipeline operators) is registered as a (Spark plan, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_project_spark.plans import catalog as _catalog

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's daily report (dense zero-filled 24h grid over the event
    stream, src/Task1/data_processing.py:299-366) as one declarative plan.
    """
    return _catalog.queries()["hourly_report_dense"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get a
    rows-only check)."""
    return _catalog.oracle_sql()
