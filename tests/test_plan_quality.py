"""Physical-plan assertions: the properties that make plans survive a
100× scale-up, checked against the actual optimized plans (SURVEY.md §4 —
pushdown/pruning/broadcast are the contract, not an accident)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = entrymod.queries()

    def plan_of(name: str) -> str:
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_q1_pushes_shipdate_filter_to_scan(plans):
    plan = plans("q1_pricing_summary")
    scan = plan[plan.index("FileScan") :]
    assert "PushedFilters" in scan
    assert "l_shipdate" in scan.split("PushedFilters")[1][:300]


def test_q1_reads_only_needed_columns(plans):
    plan = plans("q1_pricing_summary")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # 7 referenced columns; the other 4 (orderkey/partkey/suppkey/linenumber)
    # must be pruned from the parquet read
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_extendedprice" in read_schema


def test_promo_revenue_broadcasts_the_dimension(plans):
    assert "BroadcastHashJoin" in plans("promo_revenue_by_brand")


def test_flagship_report_scans_events_once(plans):
    # the spine must reuse the persisted counts instead of re-scanning
    # events (Catalyst would otherwise collapse distinct-over-agg into a
    # second full scan — 2× scan cost at 100 TB): BOTH join inputs read the
    # cache. (The InMemoryRelation's printed description embeds the original
    # FileScan text, so counting "FileScan" substrings would over-count.)
    plan = plans("hourly_report_dense")
    assert plan.count("InMemoryTableScan") == 2


def test_whole_stage_codegen_covers_the_agg(spark, sf_dir):
    # the hot path (scan -> partial agg) must be inside codegen, not
    # interpreted row-at-a-time; AQE's pre-execution plan string omits the
    # codegen markers, so ask for codegen explain mode explicitly
    df = entrymod.queries()["event_type_counts"](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "codegen"
    )
    text = df._jdf.queryExecution().explainString(mode)
    assert "WholeStageCodegen" in text


def test_salted_agg_is_two_stage(plans):
    plan = plans("events_salted_type_stats")
    # stage 1 keyed on (key, salt), stage 2 on key: two shuffles by design,
    # each bounded; a single hot-key shuffle is what it replaces
    assert plan.count("Exchange hashpartitioning") == 2


def test_asof_join_is_single_window_shuffle(plans):
    plan = plans("events_asof_purchase_click")
    assert "Window" in plan
    # union + window: no join node at all, one hash partitioning on user_id
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_interval_join_keys_on_equi_column(plans):
    plan = plans("purchase_click_attribution_1h")
    # the range predicate must NOT force a nested-loop/cartesian plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
