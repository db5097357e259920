"""Storage-layout proofs: partition pruning, dynamic-partition overwrite,
and shuffle-free co-bucketed joins — the physical properties that carry the
engine from local[32] to a 1000-executor cluster (README 'scale design')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.sinks.layout import (
    write_bucketed_table,
    write_partitioned,
)
from data_engineering_project_spark.sources.tables import load_table


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("bronze") / "events")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(ev, out, ["event_date", "event_type"])
    return out


def test_partition_pruning_reaches_the_scan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_type = df.filter(F.col("event_type") == "click")
    plan = _physical_plan(one_type)
    # the predicate must appear as a PartitionFilter (plan-time pruning),
    # not a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    assert one_type.count() == df.filter(F.col("event_type") == "click").count()


def test_dynamic_partition_overwrite_replaces_only_delivered_dates(
    spark, sf_dir, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("dyn") / "report")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    dates = sorted(r[0] for r in ev.select("event_date").distinct().collect())
    write_partitioned(ev, out, ["event_date"])
    before = spark.read.parquet(out).count()

    # redeliver ONE date with half its rows: only that partition changes
    redelivered = ev.filter(
        (F.col("event_date") == dates[0]) & (F.col("event_id") % 2 == 0)
    )
    n_redelivered = redelivered.count()
    n_first_date = ev.filter(F.col("event_date") == dates[0]).count()
    write_partitioned(redelivered, out, ["event_date"])

    after = spark.read.parquet(out)
    assert after.count() == before - n_first_date + n_redelivered
    # other dates untouched
    assert (
        after.filter(F.col("event_date") == dates[1]).count()
        == ev.filter(F.col("event_date") == dates[1]).count()
    )


def test_cobucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(o, "orders_b", ["o_orderkey"], 8)
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = _physical_plan(j)
        assert "SortMergeJoin" in plan
        # co-bucketed scan feeds the join directly: the shuffle was paid
        # once at write time, zero Exchange at query time
        assert "Exchange" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dynamic_partition_pruning_prunes_fact_scan(spark, partitioned_events):
    """A filtered dimension joined on the partition column must prune the
    fact scan AT RUNTIME (dynamicpruning expression in PartitionFilters) —
    the 100 TB shape: the date dimension carries the predicate, the fact
    table never lists the unselected partitions."""
    fact = spark.read.parquet(partitioned_events)
    dates = sorted(
        r[0] for r in fact.select("event_date").distinct().collect()
    )
    keep = dates[: max(1, len(dates) // 4)]
    dim = spark.createDataFrame(
        [(d, "hot" if d in keep else "cold") for d in dates],
        "event_date date, tag string",
    )
    # Two trigger conditions learned the hard way:
    # 1. broadcast the dim explicitly — at test SF the fact is small enough
    #    that Spark would otherwise broadcast IT, making the dim the probe
    #    side (a fixed date dimension never sf-scales, the hint stays legal).
    # 2. the dim filter must be a COMPARISON (=, IN, LIKE...): the optimizer
    #    only treats those shapes as 'likely selective'; a bare boolean
    #    column silently disables DPP.
    j = fact.join(F.broadcast(dim.filter(F.col("tag") == "hot")), "event_date")
    plan = _physical_plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:800]
    expected = fact.filter(F.col("event_date").isin(keep)).count()
    assert j.count() == expected


class TestZOrderAndCompaction:
    """Z-order clustering and small-file compaction (sinks/layout.py)."""

    @pytest.fixture(scope="class")
    def layouts(self, spark, sf_dir, tmp_path_factory):
        base = tmp_path_factory.mktemp("zorder")
        df = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value"
        )
        from data_engineering_project_spark.sinks.layout import (
            linear_write,
            zorder_write,
        )

        lin, zo = str(base / "linear"), str(base / "zorder")
        linear_write(df, lin, "user_id", 8)
        zorder_write(df, zo, ["user_id", "value"], 8)
        return lin, zo

    def test_zorder_prunes_on_both_dimensions(self, layouts):
        from data_engineering_project_spark.sinks.layout import (
            files_possibly_containing,
        )

        lin, zo = layouts
        # a user-id point probe and a narrow value range probe
        m_lin_user, t_lin = files_possibly_containing(lin, "user_id", 10, 10)
        m_lin_val, _ = files_possibly_containing(lin, "value", 1.0, 2.0)
        m_z_user, t_z = files_possibly_containing(zo, "user_id", 10, 10)
        m_z_val, _ = files_possibly_containing(zo, "value", 1.0, 2.0)
        assert t_lin > 1 and t_z > 1
        # linear layout: perfect on its sort key, useless on the other dim
        assert m_lin_user <= 2
        assert m_lin_val == t_lin
        # z-order: prunes on BOTH dimensions
        assert m_z_user < t_z
        assert m_z_val < t_z
        # and strictly beats linear on the non-sort-key dimension
        assert m_z_val < m_lin_val

    def test_zorder_preserves_content(self, spark, sf_dir, layouts):
        _, zo = layouts
        orig = load_table(spark, sf_dir, "events")
        got = spark.read.parquet(zo)
        assert got.count() == orig.count()
        a = got.agg(F.sum("event_id"), F.sum("user_id")).first()
        b = orig.agg(F.sum("event_id"), F.sum("user_id")).first()
        assert tuple(a) == tuple(b)

    def test_compaction_reduces_files_preserves_rows(
        self, spark, sf_dir, tmp_path
    ):
        from data_engineering_project_spark.sinks.layout import (
            compact_parquet_dir,
        )
        import glob
        import os

        path = str(tmp_path / "fragmented")
        df = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value"
        )
        df.repartition(48).write.parquet(path)
        before_files = len(glob.glob(os.path.join(path, "*.parquet")))
        before_rows, before_sum = df.count(), df.agg(F.sum("event_id")).first()[0]

        n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)

        after = spark.read.parquet(path)
        assert before_files == 48
        assert n < before_files
        assert after.count() == before_rows
        assert after.agg(F.sum("event_id")).first()[0] == before_sum
        # the swap protocol leaves no scratch dirs behind
        assert not os.path.isdir(path + "_next")
        assert not os.path.isdir(path + "_old")
