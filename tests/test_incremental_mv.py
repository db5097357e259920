"""Incremental materialized-view maintenance over the snapshot table.

Ties the two round-2 pieces together the way a production rollup runs:
the daily aggregate lives in a snapshot-manifest table and is maintained
by MERGEing only the delta partition's re-aggregated rows — never a full
recompute — while staying bit-equal to the from-scratch aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.sinks import snapshot_table as st
from data_engineering_project_spark.sources.tables import load_table


def _rollup(df):
    # exact integer units so partial rollups re-add losslessly
    # (functions/scalars.py:exact_decimal_sum rationale)
    return df.groupBy(
        F.col("ts").cast("date").alias("event_date"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0)).alias("units"),
    )


def test_delta_merge_equals_full_recompute(spark, sf_dir, tmp_path):
    table = str(tmp_path / "daily_mv")
    ev = load_table(spark, sf_dir, "events")
    split = "2024-01-20 12:00:00"  # mid-day: Jan 20 exists in base AND delta

    # day 0: materialize the base rollup
    base = ev.filter(F.col("ts") < split)
    st.write_table(
        _rollup(base).repartitionByRange(4, "event_date"),
        table,
        stats_cols=("event_date",),
    )

    # day N: a delta partition arrives; merge ONLY its re-aggregated keys.
    # For keys present in both, the merged row = base units + delta units,
    # computed by re-aggregating base rows for those keys from the MV itself
    # (one read of the tiny MV, zero reads of historical raw data).
    delta = _rollup(ev.filter(F.col("ts") >= split))
    current = st.read_table(spark, table)
    overlap = current.join(
        delta.select("event_date", "event_type"), ["event_date", "event_type"], "left_semi"
    )
    upsert = (
        overlap.unionByName(delta)
        .groupBy("event_date", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("units").alias("units"))
    )
    st.merge_upsert(
        spark, table, upsert, key_cols=("event_date", "event_type"),
        stats_cols=("event_date",),
    )

    got = {
        (str(r.event_date), r.event_type): (r.n, r.units)
        for r in st.read_table(spark, table).collect()
    }
    want = {
        (str(r.event_date), r.event_type): (r.n, r.units)
        for r in _rollup(ev).collect()
    }
    assert got == want
    # and it really was incremental: v1 carried at least the untouched
    # pre-split files by reference
    v0 = {f["path"] for f in st.read_manifest(table, 0).files}
    v1 = {f["path"] for f in st.read_manifest(table, 1).files}
    assert st.current_version(table) == 1
    assert v0 & v1  # untouched date-range files carried by reference
    assert v0 - v1  # and the overlapping date's file was actually rewritten
