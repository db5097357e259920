"""A/B: cdc_user_state marginal-cost levers (round-13 slope 3.76).

The incumbent resolves latest-wins state with ONE aggregation,
``max(struct(ts, event_id, value, op))`` — but a struct-typed aggregation
buffer is not UnsafeRow-mutable, so Spark plans **SortAggregate**: every
changelog partition pays an O(n log n) LOCAL sort by user_id before the
partial agg (plans/r13/cdc_user_state_before.txt operators (4)-(5)). Only
partials cross the exchange, so the SHUFFLE is already minimal; the slope
cost is the map-side sort. Candidates:

- v1_window: the oracle's textbook ``row_number() = 1`` window — full
  shuffle + sort of every change row on user_id. Expected to lose at
  scale (shuffles the changelog, not partials); measured for the floor
  note.
- v2_hashagg_packed: HashAggregate on ``max(packed_seq)`` where
  packed_seq = epoch_micros(ts) * 10^10 + event_id as DECIMAL(38,0)
  (decimal is a mutable buffer type -> HashAggregate, no map-side sort),
  then a join back to the changelog on (user_id, packed_seq) to fetch
  the winning payload. Trades the local sort for a second scan + a
  changelog-sized join shuffle. NOT shippable as-is (the pack assumes
  ts >= epoch and event_id < 1e10 — hostile-time data breaks it); the
  A/B only prices what a hash-aggregable buffer would buy.

Run:  SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
      SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
      python tools/ab_cdc_state.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_project_spark.plans.cdc_queries import (
    _changelog,
    cdc_user_state,
)
from tools.ab_harness import run_ab


def v0_current(spark, sf_dir):
    return cdc_user_state(spark, sf_dir)


def v1_window(spark, sf_dir):
    ch = _changelog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id")
    ranked = ch.select(
        "user_id",
        "ts",
        "op",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_changes"),
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("op") != "D")
    ).select(
        "user_id",
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


def v2_hashagg_packed(spark, sf_dir):
    ch = _changelog(spark, sf_dir).withColumn(
        "_seq",
        (
            F.unix_micros(F.col("ts").cast("timestamp")).cast("decimal(38,0)")
            * F.lit(10_000_000_000).cast("decimal(38,0)")
            + F.col("event_id").cast("decimal(38,0)")
        ),
    )
    mx = ch.groupBy("user_id").agg(
        F.max("_seq").alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    ).select(F.col("user_id").alias("_mx_uid"), "_mx", "_n")
    return (
        ch.join(
            mx,
            (F.col("user_id") == F.col("_mx_uid"))
            & (F.col("_seq") == F.col("_mx")),
        )
        .filter(F.col("op") != "D")
        .select(
            "user_id",
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            F.col("_n").cast("bigint").alias("n_changes"),
        )
    )


if __name__ == "__main__":
    run_ab(
        {
            "v0_current": v0_current,
            "v1_window": v1_window,
            "v2_hashagg_packed": v2_hashagg_packed,
        },
    )
