"""A/B cost attribution for the three wave-D slope finds (r13):
events_map_roundtrip 18.06 (d_spark 2.9 s), q8_nation_market_share 8.9
(1.6 s), lineitem_expectations 10.09 (1.2 s).

- events_map_roundtrip: the from_json(props) parse is consumed ONLY as a
  NULL/whitespace filter — PERMISSIVE from_json returns a NULL struct
  exactly for NULL or all-ASCII-whitespace input, which is the predicate
  the DuckDB oracle states directly (props IS NOT NULL AND
  trim(props, ' \\t\\n\\r') <> '', the r10 hostile-string pairing). v1
  filters with btrim directly — the JSON parse (a per-row Jackson
  invocation) disappears; the map round-trip (collect_list →
  map_from_entries → explode), the query's actual subject, is untouched.
- q8 / expectations: the lineitem⋈orders join is SortMergeJoin — both
  sides pay a per-partition sort that a shuffled-hash join skips (guide
  §3: for large⋈large with a scalar agg on top, SHJ trades sort CPU for
  a build map). v1 adds the shuffle_hash hint on the orders side.

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_wave_d.py [roundtrip|q8|expect]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.scalars import (
    half_up_div,
    half_up_ratio,
)
from data_engineering_project_spark.plans.extended_queries import (
    events_map_roundtrip as rt_v0,
    q8_nation_market_share as q8_v0,
)
from data_engineering_project_spark.plans.quality_queries import (
    lineitem_expectations as ex_v0,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def rt_v1_btrim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.filter(F.col("event_type").isNotNull()).filter(
        F.col("props").isNotNull() & (F.btrim("props", F.lit(" \t\n\r")) != "")
    )
    counts = parsed.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("date"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    as_map = counts.groupBy("date").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    return as_map.select(
        "date", F.explode("type_counts").alias("event_type", "n")
    )


def q8_v1_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).hint("shuffle_hash")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000, 0
    )
    nation_units = F.when(
        F.col("n_name") == "NATION_0", F.col("volume_units")
    ).otherwise(F.lit(0.0))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            units.alias("volume_units"),
            F.col("n_name"),
        )
        .groupBy("o_year")
        .agg(
            half_up_div(F.sum(nation_units), 10_000, 2).alias("nation_volume"),
            half_up_div(F.sum("volume_units"), 10_000, 2).alias("total_volume"),
            half_up_ratio(
                F.sum(nation_units), F.sum("volume_units"), 6
            ).alias("mkt_share"),
        )
    )


def ex_v1_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_quantity", "l_discount", "l_returnflag", "l_shipdate", "o_orderdate"
    )
    agg = j.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("l_quantity")).alias("q_nulls"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
        F.min("l_discount").alias("d_min"),
        F.max("l_discount").alias("d_max"),
        F.sum(
            (F.col("l_shipdate") >= F.col("o_orderdate")).cast("long")
        ).alias("ship_ok"),
        F.count(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), F.lit(1))
        ).alias("bad_flag"),
    )
    checks = F.array(
        F.struct(
            F.lit("l_quantity_no_nulls").alias("expectation"),
            (F.col("q_nulls") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("l_quantity_in_range").alias("expectation"),
            ((F.col("q_min") >= 1) & (F.col("q_max") <= 50)).alias("passed"),
        ),
        F.struct(
            F.lit("l_discount_in_range").alias("expectation"),
            ((F.col("d_min") >= 0) & (F.col("d_max") <= 0.1)).alias("passed"),
        ),
        F.struct(
            F.lit("l_shipdate_after_orderdate_rate").alias("expectation"),
            (F.col("ship_ok") * 100 >= F.col("n_rows") * 95).alias("passed"),
        ),
        F.struct(
            F.lit("returnflag_domain").alias("expectation"),
            (F.col("bad_flag") == 0).alias("passed"),
        ),
    )
    return agg.select(F.explode(checks).alias("e"), F.col("n_rows")).select(
        "e.expectation", "e.passed", "n_rows"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("roundtrip", "all"):
        run_ab({"rt_v0_from_json": rt_v0, "rt_v1_btrim": rt_v1_btrim})
    if which in ("q8", "all"):
        run_ab({"q8_v0_smj": q8_v0, "q8_v1_shj": q8_v1_shj})
    if which in ("expect", "all"):
        run_ab({"ex_v0_smj": ex_v0, "ex_v1_shj": ex_v1_shj})
