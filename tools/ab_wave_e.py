"""A/B the three real wave-E slope finds (full-catalog sweep, r13).

OUTCOME: v1_anova_longsplit ADOPTED (marginal 0.459 -> 0.047 s; v0_anova now
imports the adopted code). The two project-once JSON variants changed
nothing (codegen subexpression elimination already fires inside the
aggregate) - both queries are Jackson-parse engine floors, ratified in
OPTIMIZATION_r13.md.

- lineitem_returnflag_anova (slope 21.99, d_spark 1.30 s): the per-group
  sufficient statistics sum DEC38 decimals per ROW — Spark's Decimal is
  BigDecimal-backed above precision 18, so every row pays an object
  multiply+add. v1 keeps the hot loop in compiled long arithmetic: cents
  and cents² ride the shuffle as longs (cents < 2^24 by the fixed-decimal
  contract, so c² < 2^48 splits exactly into hi = c² >> 24, lo = c² &
  (2^24−1); per-group long sums stay exact below 2^39 ≈ 5.5e11 rows/group
  — above the 100 TB lineitem-per-returnflag count) and reconstructs the
  exact decimal statistics over the k-row group table.

- json_props_stats (slope 12.0, d_spark 1.73 s): get_json_object('$.k')
  appears in BOTH aggregate inputs (avg, max) — if the aggregate does not
  CSE it, every row parses the JSON twice. v1 projects k once below the
  aggregate.

- events_variant_props_stats (slope 9.5, d_spark 1.07 s): same probe for
  the variant_get(pv,'$.k') used by three aggregate inputs (the
  try_parse_json itself is already a single withColumn).

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_wave_e.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.scalars import decimal_units
from data_engineering_project_spark.plans.analytics_queries import (
    promo_revenue_by_brand as v0_promo,
)
from data_engineering_project_spark.plans.core_queries import (
    json_props_stats as v0_json,
)
from data_engineering_project_spark.plans.extended_queries import (
    events_variant_props_stats as v0_variant,
)
from data_engineering_project_spark.plans.inference_queries import (
    DEC38,
    lineitem_returnflag_anova as v0_anova,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def v1_anova_longsplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = decimal_units(F.col("l_extendedprice"), 100)
    c2 = cents * cents
    u = li.select(
        "l_returnflag",
        cents.alias("cents"),
        F.shiftright(c2, 24).alias("hi"),
        c2.bitwiseAND(F.lit((1 << 24) - 1)).alias("lo"),
    )
    g0 = u.groupBy("l_returnflag").agg(
        F.count("*").alias("n_l"),
        F.sum("cents").alias("s_l"),
        F.sum("hi").alias("ss_hi"),
        F.sum("lo").alias("ss_lo"),
    )
    g = g0.select(
        F.col("n_l").cast(DEC38).alias("n"),
        F.col("s_l").cast(DEC38).alias("s"),
        (
            F.col("ss_hi").cast(DEC38) * F.lit(1 << 24).cast(DEC38)
            + F.col("ss_lo").cast(DEC38)
        ).alias("ss"),
    )
    q = g.select(
        "n",
        "s",
        "ss",
        F.floor(
            F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("n").cast("double")
            + F.lit(0.5)
        )
        .cast(DEC38)
        .alias("sq"),
    )
    tot = q.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.sum("sq").cast("double").alias("sq_over_n"),
    )
    k = F.col("k")
    ssb = (
        F.col("sq_over_n")
        - F.col("s_tot").cast("double")
        * F.col("s_tot").cast("double")
        / F.col("n_tot").cast("double")
    )
    ssw = F.col("ss_tot").cast("double") - F.col("sq_over_n")
    return tot.select(
        k.alias("n_groups"),
        F.col("n_tot").cast("bigint").alias("n_rows"),
        F.round(
            (ssb / (k - 1))
            / (ssw / (F.col("n_tot") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
    )


def v1_json_project_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    proj = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return proj.groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


def v1_variant_project_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    proj = ev.filter(F.col("props").isNotNull()).select(
        "event_type",
        F.variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k"),
    )
    return proj.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


def v1_promo_decimal_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.functions.scalars import half_up_div
    from data_engineering_project_spark.plans.analytics_queries import (
        broadcast_if_small,
    )

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # decimal_units instead of F.round: same half-up integer snap (the
    # exact_decimal_sum pairing, proven vs the oracle's ROUND for
    # nonnegative money values) without Round's per-row BigDecimal hop —
    # and the sums become LONG sums instead of integer-valued double sums
    rev_units = decimal_units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
    )
    return (
        li.filter(F.to_date("l_shipdate").between("1996-01-01", "1996-12-31"))
        .select("l_partkey", rev_units.alias("rev_u"))
        .join(broadcast_if_small(p), p["p_partkey"] == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            half_up_div(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("rev_u")).otherwise(
                        F.lit(0)
                    )
                ),
                10_000,
                2,
            ).alias("promo_revenue"),
            half_up_div(F.sum("rev_u"), 10_000, 2).alias("total_revenue"),
        )
    )


EXPERIMENTS = {
    "anova": {
        "v0_anova": v0_anova,
        "v1_anova_longsplit": v1_anova_longsplit,
    },
    "json": {
        "v0_json": v0_json,
        "v1_json_project_once": v1_json_project_once,
    },
    "variant": {
        "v0_variant": v0_variant,
        "v1_variant_project_once": v1_variant_project_once,
    },
    "promo": {
        "v0_promo": v0_promo,
        "v1_promo_decimal_units": v1_promo_decimal_units,
    },
}

if __name__ == "__main__":
    # one experiment per invocation: the harness asserts all variants
    # return identical rows (they are rewrites of the SAME query)
    run_ab(EXPERIMENTS[sys.argv[1]])
