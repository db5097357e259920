"""A/B: q1 with exact_avg device (current) vs the r10 raw ROUND(avg(double))
variant — attributes the r11 bench move (0.61 -> 0.76 s) to the device or
to noise. The device is correctness-mandated (merge-order-independent
averages, hostile-numeric class); this measures what it costs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.ab_harness import run_ab


def v0_raw_avg(spark, sf_dir):
    from data_engineering_project_spark.functions import scalars as S
    from data_engineering_project_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(S.decimal_units(F.col("l_quantity"), 100)) / 100, 2).alias("sum_qty"),
            S.exact_decimal_sum(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            S.exact_decimal_sum(disc_price, 10_000).alias("sum_disc_price"),
            S.exact_decimal_sum(charge, 1_000_000).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def v1_exact_avg(spark, sf_dir):
    from data_engineering_project_spark.plans.catalog import queries

    return queries()["q1_pricing_summary"](spark, sf_dir)


if __name__ == "__main__":
    run_ab({"v0_raw_avg": v0_raw_avg, "v1_exact_avg": v1_exact_avg},
           equivalence_check=False)
