"""A/B: q5 marginal-cost lever — staged lineitem pre-aggregation
(round-4 ROADMAP's /tmp/q5_ab.py, committed; round-5 verdict #3).

The incumbent joins ASIA-pruned lineitem → orders → customer row-by-row
and aggregates once at the end; its slope vs the DuckDB twin (~8×) was
diagnosed as multi-join per-row CPU. The candidate collapses lineitem to
per-(order, supplier-nation) revenue BEFORE the orders/customer joins, so
the join operators touch ~lines-per-order fewer rows. Revenue terms are
snapped to integer micro-units per ROW in both variants (decimal_units),
so the staged sum composes exactly — the A/B cannot change answers.

Run:  python tools/ab_q5.py       (sf0.1 + sf0.01 marginals)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_spark.functions.scalars import decimal_units
from data_engineering_project_spark.operators.hints import broadcast_if_small
from data_engineering_project_spark.plans.core_queries import (
    q5_local_supplier_volume,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def v1_staged_preagg(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_nations = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n["n_regionkey"] == r["r_regionkey"],
    ).select("n_nationkey", "n_name")
    s_asia = s.join(
        F.broadcast(asia_nations), s["s_nationkey"] == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c_asia = c.join(
        F.broadcast(asia_nations.select("n_nationkey")),
        c["c_nationkey"] == F.col("n_nationkey"),
        "left_semi",
    )
    # the staged pre-agg: per-(order, supplier-nation) integer revenue
    # units before any wide join
    pre = (
        li.join(broadcast_if_small(s_asia), li["l_suppkey"] == s_asia["s_suppkey"])
        .groupBy("l_orderkey", "s_nationkey", "n_name")
        .agg(F.sum(decimal_units(revenue, 10_000)).alias("rev_u"))
    )
    return (
        pre.join(o, pre["l_orderkey"] == o["o_orderkey"])
        .join(
            c_asia,
            (o["o_custkey"] == c_asia["c_custkey"])
            & (c_asia["c_nationkey"] == pre["s_nationkey"]),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum("rev_u") / 10_000, 2).alias("revenue"))
    )


if __name__ == "__main__":
    run_ab(
        {
            "v0_row_joins": q5_local_supplier_volume,
            "v1_staged_preagg": v1_staged_preagg,
        }
    )
