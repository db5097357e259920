"""A/B: q5 build-side fix (round-6, from the verdict-ordered codegen dump).

The dump (AQE on AND off) showed the l_suppkey join as BuildLeft with
LINEITEM as the broadcast build side: broadcast_if_small declined to hint
s_asia (Catalyst's no-column-stats join estimate for supplier⋈nation blows
past the threshold), so the planner hashed the FACT table and streamed the
~4k-row supplier dim through it. Per-sf cost then grows with the broadcast
BUILD of lineitem — the diagnosed 8.7× marginal slope.

Candidate: unconditionally F.broadcast(s_asia) — suppliers/|nations| is
small at EVERY scale by construction, so the hint is safe at 100 TB too;
lineitem becomes the streamed side of one codegen'd probe chain.

Run:  python tools/ab_q5_buildside.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_spark.functions import scalars as S
from data_engineering_project_spark.plans.core_queries import (
    q5_local_supplier_volume,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def v1_broadcast_dim(spark, sf_dir):
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
    return (
        li.join(F.broadcast(s_asia), li["l_suppkey"] == s_asia["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(
            c_asia,
            (o["o_custkey"] == c_asia["c_custkey"])
            & (c_asia["c_nationkey"] == s_asia["s_nationkey"]),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(S.exact_decimal_sum(revenue, 10_000).alias("revenue"))
    )


if __name__ == "__main__":
    run_ab(
        {
            "v0_current": q5_local_supplier_volume,
            "v1_broadcast_dim": v1_broadcast_dim,
        }
    )
