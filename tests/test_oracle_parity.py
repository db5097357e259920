"""The correctness gate, locally: every catalog query vs its DuckDB oracle.

Mirrors the driver's comparison (row count + columns + order-insensitive
values) at sf0.001 so regressions surface before a round's verify runs.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare_frames, duckdb_conn

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    return duckdb_conn(sf_dir)


# ---------------------------------------------------------------------------
# Raw-output invariants for sketch operators whose CATALOG queries are
# restated as bound witnesses (round 4): the catalog rows hash-match an
# exact oracle, and these tests keep the richer raw-output guarantees
# (hard MG bounds, HLL error bound) value-checked against DuckDB ground
# truth at the operator level.
# ---------------------------------------------------------------------------


def test_spacesaving_raw_bounds(spark, sf_dir, oracle_con):
    from data_engineering_project_spark.operators import sketch as K
    from data_engineering_project_spark.sources.tables import load_table

    sdf = K.space_saving_topk(
        load_table(spark, sf_dir, "events"), "user_id", k=10, capacity=32
    ).toPandas()
    true_counts = dict(
        oracle_con.execute(
            "SELECT user_id, count(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert len(sdf) == min(10, len(true_counts))
    for _, r in sdf.iterrows():
        true = true_counts[r["user_id"]]
        assert r["est_lower"] <= true <= r["est_upper"]  # hard MG bounds
    if (sdf["est_upper"] == sdf["est_lower"]).all():
        # no decrements anywhere → provably exact: must equal true top-k
        want = sorted(true_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            : len(sdf)
        ]
        got = list(zip(sdf["user_id"], sdf["est_lower"]))
        assert got == want


def test_hll_raw_estimates(spark, sf_dir, oracle_con):
    from pyspark.sql import functions as F

    from data_engineering_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    sdf = (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .toPandas()
    )
    exact = dict(
        oracle_con.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert dict(zip(sdf["event_type"], sdf["exact_users"])) == exact
    rel_err = (sdf["est_users"] - sdf["exact_users"]).abs() / sdf["exact_users"]
    assert (rel_err <= 0.05).all()  # lgK=12 → ~1.6% typical, 5% generous


NO_ORACLE_INVARIANTS: dict = {}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # no SQL oracle (declared) — every such query must carry a
        # value-level invariant check instead of a bare rows-only pass
        assert name in NO_ORACLE_INVARIANTS, (
            f"{name} has no oracle SQL and no invariant checker; add one"
        )
        NO_ORACLE_INVARIANTS[name](sdf, oracle_con)
        return
    odf = oracle_con.execute(oracles[name]).fetchdf()
    res = compare_frames(name, sdf, odf)
    assert res.ok, f"{name}: {res.detail} | notes={res.notes[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # dense grid invariant: 24 hours per date
    assert len(rows) % 24 == 0
