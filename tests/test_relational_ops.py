"""Edge-semantics tests for the round-4b relational/graph additions.

Parity green proves sf-data agreement; these pin the corner cases the
synthetic tables may never produce: dominance ties on the skyline,
unreachable BFS nodes, zero-length LM inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bfs_unreachable_nodes_absent(spark):
    from data_engineering_project_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, src, rounds=2).collect()}
    # within 2 hops: 1(0), 2(1), 3(2); node 4 is 3 hops away, 10/11 disconnected
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_min_hops_wins_on_multiple_paths(spark):
    from data_engineering_project_spark.operators.graph import bfs_hops

    # 1->3 directly and 1->2->3: hops(3) must be 1, not 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, src, rounds=3).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def _skyline(spark, rows):
    """Run the pareto query's dominance semantics over literal parts."""
    import data_engineering_project_spark.plans.relational_queries as R

    df = spark.createDataFrame(
        [(i, f"p{i}", sz, pr) for i, (sz, pr) in enumerate(rows)],
        "p_partkey long, p_name string, p_size int, p_retailprice double",
    )
    # reuse the query body against an injected frame via monkeypatched loader
    orig = R.load_table
    try:
        R.load_table = lambda spark, sf, name: df
        out = R.parts_pareto_frontier(spark, "unused")
        return sorted((r["p_size"], r["p_retailprice"]) for r in out.collect())
    finally:
        R.load_table = orig


def test_skyline_keeps_duplicate_optimal_points(spark):
    # two identical points neither strictly dominates the other -> both stay
    rows = [(10, 5.0), (10, 5.0), (3, 9.0)]
    assert _skyline(spark, rows) == [(10, 5.0), (10, 5.0)]


def test_skyline_strict_dominance_on_one_axis(spark):
    # same price, bigger size dominates; same size, cheaper price dominates
    rows = [(10, 5.0), (8, 5.0), (10, 7.0), (12, 9.0)]
    assert _skyline(spark, rows) == [(10, 5.0), (12, 9.0)]


def test_mg_summaries_bounds_hold_under_tiny_capacity(spark):
    from data_engineering_project_spark.operators.sketch import (
        misra_gries_summaries,
    )

    df = spark.createDataFrame(
        [(i,) for i in [1] * 30 + [2] * 20 + list(range(100, 130))],
        "user_id long",
    ).coalesce(1)
    summ = misra_gries_summaries(df, "user_id", capacity=4).collect()
    dec = max(r["dec"] for r in summ)
    est = {r["user_id"]: r["est"] for r in summ if r["user_id"] is not None}
    true = {1: 30, 2: 20, **{k: 1 for k in range(100, 130)}}
    for k, t in true.items():
        lo = est.get(k, 0)
        assert lo <= t <= lo + dec


def test_lpa_tie_breaks_to_smallest_label(spark):
    from data_engineering_project_spark.operators.graph import (
        label_propagation,
    )

    # node 3 hears labels {1, 2} once each -> tie -> smallest (1) wins;
    # node 9 has no in-edges -> keeps its own label
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (9, 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=1).collect()
    }
    assert got[3] == 1
    assert got[9] == 9
    assert got[1] == 9  # single in-neighbor 9's label


def test_lpa_converges_on_two_cliques(spark):
    from data_engineering_project_spark.operators.graph import (
        label_propagation,
    )

    def clique(nodes):
        return [(a, b) for a in nodes for b in nodes if a != b]

    edges = spark.createDataFrame(
        clique([1, 2, 3]) + clique([10, 11, 12]) , "src long, dst long"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    # each clique collapses to one community; the two stay distinct
    assert len({got[1], got[2], got[3]}) == 1
    assert len({got[10], got[11], got[12]}) == 1
    assert got[1] != got[10]


def test_pca_power_iteration_finds_dominant_direction(spark):
    from data_engineering_project_spark.operators.clustering import (
        power_iteration_top_component,
    )

    # 40 vectors clustered along e1 with small e2 jitter -> the top
    # component must be overwhelmingly dim 1
    rows = []
    for i in range(40):
        v = [0.0] * 8
        v[0] = 1.0 if i % 2 == 0 else -1.0
        v[1] = 0.05 * ((i % 5) - 2)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["dim"]: r["v_unit"]
        for r in power_iteration_top_component(df, rounds=3).collect()
    }
    mag = {d: abs(u) for d, u in got.items()}
    assert max(mag, key=mag.get) == 1
    # dominant dim carries ~the whole unit norm (2^20)
    assert mag[1] > 0.99 * (1 << 20)
    assert all(mag[d] < 0.1 * (1 << 20) for d in mag if d != 1)
