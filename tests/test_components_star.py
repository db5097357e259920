"""Star-contraction connected components vs plain min-label propagation.

The two algorithms must produce identical (node, component) maps; the
star variant must additionally handle a long path graph whose diameter
exceeds the propagation variant's round budget — the exact case it
exists for.
"""

from __future__ import annotations

import random

from data_engineering_project_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _as_map(rows):
    return {r.node: r.component for r in rows}


def test_star_matches_propagation_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    star = _as_map(connected_components_star(df).collect())
    prop = _as_map(connected_components(df, max_iter=30).collect())
    assert star == prop


def test_star_handles_high_diameter_path(spark):
    # path 0-1-2-…-199: diameter 199. Min propagation needs ~200 shuffles;
    # star contraction must finish in its default round budget (O(log²)).
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src: long, dst: long"
    )
    got = _as_map(connected_components_star(df).collect())
    assert got == {i: 0 for i in range(200)}


def test_star_two_components_and_isolated_pair(spark):
    df = spark.createDataFrame(
        [(10, 11), (11, 12), (3, 4), (20, 21), (21, 20)],
        "src: long, dst: long",
    )
    got = _as_map(connected_components_star(df).collect())
    assert got == {10: 10, 11: 10, 12: 10, 3: 3, 4: 3, 20: 20, 21: 20}


def test_star_empty_edges(spark):
    df = spark.createDataFrame([], "src: long, dst: long")
    assert connected_components_star(df).count() == 0


def test_plain_cc_escalates_to_star_on_high_diameter(spark):
    # path 0-1-…-60: diameter 60 > the 20-round propagation cap. The r13
    # sf0.5 sweep hit this via salted-chunk chain edges (a 3.8k-doc hot
    # bucket in 64-doc chunks IS a ~60-edge path); plain propagation must
    # escalate to star contraction and return the identical labeling
    # instead of raising.
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src: long, dst: long"
    )
    got = _as_map(connected_components(df).collect())
    assert got == {i: 0 for i in range(61)}


def test_quotient_escalation_matches_full_star_on_mixed_graph(spark):
    # dense 5-clique (converges in 1-2 rounds) + 40-edge chain (forces
    # escalation) + isolated pair + self-loop inside the clique. With
    # max_iter=2 the escalation path MUST fire; the composed
    # labels-then-quotient-star answer must equal star over the raw edges.
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(i, i + 1) for i in range(40)]
    extras = [(500, 501), (101, 101)]
    df = spark.createDataFrame(
        clique + chain + extras, "src: long, dst: long"
    )
    got = _as_map(connected_components(df, max_iter=2).collect())
    want = {i: 0 for i in range(41)}
    want.update({100 + i: 100 for i in range(5)})
    want.update({500: 500, 501: 500})
    assert got == want
    assert got == _as_map(connected_components_star(df).collect())


def test_quotient_escalation_matches_propagation_on_random_graph(spark):
    rng = random.Random(13)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    escalated = _as_map(connected_components(df, max_iter=1).collect())
    converged = _as_map(connected_components(df, max_iter=30).collect())
    assert escalated == converged


def test_union_find_min_label_matches_star_semantics():
    from data_engineering_project_spark.operators.components import (
        _union_find_min_label,
    )

    # chain + clique + pair, adversarial union order (large ids first)
    pairs = [(40, 39), (39, 38), (38, 0), (100, 103), (103, 101), (7, 8)]
    got = _union_find_min_label(pairs)
    assert got == {
        40: 0, 39: 0, 38: 0, 0: 0,
        100: 100, 103: 100, 101: 100,
        7: 7, 8: 7,
    }
    assert _union_find_min_label([]) == {}


def test_quotient_escalation_star_branch_forced(spark, monkeypatch):
    # Force the escalation past the driver-side union-find gate so the
    # distributed star branch stays covered; result must be identical to
    # the (default-gated) union-find answer and to converged propagation.
    import data_engineering_project_spark.operators.components as comp_mod

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(500, 501)],
        "src: long, dst: long",
    )
    monkeypatch.setattr(comp_mod, "_UF_MAX_ROWS", 0)
    star_branch = _as_map(connected_components(df, max_iter=2).collect())
    monkeypatch.undo()
    uf_branch = _as_map(connected_components(df, max_iter=2).collect())
    want = {i: 0 for i in range(41)}
    want.update({500: 500, 501: 500})
    assert star_branch == want
    assert uf_branch == want


def test_plain_cc_fallback_can_be_disabled(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src: long, dst: long"
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, fallback_to_star=False).collect()
