"""Unit tests for the quantized PageRank operator (operators/graph.py)."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.operators.graph import (
    DAMPING_MICRO,
    UNIT,
    pagerank_quantized,
)


def _reference_pagerank(edges, iterations, unit=UNIT, damping=DAMPING_MICRO):
    """Pure-Python replica of the integer recurrence (the spec)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {n: unit for n in nodes}
    base = unit - damping
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // deg[u]
        rank = {n: base + (damping * s[n]) // unit for n in nodes}
    return rank


EDGES = [(1, 2), (2, 1), (2, 3), (3, 1)]


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_integer_spec(spark, iterations):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_quantized(df, iterations=iterations).collect()
    }
    assert got == _reference_pagerank(EDGES, iterations)


def test_pagerank_dangling_and_sourceless_nodes(spark):
    # 1 -> 2 only: node 2 is dangling (mass leaks), node 1 has no in-edges.
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_quantized(df, iterations=2).collect()
    }
    base = UNIT - DAMPING_MICRO
    # node 1 settles at base rank; node 2 receives base*damping after r2.
    assert got[1] == base
    assert got[2] == base + (DAMPING_MICRO * base) // UNIT


def test_pagerank_rejects_missing_columns(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="src"):
        pagerank_quantized(df)
