"""Independent brute-force twins for the round-4d two-sample statistics.

The DuckDB oracles for KS / Mann-Whitney / Theil-Sen mirror the engine's
own grouped-frequency restatement (tied-rank closed forms, integer CDF
numerators), so a bug in the RESTATEMENT itself would fool the oracle.
These tests recompute each statistic from raw collected rows with plain
Python sorting and floats — a second, structurally unrelated
implementation (per-row ranks, no tie-block algebra) — and assert exact
agreement after the same final ROUND."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def _samples(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    a, b = [], []
    for r in rows:
        if r.value is None:
            continue
        c = math.floor(r.value * 100 + 0.5)
        if r.event_type == "purchase":
            a.append(c)
        elif r.event_type == "click":
            b.append(c)
    return a, b


def test_ks_matches_bruteforce(spark, sf_dir, queries):
    a, b = _samples(spark, sf_dir)
    # brute force: walk the merged sorted values, track raw per-sample
    # counts (no grouped-cells table, no window algebra)
    d_num = 0
    for x in sorted(set(a) | set(b)):
        f1 = sum(1 for v in a if v <= x)
        f2 = sum(1 for v in b if v <= x)
        d_num = max(d_num, abs(f1 * len(b) - f2 * len(a)))
    row = queries["events_ks_two_sample"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    assert row["d_numer"] == d_num
    assert row["ks_d"] == round(d_num / (len(a) * len(b)), 6)


def test_mannwhitney_matches_bruteforce(spark, sf_dir, queries):
    a, b = _samples(spark, sf_dir)
    # brute force: explicit midranks over the pooled sample, per-row
    pooled = sorted(a + b)
    first = {}
    for i, v in enumerate(pooled):
        first.setdefault(v, i)
    count = defaultdict(int)
    for v in pooled:
        count[v] += 1
    midrank = {v: first[v] + (count[v] + 1) / 2 for v in count}  # 1-based
    r1 = sum(midrank[v] for v in a)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2
    ties = sum(c**3 - c for c in count.values())
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2) / sigma
    row = queries["events_mannwhitney_u"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["two_u1"] == int(2 * u1)
    assert row["mw_z"] == pytest.approx(round(z, 6), abs=2e-6)


def test_theilsen_matches_bruteforce(spark, sf_dir, queries):
    import statistics

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    cust_nation = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    nation_name = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    monthly = defaultdict(int)
    for r in o:
        nk = cust_nation[r.o_custkey]
        x = (r.o_orderdate.year - 1992) * 12 + r.o_orderdate.month - 1
        monthly[(nk, x)] += math.floor(r.o_totalprice * 1000 + 0.5)
    by_nation = defaultdict(list)
    for (nk, x), y in monthly.items():
        by_nation[nk].append((x, y))
    expected = {}
    for nk, pts in by_nation.items():
        # (y2-y1)/(x2-x1) is orientation-invariant, so unordered pair
        # enumeration in list order covers exactly the engine's x1<x2 set
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        ]
        # statistics.median averages the two middle values on even counts —
        # the same rule as the engine's dual-row_number selection
        expected[nation_name[nk]] = (
            len(pts) * (len(pts) - 1) // 2,
            round(statistics.median(slopes) / 1000, 6),
        )
    got = {
        r["nation"]: (r["n_pairs"], r["theilsen_slope"])
        for r in queries["nation_theilsen_trend"](spark, sf_dir).collect()
    }
    assert got == expected
