"""Independent brute-force twins for the survival / link-prediction /
attribution operators.

The DuckDB oracles for these queries mirror the engine's own algebraic
restatement (quantized ln terms, integer credit division), so a bug in the
RESTATEMENT would fool the oracle. These tests recompute each result from
raw collected rows with plain Python sets/floats/dicts — a second,
structurally unrelated implementation — and assert exact agreement plus
the operator-level invariants (survival monotonicity, credit
conservation)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def _us(ts):
    # naive wall-clock minus epoch == unix_micros under the engine's UTC
    # session; datetime.timestamp() would reinterpret in the machine TZ
    return int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def _events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
    )


def test_kaplan_meier_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(spark, sf_dir)
    us = {}
    for r in rows:
        t = _us(r.ts)
        u = us.setdefault(r.user_id, {"t0": t, "tp": None})
        u["t0"] = min(u["t0"], t)
        if r.event_type == "purchase":
            u["tp"] = t if u["tp"] is None else min(u["tp"], t)
    mx = max(_us(r.ts) for r in rows)

    from collections import Counter

    deaths, censored = Counter(), Counter()
    for u in us.values():
        if u["tp"] is not None:
            deaths[math.floor((u["tp"] - u["t0"]) / 3_600_000_000.0)] += 1
        else:
            censored[math.floor((mx - u["t0"]) / 3_600_000_000.0)] += 1

    n_total = len(us)
    expected = []
    removed_before = 0
    cum_unats = 0
    for h in sorted(set(deaths) | set(censored)):
        d, c = deaths[h], censored[h]
        n_at_risk = n_total - removed_before
        removed_before += d + c
        if d == 0:
            continue
        if d < n_at_risk:
            cum_unats += math.floor(math.log(1.0 - d / n_at_risk) * 1e6 + 0.5)
            surv = round(math.exp(cum_unats / 1e6), 6)
        else:
            surv = 0.0
        expected.append((h, n_at_risk, d, surv))

    got = sorted(
        (r.life_hours, r.n_at_risk, r.deaths, r.survival)
        for r in queries["events_kaplan_meier"](spark, sf_dir).collect()
    )
    expected.sort()
    assert [g[:3] for g in got] == [e[:3] for e in expected]
    # survival derives from ln/exp: JVM vs C libm can differ by 1 ulp,
    # flipping a micro-nat floor at a quantization boundary — integer parts
    # must match exactly, the float within a few micro-units
    for g, e in zip(got, expected):
        assert abs(g[3] - e[3]) <= 5e-6, (g, e)
    # operator invariants: curve starts below 1, never increases
    survs = [s for _, _, _, s in got]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert survs[0] < 1.0


def test_adamic_adar_matches_bruteforce(spark, sf_dir, queries):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    rows = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).collect()

    from collections import defaultdict

    orders_per_edge = defaultdict(set)
    for r in rows:
        orders_per_edge[(r.o_custkey, r.l_suppkey)].add(r.o_orderkey)
    edges = {e for e, orders in orders_per_edge.items() if len(orders) >= 2}

    custs_of = defaultdict(set)
    for c, s in edges:
        custs_of[s].add(c)

    pair_score = defaultdict(lambda: [0, 0])  # (n_common, unats)
    for s, custs in custs_of.items():
        d = len(custs)
        if d < 2:
            continue
        w = math.floor(1e6 / math.log(d) + 0.5)
        cl = sorted(custs)
        for i in range(len(cl)):
            for j in range(i + 1, len(cl)):
                acc = pair_score[(cl[i], cl[j])]
                acc[0] += 1
                acc[1] += w
    expected = sorted(
        (a, b, n, round(u / 1e6, 6))
        for (a, b), (n, u) in pair_score.items()
        if n >= 3
    )

    got = sorted(
        (r.cust_a, r.cust_b, r.n_common, r.aa_score)
        for r in queries["graph_adamic_adar"](spark, sf_dir).collect()
    )
    assert [g[:3] for g in got] == [e[:3] for e in expected]
    # each 1/ln(deg) term's floor can flip by 1 micro-unit on a JVM-vs-C
    # libm ulp; a pair sums n_common terms
    for g, e in zip(got, expected):
        assert abs(g[3] - e[3]) <= max(5e-6, g[2] * 2e-6), (g, e)


def test_time_decay_attribution_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(spark, sf_dir)
    purchases = [r for r in rows if r.event_type == "purchase"]
    clicks = [r for r in rows if r.event_type == "click"]
    by_user = {}
    for c in clicks:
        by_user.setdefault(c.user_id, []).append(c)

    from collections import defaultdict

    per_hour = defaultdict(lambda: [0, 0, 0])  # touches, credit_ppm, value_u
    for p in purchases:
        p_us = _us(p.ts)
        cents = math.floor(p.value * 100 + 0.5)
        touches = []
        for c in by_user.get(p.user_id, ()):
            c_us = _us(c.ts)
            if p_us - 24 * 3_600_000_000 <= c_us < p_us:
                w = math.floor(
                    2.0 ** (-((p_us - c_us) / 3_600_000_000.0)) * 1e6 + 0.5
                )
                if w > 0:
                    touches.append((c, w))
        if not touches:
            continue
        sw = sum(w for _, w in touches)
        credits = []
        for c, w in touches:
            credit = (w * 1_000_000) // sw
            credits.append(credit)
            hour = c.ts.hour
            acc = per_hour[hour]
            acc[0] += 1
            acc[1] += credit
            acc[2] += credit * cents
        # conservation: floor-division credit loses < 1 ppm per touch
        assert 1_000_000 - len(touches) < sum(credits) <= 1_000_000

    expected = sorted(
        (
            h,
            t,
            round(cr / 1e6, 6),
            round(vu / 1e8, 4),
        )
        for h, (t, cr, vu) in per_hour.items()
    )
    got = sorted(
        (r.click_hour, r.n_touches, r.credited_purchases, r.attributed_value)
        for r in queries["events_time_decay_attribution"](
            spark, sf_dir
        ).collect()
    )
    assert [g[:3] for g in got] == [e[:3] for e in expected]
    # attributed_value rounds an 8-decimal quantity to 4dp: Python's
    # banker's rounding vs Spark's HALF_UP can differ by one 4dp ulp on
    # exact .00005 boundaries (credited_purchases/aa_score have <= 6
    # decimals before a 6dp round, so they compare exactly above)
    for g, e in zip(got, expected):
        assert abs(g[3] - e[3]) <= 6e-5, (g, e)
