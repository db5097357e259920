"""Property-based cross-engine tests for the shared arithmetic devices
(functions/scalars.py) — the primitives ~40 catalog oracles interpolate.

Each property pins THREE computations to bit-identity on arbitrary
hypothesis-generated integers (boundary-biased toward the half-tie and
2^53/2^62 regimes the devices exist for):

  Spark device  ==  DuckDB sql_* twin  ==  exact integer ground truth
                                           (pure Python, Fraction/divmod)

The existing unit tests pin hand-picked poison values (72057594037927549
etc.); these close the gap BETWEEN the hand-picked points. A regression
in either engine's device (e.g. a future refactor reintroducing an IEEE
promotion) fails against the exact ground truth, not merely against the
other engine.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.scalars import (
    half_up_div,
    half_up_ratio,
    sql_half_up_div,
    sql_half_up_ratio,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Contract domain: the integer half-up step is exact to 2^63, but the
# FINAL ``out_units / 10^dp`` emits a double, and the two engines round
# that double differently once its ulp approaches the dp grid. The first
# runs of these properties measured both cliffs empirically:
#   - |out_units| > 2^53: the double can't hold the integer — both
#     engines drift from exact ground truth AND from each other
#     (u=960732669112663650 → 96073266911266.36 Spark vs .38 exact);
#   - |out_units| ≳ 2.25e15 (value ≳ 2^44): DuckDB's binary
#     ROUND(x, 2) — x*100 in doubles, rint — drifts a ulp where Spark's
#     BigDecimal shortest-repr round still lands the exact decimal
#     (u=384271916809240150 → .03 DuckDB vs .02 exact/Spark).
# Both regimes are out of contract (the docstrings route global sums at
# extreme scale through int128/decimal); the strategies stay inside
# value ≤ 2^43 — conservatively under the earlier (DuckDB) cliff — and
# a dedicated test pins an exact power-of-two boundary point.
_DIV = 100  # scale=10000, out_dp=2 → divisor 100, half 50
_U_MAX = (2**43) * 10_000  # value ≤ 2^43 → both engines provably exact
_UNITS = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.integers(min_value=-_U_MAX, max_value=_U_MAX),
    # land exactly on ±(k·div + half): the tie the device exists for
    st.builds(
        lambda k, s: s * (k * _DIV + _DIV // 2),
        st.integers(min_value=0, max_value=(2**43) * 100 - 1),
        st.sampled_from([1, -1]),
    ),
)


def _py_half_up_div(u: int, scale: int, dp: int) -> float:
    div = scale // 10**dp
    mag = (abs(u) + div // 2) // div
    out_units = mag if u >= 0 else -mag
    return float(Fraction(out_units, 10**dp))


def _py_half_up_ratio(num: int, den: int, dp: int) -> float | None:
    if den == 0:
        return None
    mag = (2 * abs(num) * 10**dp + den) // (2 * den)
    return float(Fraction(mag if num >= 0 else -mag, 10**dp))


@given(units=st.lists(_UNITS, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_half_up_div_matches_oracle_twin_and_exact_ground_truth(
    spark, units
):
    scale, dp = 10_000, 2
    expected = [_py_half_up_div(u, scale, dp) for u in units]

    df = spark.createDataFrame([(i, u) for i, u in enumerate(units)],
                               "i int, u long")
    got_spark = [
        r["v"]
        for r in df.select("i", half_up_div(F.col("u"), scale, dp).alias("v"))
        .orderBy("i")
        .collect()
    ]
    assert got_spark == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, u BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, u) for i, u in enumerate(units)])
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_half_up_div('u', scale, dp)} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got_duck == expected


# ratios: uniform, huge numerators (the DECIMAL(38,0)/HUGEINT regime a
# LONG multiply would overflow), and constructed exact .xxxxxx5 ties
# (den = 2^a·10^b divides 2·10^dp·num exactly on the half boundary)
_RATIO = st.one_of(
    st.tuples(
        st.integers(min_value=-(10**8), max_value=10**8),
        st.integers(min_value=1, max_value=10**9),
    ),
    # HUGEINT/DECIMAL(38,0) numerator regime (2·10^6·num ≈ 2·10^24, far
    # past a LONG multiply) while the QUOTIENT stays inside the output
    # double's 2^53-unit contract domain (|num/den| ≤ 10^8 → ≤ 10^14
    # output units)
    st.tuples(
        st.integers(min_value=-(10**18), max_value=10**18),
        st.integers(min_value=10**10, max_value=10**12),
    ),
    # num/den = (2k+1)/(2·10^6·m): true ratio sits exactly on a
    # representable half-tie at dp=6 when m divides a power of two
    st.builds(
        lambda k, m: ((2 * k + 1) * m, 2 * 10**6 * m),
        st.integers(min_value=-(10**6), max_value=10**6),
        st.sampled_from([1, 2, 4, 8, 128, 512]),
    ),
)


@given(pairs=st.lists(_RATIO, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_half_up_ratio_matches_oracle_twin_and_exact_ground_truth(
    spark, pairs
):
    dp = 6
    expected = [_py_half_up_ratio(n, d, dp) for n, d in pairs]

    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(pairs)],
        "i int, n long, d long",
    )
    got_spark = [
        r["v"]
        for r in df.select(
            "i", half_up_ratio(F.col("n"), F.col("d"), dp).alias("v")
        )
        .orderBy("i")
        .collect()
    ]
    assert got_spark == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, n BIGINT, d BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, n, d) for i, (n, d) in enumerate(pairs)],
    )
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_half_up_ratio('n', 'd', dp)} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got_duck == expected


def test_half_up_ratio_zero_denominator_is_null_on_both_engines(spark):
    df = spark.createDataFrame([(7, 0)], "n long, d long")
    assert (
        df.select(half_up_ratio(F.col("n"), F.col("d")).alias("v"))
        .collect()[0]["v"]
        is None
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT, d BIGINT)")
    con.execute("INSERT INTO t VALUES (7, 0)")
    assert (
        con.execute(f"SELECT {sql_half_up_ratio('n', 'd')} FROM t").fetchone()[0]
        is None
    )


def test_half_up_div_exact_at_the_output_double_boundary(spark):
    """out_units == 2^53 exactly: past the general-case cliffs, but a
    power of two is representable and divides through both engines' final
    round without drift — pinned so a change in either engine's ROUND
    implementation shows up here first. Arbitrary values this large are
    out of contract (see the strategy comment)."""
    u = (2**53) * _DIV  # out_units = 2^53 after an exact tie-free div
    expected = _py_half_up_div(u, 10_000, 2)
    df = spark.createDataFrame([(u,)], "u long")
    got = df.select(half_up_div(F.col("u"), 10_000, 2).alias("v")).collect()
    assert got[0]["v"] == expected
    con = duckdb.connect()
    got_d = con.execute(
        f"SELECT {sql_half_up_div(str(u), 10_000, 2)}"
    ).fetchone()[0]
    assert got_d == expected


def test_half_up_div_documented_poison_value_regression(spark):
    """72057594037927549 ≡ 49 mod 100 — one unit below the half-tie just
    under 2^56, where the pre-r9 IEEE-double device provably rounded the
    wrong way. Pinned here against the exact ground truth so the property
    tests keep covering it even if the strategy never regenerates it."""
    u = 72057594037927549
    expected = _py_half_up_div(u, 10_000, 2)
    df = spark.createDataFrame([(u,)], "u long")
    got = df.select(half_up_div(F.col("u"), 10_000, 2).alias("v")).collect()
    assert got[0]["v"] == expected
    con = duckdb.connect()
    got_d = con.execute(
        f"SELECT {sql_half_up_div(str(u), 10_000, 2)}"
    ).fetchone()[0]
    assert got_d == expected


# exact_avg: the r11 avg(double) migration device — fixed-decimal values
# (exact integer cents / 100), half-away average at dp=4
_CENTS = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    # land sums exactly on the .00005 tie at dp=4: sum_cents*100 ≡
    # half mod (100*count) arranged by construction below is fiddly —
    # instead bias toward tiny counts and odd cents where ties occur
    st.integers(min_value=-99, max_value=99),
)


def _py_exact_avg(cents: list[int], dp: int) -> float | None:
    vals = [c for c in cents]
    if not vals:
        return None
    num, den = sum(vals), 100 * len(vals)
    return _py_half_up_ratio(num, den, dp)


@given(cents=st.lists(_CENTS, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_exact_avg_matches_oracle_twin_and_exact_ground_truth(spark, cents):
    from data_engineering_project_spark.functions.scalars import (
        exact_avg,
        sql_exact_avg,
    )

    dp = 4
    expected = _py_exact_avg(cents, dp)
    vals = [c / 100.0 for c in cents]

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = df.agg(exact_avg(F.col("x"), 100, dp).alias("v")).collect()[0][
        "v"
    ]
    assert got_spark == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = con.execute(
        f"SELECT {sql_exact_avg('x', 100, dp)} FROM t"
    ).fetchone()[0]
    assert got_duck == expected


def test_exact_avg_all_null_group_is_null_on_both_engines(spark):
    from data_engineering_project_spark.functions.scalars import (
        exact_avg,
        sql_exact_avg,
    )

    df = spark.createDataFrame([(None,), (None,)], "x double")
    assert (
        df.agg(exact_avg(F.col("x"), 100, 4).alias("v")).collect()[0]["v"]
        is None
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.execute("INSERT INTO t VALUES (NULL), (NULL)")
    assert (
        con.execute(f"SELECT {sql_exact_avg('x', 100, 4)} FROM t").fetchone()[0]
        is None
    )
