"""Tests for the exotic-encoding scalar functions (SURVEY.md §1.2): struct
decimals (values match the reference raw_data pattern, e.g.
{lo:123456, hi:0, signScale:6} → 123.456), struct GUIDs, epoch millis."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_project_spark.functions import (
    compose_datetime,
    decimal_from_struct,
    epoch_millis_to_ts,
    guid_hex,
)

DEC_SCHEMA = T.StructType(
    [
        T.StructField(
            "price",
            T.StructType(
                [
                    T.StructField("lo", T.LongType()),
                    T.StructField("hi", T.IntegerType()),
                    T.StructField("signScale", T.IntegerType()),
                ]
            ),
        )
    ]
)


def _decode(spark, lo, hi, sign_scale):
    df = spark.createDataFrame([((lo, hi, sign_scale),)], DEC_SCHEMA)
    return df.select(decimal_from_struct("price").alias("v")).first()["v"]


def test_decimal_reference_pattern(spark):
    # the exact struct committed in the reference's raw_data parquet
    assert _decode(spark, 123456, 0, 6) == Decimal("123.456")
    assert _decode(spark, 123, 0, 4) == Decimal("1.23")
    assert _decode(spark, 123456, 0, 10) == Decimal("1.23456")


def test_decimal_sign_bit(spark):
    assert _decode(spark, 123456, 0, 7) == Decimal("-123.456")


def test_decimal_128bit_hi_word(spark):
    # unscaled = hi*2^64 + lo = 2*2^64 + 5, scale 0
    expected = Decimal(2 * (1 << 64) + 5)
    assert _decode(spark, 5, 2, 0) == expected


def test_decimal_negative_lo_is_unsigned(spark):
    # lo = -1 as signed long == 2^64 - 1 unsigned
    assert _decode(spark, -1, 0, 0) == Decimal((1 << 64) - 1)


def test_guid_hex(spark):
    schema = T.StructType(
        [
            T.StructField(
                "g",
                T.StructType(
                    [
                        T.StructField("lo", T.LongType()),
                        T.StructField("hi", T.LongType()),
                    ]
                ),
            )
        ]
    )
    df = spark.createDataFrame([((255, 1),)], schema)
    out = df.select(guid_hex("g").alias("h")).first()["h"]
    assert out == "0000000000000001" + "00000000000000ff"
    assert len(out) == 32


def test_epoch_millis(spark):
    # SURVEY.md §1.2 verified value: 1653557530942 → 2022-05-26 09:32:10.942 UTC
    df = spark.range(1).select(epoch_millis_to_ts(F.lit(1653557530942)).alias("ts"))
    assert str(df.first()["ts"]) == "2022-05-26 09:32:10.942000"


def test_compose_datetime(spark):
    df = spark.createDataFrame([("2022-05-27", 7)], "date string, hour int")
    out = df.select(compose_datetime("date", "hour").alias("dt")).first()["dt"]
    assert str(out) == "2022-05-27 07:00:00"


def test_sql_and_dataframe_surfaces_agree(spark, sf_dir):
    """load_tables registers every table as a temp view; spark.sql and the
    DataFrame API over the same scan must return identical results (the
    reference's verify_setup.py:288-289 SQL round-trip, generalized)."""
    from pyspark.sql import functions as F

    from data_engineering_project_spark.sources.tables import load_tables

    tables = load_tables(spark, sf_dir)
    via_sql = spark.sql(
        "SELECT r_regionkey, count(*) AS n FROM region GROUP BY r_regionkey"
    ).collect()
    via_df = (
        tables["region"].groupBy("r_regionkey").agg(F.count("*").alias("n"))
    ).collect()
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_df))
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }


def test_half_up_div_exact_beyond_double_precision(spark):
    """ADVICE r9 #1: the half-up step must be TRUE integer division. The
    old floor((units+half)/div) promoted LONG to IEEE double, so unit sums
    past 2^53 silently lost low bits — exactly the 100 TB regime the LONG
    unit-sum device exists for. Probe unit sums around 2^53 whose low
    digits straddle the .xx5 boundary (su ≡ 49/50/51 mod 100 at 4dp→2dp):
    double arithmetic cannot even represent the odd neighbors up there."""
    import duckdb

    from data_engineering_project_spark.functions.scalars import (
        half_up_div,
        sql_half_up_div,
    )

    base = 2**53  # 9007199254740992; doubles step by 2 above this
    # 72057594037927549 = 100M-51 with float(100M-1) rounding UP across
    # the multiple of 100: the old double device returns M where exact
    # integer half-up says M-1 (fraction .49 rounds down)
    poison = 72057594037927549
    sus = [
        base + 49, base + 50, base + 51,      # boundary straddle
        base * 128 + 50,                      # deep past 2^53
        poison, -poison,                      # double-device killers
        -(base + 50), -(base + 51),           # half-away on negatives
    ]

    def py_half_up(su: int, scale: int, dp: int) -> float:
        div = scale // 10**dp
        half = div // 2
        q = -((-su + half) // div) if su < 0 else (su + half) // div
        return round(q / 10**dp, dp)

    expected = [py_half_up(su, 10_000, 2) for su in sus]

    df = spark.createDataFrame([(su,) for su in sus], "su long")
    got = [
        r["v"]
        for r in df.select(half_up_div(F.col("su"), 10_000, 2).alias("v"))
        .orderBy(F.abs(F.col("su")), "su")
        .collect()
    ]
    ordered = sorted(sus, key=lambda s: (abs(s), s))
    assert got == [py_half_up(su, 10_000, 2) for su in ordered]

    # DuckDB twin: same device text over a BIGINT column
    con = duckdb.connect()
    con.execute("CREATE TABLE t (su BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(su,) for su in sus])
    twin = con.execute(
        f"SELECT {sql_half_up_div('su', 10_000, 2)} AS v FROM t ORDER BY abs(su), su"
    ).fetchall()
    assert [v for (v,) in twin] == [py_half_up(su, 10_000, 2) for su in ordered]

    # and the double path would have been WRONG here (sanity that the
    # test actually discriminates): floor((su+50)/100.0) misses on the
    # poison value, where float rounding of su+50 crosses the boundary
    import math

    assert math.floor((poison + 50) / 100.0) != (poison + 50) // 100


def test_half_up_ratio_exact_ties_and_big_numerators(spark):
    """half_up_ratio: exact half-away at representable .xxxxxx5 ties
    (the ratio class ROUND(num/den, 6) can flip on between engines) and
    exactness for numerators past LONG-multiply range."""
    import duckdb

    from data_engineering_project_spark.functions.scalars import (
        half_up_ratio,
        sql_half_up_ratio,
    )
    from decimal import Decimal, ROUND_HALF_UP

    cases = [
        (7, 16),               # 0.4375 → .437500 exact width
        (1, 1280),             # 0.00078125 → ties at 6dp? .000781|25 → .000781
        (8000005, 16000000),   # EXACTLY 0.5000003125
        (1, 2_000_000),        # EXACTLY 0.0000005 — the tie itself
        (3, 2_000_000),        # 0.0000015 tie
        (-3, 2_000_000),       # negative tie → away from zero
        (10**14 + 1, 3 * 10**14),  # numerator beyond the LONG-multiply cap
        (5, 7),                # non-terminating
        (0, 13),
    ]

    def py_ref(n, d):
        q = (Decimal(n) / Decimal(d)).quantize(Decimal("0.000001"), ROUND_HALF_UP) \
            if n >= 0 else \
            -((Decimal(-n) / Decimal(d)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
        return float(q)

    df = spark.createDataFrame([(i, n, d) for i, (n, d) in enumerate(cases)],
                               "i int, n long, d long")
    got = {
        r["i"]: r["v"]
        for r in df.select("i", half_up_ratio(F.col("n"), F.col("d")).alias("v")).collect()
    }
    for i, (n, d) in enumerate(cases):
        assert got[i] == py_ref(n, d), (n, d, got[i], py_ref(n, d))

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, n BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(i, n, d) for i, (n, d) in enumerate(cases)])
    twin = dict(con.execute(
        f"SELECT i, {sql_half_up_ratio('n', 'd')} AS v FROM t"
    ).fetchall())
    for i, (n, d) in enumerate(cases):
        assert twin[i] == py_ref(n, d), ("duckdb", n, d, twin[i])


def test_half_up_ratio_null_and_zero_den(spark):
    """Zero denominators must be NULL on both engines, never a crash:
    Spark 4's ANSI mode makes integral div THROW on a zero divisor where
    DuckDB's // returns NULL — the device nullif-guards the divisor."""
    import duckdb

    from data_engineering_project_spark.functions.scalars import (
        half_up_ratio,
        sql_half_up_ratio,
    )

    df = spark.createDataFrame(
        [(1, 1, 0), (2, None, 5), (3, 3, None), (4, 1, 4)],
        "i int, n long, d long",
    )
    got = {
        r["i"]: r["v"]
        for r in df.select(
            "i", half_up_ratio(F.col("n"), F.col("d"), 6).alias("v")
        ).collect()
    }
    assert got == {1: None, 2: None, 3: None, 4: 0.25}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, n BIGINT, d BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(1, 1, 0), (2, None, 5), (3, 3, None), (4, 1, 4)],
    )
    twin = dict(
        con.execute(
            f"SELECT i, {sql_half_up_ratio('n', 'd')} AS v FROM t"
        ).fetchall()
    )
    assert twin == {1: None, 2: None, 3: None, 4: 0.25}


def test_half_up_div_debug_guard_catches_fractional_doubles(spark, monkeypatch):
    """ADVICE r10 #3: a double-typed caller passing a NON-integral unit
    sum violates half_up_div's contract — the LONG cast silently
    truncates toward zero. SPARK_GRAFT_DEBUG_DEVICES=1 turns that into a
    loud raise_error; NULLs still pass (empty-group sums), and the
    production path (env unset) is unchanged."""
    from pyspark.errors import SparkRuntimeException

    from data_engineering_project_spark.functions.scalars import half_up_div

    monkeypatch.setenv("SPARK_GRAFT_DEBUG_DEVICES", "1")
    good = spark.createDataFrame(
        [(12345.0,), (None,), (-250.0,)], "su double"
    )
    vals = [
        r["v"]
        for r in good.select(half_up_div(F.col("su"), 10_000, 2).alias("v"))
        .orderBy(F.col("su").asc_nulls_first())
        .collect()
    ]
    assert vals == [None, -0.03, 1.23]

    bad = spark.createDataFrame([(12345.5,)], "su double")
    with pytest.raises(SparkRuntimeException, match="integer-units contract"):
        bad.select(half_up_div(F.col("su"), 10_000, 2).alias("v")).collect()

    # env unset: the guard is absent and truncation stays silent
    monkeypatch.delenv("SPARK_GRAFT_DEBUG_DEVICES")
    out = spark.createDataFrame([(12345.5,)], "su double").select(
        half_up_div(F.col("su"), 10_000, 2).alias("v")
    ).collect()
    assert out[0]["v"] == 1.23


def test_composed_ratio_operands_survive_past_int64(spark):
    """ADVICE r10 #1 regression: callers that COMPOSE products before the
    ratio device (CMH's sum*sum, LOO's global_count*category_sum) must
    pre-cast operands to int128-width types — a BIGINT product overflows
    on DuckDB (throws) and a LONG product throws under Spark ANSI before
    the device's internal cast can help. Probe with a deviation sum of
    4e9 (square 1.6e19 > 2^63) and assert both engines agree."""
    import duckdb

    from data_engineering_project_spark.functions.scalars import (
        half_up_ratio,
        sql_half_up_ratio,
    )

    dev, var = 4_000_000_000, 7_000_000_000_000
    df = spark.createDataFrame([(dev, var)], "s long, v long")
    got = df.select(
        half_up_ratio(
            F.col("s").cast("decimal(38,0)") * F.col("s").cast("decimal(38,0)"),
            F.lit(1000000).cast("decimal(38,0)") * F.col("v"),
            6,
        ).alias("chi2")
    ).collect()[0]["chi2"]

    con = duckdb.connect()
    num = "CAST(s AS HUGEINT) * CAST(s AS HUGEINT)"
    den = "1000000 * CAST(v AS HUGEINT)"
    twin = con.execute(
        f"SELECT {sql_half_up_ratio(num, den, 6)} AS chi2 "
        f"FROM (SELECT CAST({dev} AS BIGINT) s, CAST({var} AS BIGINT) v)"
    ).fetchone()[0]
    assert got == twin == round(dev * dev / (1e6 * var), 6)

    # the OLD un-cast composition really does die on DuckDB — keep the
    # witness so the fix can't silently regress to it
    import pytest as _pytest

    with _pytest.raises(duckdb.OutOfRangeException):
        con.execute(
            f"SELECT {sql_half_up_ratio('s * s', '1000000 * v', 6)} "
            f"FROM (SELECT CAST({dev} AS BIGINT) s, CAST({var} AS BIGINT) v)"
        ).fetchone()


def test_finite_vector_matches_sql_twin_on_edges(spark):
    """Round-10 vector-poison guard: finite_vector (Spark forall) and
    _sql_finite_vec (DuckDB list_bool_and) must agree on every edge —
    NULL vector, NULL element, NaN/±inf element, -0.0 (finite), huge
    finite, and the EMPTY array (Spark forall over [] is TRUE; the twin
    COALESCEs DuckDB's NULL fold to TRUE)."""
    import duckdb

    from data_engineering_project_spark.operators.similarity import (
        finite_vector,
    )
    from data_engineering_project_spark.plans.similarity_queries import (
        _sql_finite_vec,
    )

    vecs = [
        (1, [1.0, 2.0]),
        (2, None),
        (3, [1.0, None]),
        (4, [float("nan"), 1.0]),
        (5, [float("inf")]),
        (6, [float("-inf")]),
        (7, [-0.0, 0.0]),
        (8, [1e30, -1e30]),
        (9, []),
    ]
    expected = {1: True, 2: False, 3: False, 4: False, 5: False,
                6: False, 7: True, 8: True, 9: True}

    df = spark.createDataFrame(vecs, "i int, v array<double>")
    got = {
        r["i"]: bool(r["ok"])
        for r in df.select(
            "i", F.coalesce(finite_vector(F.col("v")), F.lit(False)).alias("ok")
        ).collect()
    }
    assert got == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, v DOUBLE[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", vecs)
    twin = dict(
        con.execute(
            f"SELECT i, COALESCE({_sql_finite_vec('v')}, FALSE) FROM t"
        ).fetchall()
    )
    assert {k: bool(v) for k, v in twin.items()} == expected
