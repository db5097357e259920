"""Seeded query-shape fuzzer: random (filter ∧ group-by ∧ aggregate)
specs rendered twice — once as a Spark DataFrame plan, once as DuckDB SQL
over the same parquet — and compared value-for-value.

This is the sqllogictest-style corpus SURVEY.md §5 notes the reference
lacks: the catalog pins ~190 hand-written shapes, the fuzzer sweeps the
combinatorial space BETWEEN them (filter x key x aggregate cross
products nobody thought to write). Determinism rules match the engine's
invariants: only order-independent aggregates (count / countDistinct /
min / max / integer-unit sums), no LIMIT (ties), seeded RNG so every run
checks the identical corpus."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

# ---- per-table spec pools ---------------------------------------------

TABLES = {
    "events": {
        "filters": [
            # (spark_fn, sql_text)
            (lambda d: d.filter(F.col("event_type") == "click"),
             "event_type = 'click'"),
            (lambda d: d.filter(F.col("event_type").isin("purchase", "signup")),
             "event_type IN ('purchase', 'signup')"),
            (lambda d: d.filter(F.col("value") > 50),
             "value > 50"),
            (lambda d: d.filter(F.col("value") <= 10),
             "value <= 10"),
            (lambda d: d.filter(F.hour("ts") < 12),
             "hour(ts) < 12"),
            (lambda d: d.filter(F.col("user_id") % 7 == 3),
             "user_id % 7 = 3"),
            (lambda d: d.filter(F.col("props").isNotNull()),
             "props IS NOT NULL"),
        ],
        "keys": [
            ("event_type", lambda: F.col("event_type"), "event_type"),
            ("date", lambda: F.date_format("ts", "yyyy-MM-dd"),
             "strftime(CAST(ts AS DATE), '%Y-%m-%d')"),
            ("hod", lambda: F.hour("ts").cast("int"), "CAST(hour(ts) AS INTEGER)"),
            ("ubucket", lambda: (F.col("user_id") % 5).cast("bigint"),
             "CAST(user_id % 5 AS BIGINT)"),
        ],
        "aggs": [
            ("n", lambda: F.count("*").cast("bigint"),
             "CAST(count(*) AS BIGINT)"),
            ("du", lambda: F.countDistinct("user_id").cast("bigint"),
             "CAST(count(DISTINCT user_id) AS BIGINT)"),
            ("vmin", lambda: F.min("value"), "min(value)"),
            ("vmax", lambda: F.max("value"), "max(value)"),
            ("vcents", lambda: F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5))).cast("bigint"),
             "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"),
        ],
    },
    "lineitem": {
        "filters": [
            (lambda d: d.filter(F.col("l_returnflag") == "R"),
             "l_returnflag = 'R'"),
            (lambda d: d.filter(F.col("l_quantity") >= 25),
             "l_quantity >= 25"),
            (lambda d: d.filter(F.col("l_discount") < 0.05),
             "l_discount < 0.05"),
            (lambda d: d.filter(F.col("l_shipdate") >= "1997-01-01"),
             "l_shipdate >= DATE '1997-01-01'"),
            (lambda d: d.filter(F.col("l_partkey") % 10 != 0),
             "l_partkey % 10 <> 0"),
        ],
        "keys": [
            ("l_returnflag", lambda: F.col("l_returnflag"), "l_returnflag"),
            ("l_linestatus", lambda: F.col("l_linestatus"), "l_linestatus"),
            ("ship_year", lambda: F.year("l_shipdate").cast("int"),
             "CAST(year(l_shipdate) AS INTEGER)"),
            # floor() explicitly: DuckDB ROUNDS double->int casts, Spark
            # truncates — a bare CAST would diverge on x.5 buckets
            ("qbucket", lambda: F.floor(F.col("l_quantity") / 10).cast("int"),
             "CAST(floor(l_quantity / 10) AS INTEGER)"),
        ],
        "aggs": [
            ("n", lambda: F.count("*").cast("bigint"),
             "CAST(count(*) AS BIGINT)"),
            ("parts", lambda: F.countDistinct("l_partkey").cast("bigint"),
             "CAST(count(DISTINCT l_partkey) AS BIGINT)"),
            ("qmin", lambda: F.min("l_quantity"), "min(l_quantity)"),
            ("pmax", lambda: F.max("l_extendedprice"),
             "max(l_extendedprice)"),
            ("price_units", lambda: F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            ).cast("bigint"),
             "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))"
             " AS BIGINT)"),
        ],
    },
    "orders": {
        "filters": [
            (lambda d: d.filter(F.col("o_orderstatus") == "F"),
             "o_orderstatus = 'F'"),
            (lambda d: d.filter(F.col("o_totalprice") > 100_000),
             "o_totalprice > 100000"),
            (lambda d: d.filter(F.col("o_orderdate") < "1999-01-01"),
             "o_orderdate < DATE '1999-01-01'"),
            (lambda d: d.filter(F.col("o_custkey") % 3 == 1),
             "o_custkey % 3 = 1"),
        ],
        "keys": [
            ("o_orderpriority", lambda: F.col("o_orderpriority"), "o_orderpriority"),
            ("o_orderstatus", lambda: F.col("o_orderstatus"), "o_orderstatus"),
            ("order_year", lambda: F.year("o_orderdate").cast("int"),
             "CAST(year(o_orderdate) AS INTEGER)"),
        ],
        "aggs": [
            ("n", lambda: F.count("*").cast("bigint"),
             "CAST(count(*) AS BIGINT)"),
            ("custs", lambda: F.countDistinct("o_custkey").cast("bigint"),
             "CAST(count(DISTINCT o_custkey) AS BIGINT)"),
            ("tmax", lambda: F.max("o_totalprice"), "max(o_totalprice)"),
            ("total_millis", lambda: F.sum(
                F.floor(F.col("o_totalprice") * 1000 + F.lit(0.5))
            ).cast("bigint"),
             "CAST(sum(CAST(floor(o_totalprice * 1000 + 0.5) AS BIGINT))"
             " AS BIGINT)"),
        ],
    },
}

N_CASES = 40


def _gen_cases():
    rng = random.Random(20260814)
    cases = []
    for i in range(N_CASES):
        table = rng.choice(sorted(TABLES))
        pool = TABLES[table]
        filters = rng.sample(pool["filters"], rng.randint(0, 2))
        keys = rng.sample(pool["keys"], rng.randint(1, min(2, len(pool["keys"]))))
        aggs = rng.sample(pool["aggs"], rng.randint(1, 3))
        cases.append((i, table, filters, keys, aggs))
    return cases


CASES = _gen_cases()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "case", CASES, ids=[f"case{i}_{t}" for i, t, *_ in CASES]
)
def test_fuzzed_shape_matches_duckdb(spark, sf_dir, duck, case):
    _, table, filters, keys, aggs = case

    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for fn, _ in filters:
        df = fn(df)
    got_df = df.groupBy(
        *[expr().alias(name) for name, expr, _ in keys]
    ).agg(*[fn().alias(name) for name, fn, _ in aggs])
    got_cols = got_df.columns
    order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    got = sorted(
        tuple(str(row[i]) for i in order) for row in got_df.collect()
    )

    where = (
        " WHERE " + " AND ".join(sql for _, sql in filters)
        if filters else ""
    )
    key_sql = ", ".join(f"{sql} AS {name}" for name, _, sql in keys)
    agg_sql = ", ".join(f"{sql} AS {name}" for name, _, sql in aggs)
    group_names = ", ".join(name for name, _, _ in keys)
    q = (
        f"SELECT {key_sql}, {agg_sql} FROM {table}{where} "
        f"GROUP BY {group_names}"
    )
    res = duck.execute(q)
    ocols = [d[0] for d in res.description]
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
    exp = sorted(
        tuple(str(row[i]) for i in oorder) for row in res.fetchall()
    )

    assert sorted(got_cols) == sorted(ocols)
    assert got == exp, f"case failed: {q}"


# ---- join-shape fuzz: star joins are where planner bugs live ----------

JOINED = {
    "lineitem_part": {
        "spark": lambda spark, sf: spark.read.parquet(f"{sf}/lineitem.parquet")
        .join(
            F.broadcast(spark.read.parquet(f"{sf}/part.parquet")),
            F.col("p_partkey") == F.col("l_partkey"),
        ),
        "from": "lineitem l JOIN part p ON p.p_partkey = l.l_partkey",
        "filters": [
            (lambda d: d.filter(F.col("p_size").isin(10, 20)),
             "p_size IN (10, 20)"),
            (lambda d: d.filter(F.col("p_type") == "PROMO"),
             "p_type = 'PROMO'"),
            (lambda d: d.filter(F.col("l_quantity") < 30),
             "l_quantity < 30"),
            (lambda d: d.filter(F.col("l_shipdate") >= "1998-01-01"),
             "l_shipdate >= DATE '1998-01-01'"),
        ],
        "keys": [
            ("p_brand", lambda: F.col("p_brand"), "p_brand"),
            ("p_type", lambda: F.col("p_type"), "p_type"),
            ("rflag", lambda: F.col("l_returnflag"), "l_returnflag"),
        ],
        "aggs": [
            ("n", lambda: F.count("*").cast("bigint"),
             "CAST(count(*) AS BIGINT)"),
            ("parts", lambda: F.countDistinct("p_partkey").cast("bigint"),
             "CAST(count(DISTINCT p_partkey) AS BIGINT)"),
            ("rev_units", lambda: F.sum(
                F.floor(F.col("l_extendedprice")
                        * (1 - F.col("l_discount")) * 10_000 + F.lit(0.5))
            ).cast("bigint"),
             "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)"
             " * 10000 + 0.5) AS BIGINT)) AS BIGINT)"),
            ("szmax", lambda: F.max("p_size"), "max(p_size)"),
        ],
    },
    "orders_customer_nation": {
        "spark": lambda spark, sf: spark.read.parquet(f"{sf}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf}/customer.parquet"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(spark.read.parquet(f"{sf}/nation.parquet")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        ),
        "from": "orders o JOIN customer c ON c.c_custkey = o.o_custkey "
                "JOIN nation n ON n.n_nationkey = c.c_nationkey",
        "filters": [
            (lambda d: d.filter(F.col("c_acctbal") > 0), "c_acctbal > 0"),
            (lambda d: d.filter(F.col("c_mktsegment") == "BUILDING"),
             "c_mktsegment = 'BUILDING'"),
            (lambda d: d.filter(F.col("o_orderdate") >= "1998-01-01"),
             "o_orderdate >= DATE '1998-01-01'"),
        ],
        "keys": [
            ("n_name", lambda: F.col("n_name"), "n_name"),
            ("seg", lambda: F.col("c_mktsegment"), "c_mktsegment"),
            ("order_year", lambda: F.year("o_orderdate").cast("int"),
             "CAST(year(o_orderdate) AS INTEGER)"),
        ],
        "aggs": [
            ("n", lambda: F.count("*").cast("bigint"),
             "CAST(count(*) AS BIGINT)"),
            ("custs", lambda: F.countDistinct("c_custkey").cast("bigint"),
             "CAST(count(DISTINCT c_custkey) AS BIGINT)"),
            ("price_millis", lambda: F.sum(
                F.floor(F.col("o_totalprice") * 1000 + F.lit(0.5))
            ).cast("bigint"),
             "CAST(sum(CAST(floor(o_totalprice * 1000 + 0.5) AS BIGINT))"
             " AS BIGINT)"),
        ],
    },
}

N_JOIN_CASES = 20


def _gen_join_cases():
    rng = random.Random(814)
    cases = []
    for i in range(N_JOIN_CASES):
        name = rng.choice(sorted(JOINED))
        pool = JOINED[name]
        filters = rng.sample(pool["filters"], rng.randint(0, 2))
        keys = rng.sample(pool["keys"], rng.randint(1, 2))
        aggs = rng.sample(pool["aggs"], rng.randint(1, 3))
        cases.append((i, name, filters, keys, aggs))
    return cases


JOIN_CASES = _gen_join_cases()


@pytest.fixture(scope="module")
def duck_dims(sf_dir, duck):
    for t in ("customer", "nation", "supplier", "part"):
        duck.execute(
            f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return duck


@pytest.mark.parametrize(
    "case", JOIN_CASES, ids=[f"join{i}_{t}" for i, t, *_ in JOIN_CASES]
)
def test_fuzzed_join_shape_matches_duckdb(spark, sf_dir, duck_dims, case):
    _, name, filters, keys, aggs = case
    pool = JOINED[name]

    df = pool["spark"](spark, sf_dir)
    for fn, _ in filters:
        df = fn(df)
    got_df = df.groupBy(
        *[expr().alias(n) for n, expr, _ in keys]
    ).agg(*[fn().alias(n) for n, fn, _ in aggs])
    got_cols = got_df.columns
    order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    got = sorted(
        tuple(str(row[i]) for i in order) for row in got_df.collect()
    )

    where = (
        " WHERE " + " AND ".join(sql for _, sql in filters)
        if filters else ""
    )
    key_sql = ", ".join(f"{sql} AS {n}" for n, _, sql in keys)
    agg_sql = ", ".join(f"{sql} AS {n}" for n, _, sql in aggs)
    group_names = ", ".join(n for n, _, _ in keys)
    q = (
        f"SELECT {key_sql}, {agg_sql} FROM {pool['from']}{where} "
        f"GROUP BY {group_names}"
    )
    res = duck_dims.execute(q)
    ocols = [d[0] for d in res.description]
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
    exp = sorted(
        tuple(str(row[i]) for i in oorder) for row in res.fetchall()
    )

    assert sorted(got_cols) == sorted(ocols)
    assert got == exp, f"join case failed: {q}"


# ---- window-shape fuzz: partition x order x frame x function ----------
#
# Windows are the third shape family (after scans and joins) where
# engines disagree subtly — default frames, tie handling, NULL emission
# at partition edges. Determinism rules: every ORDER BY ends in the
# table's unique id (total order, so lag/lead and ROWS frames are
# well-defined) and every summed measure is an integer unit.

WINDOWED = {
    "events": {
        "prep": lambda spark, sf: spark.read.parquet(f"{sf}/events.parquet")
        .select(
            "event_id",
            "ts",
            F.col("event_type").alias("etype"),
            (F.col("user_id") % 5).cast("bigint").alias("ub"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        ),
        "from": "(SELECT event_id, ts, event_type AS etype, "
        "CAST(user_id % 5 AS BIGINT) AS ub, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events) t",
        "id": "event_id",
        "parts": [
            ("etype", ["etype"], "PARTITION BY etype "),
            ("ub", ["ub"], "PARTITION BY ub "),
            ("global", [], ""),
        ],
        "orders": [
            ("time", [("ts", False), ("event_id", False)],
             "ORDER BY ts, event_id"),
            ("cents", [("cents", False), ("event_id", False)],
             "ORDER BY cents, event_id"),
            ("cents_desc", [("cents", True), ("event_id", False)],
             "ORDER BY cents DESC, event_id"),
        ],
    },
    "orders": {
        "prep": lambda spark, sf: spark.read.parquet(f"{sf}/orders.parquet")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderstatus").alias("status"),
            F.floor(F.col("o_totalprice") * 1000 + F.lit(0.5))
            .cast("bigint")
            .alias("millis"),
        ),
        "from": "(SELECT o_orderkey, o_orderdate, "
        "o_orderpriority AS prio, o_orderstatus AS status, "
        "CAST(floor(o_totalprice * 1000 + 0.5) AS BIGINT) AS millis "
        "FROM orders) t",
        "id": "o_orderkey",
        "parts": [
            ("prio", ["prio"], "PARTITION BY prio "),
            ("status", ["status"], "PARTITION BY status "),
            ("global", [], ""),
        ],
        "orders": [
            ("date", [("o_orderdate", False), ("o_orderkey", False)],
             "ORDER BY o_orderdate, o_orderkey"),
            ("millis", [("millis", False), ("o_orderkey", False)],
             "ORDER BY millis, o_orderkey"),
            ("millis_desc", [("millis", True), ("o_orderkey", False)],
             "ORDER BY millis DESC, o_orderkey"),
        ],
    },
}

# frames: (name, (start, end) for rowsBetween, sql text)
W_FRAMES = [
    ("cum", (None, 0), "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
    ("trail2", (-2, 0), "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"),
    ("center", (-1, 1), "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"),
]

# functions: (name, needs_frame, spark_fn(measure, win), sql_fn(measure))
W_FUNCS = [
    ("rn", False, lambda m, w: F.row_number().over(w),
     lambda m: "row_number()"),
    ("lg", False, lambda m, w: F.lag(m, 1).over(w), lambda m: f"lag({m}, 1)"),
    ("ld", False, lambda m, w: F.lead(m, 2).over(w),
     lambda m: f"lead({m}, 2)"),
    ("s", True, lambda m, w: F.sum(m).over(w), lambda m: f"sum({m})"),
    ("mx", True, lambda m, w: F.max(m).over(w), lambda m: f"max({m})"),
    ("cnt", True, lambda m, w: F.count(F.lit(1)).over(w),
     lambda m: "count(*)"),
    # rank-family functions: deterministic because every order is total
    ("pr", False, lambda m, w: F.percent_rank().over(w),
     lambda m: "percent_rank()"),
    ("cd", False, lambda m, w: F.cume_dist().over(w),
     lambda m: "cume_dist()"),
    ("nt", False, lambda m, w: F.ntile(4).over(w), lambda m: "ntile(4)"),
    # navigation over explicit frames (frame edges are where engines
    # disagree first; the total order keeps results deterministic)
    ("fv", True, lambda m, w: F.first_value(m).over(w),
     lambda m: f"first_value({m})"),
    ("nv", True, lambda m, w: F.nth_value(m, 2).over(w),
     lambda m: f"nth_value({m}, 2)"),
    ("mn", True, lambda m, w: F.min(m).over(w), lambda m: f"min({m})"),
]

N_WINDOW_CASES = 20


def _gen_window_cases():
    rng = random.Random(41214)
    cases = []
    for i in range(N_WINDOW_CASES):
        table = rng.choice(sorted(WINDOWED))
        pool = WINDOWED[table]
        part = rng.choice(pool["parts"])
        order = rng.choice(pool["orders"])
        frame = rng.choice(W_FRAMES)
        funcs = rng.sample(W_FUNCS, rng.randint(2, 3))
        cases.append((i, table, part, order, frame, funcs))
    return cases


WINDOW_CASES = _gen_window_cases()


@pytest.mark.parametrize(
    "case",
    WINDOW_CASES,
    ids=[
        f"win{i}_{t}_{p[0]}_{o[0]}_{fr[0]}"
        for i, t, p, o, fr, _ in WINDOW_CASES
    ],
)
def test_fuzzed_window_shape_matches_duckdb(spark, sf_dir, duck, case):
    from pyspark.sql import Window

    _, table, (_, pcols, psql), (_, ocols, osql), (_, frange, frsql), funcs = (
        case
    )
    pool = WINDOWED[table]
    measure = "cents" if table == "events" else "millis"

    df = pool["prep"](spark, sf_dir)
    base = Window.partitionBy(*pcols).orderBy(
        *[F.col(c).desc() if d else F.col(c).asc() for c, d in ocols]
    )
    lo, hi = frange
    framed = base.rowsBetween(
        Window.unboundedPreceding if lo is None else lo, hi
    )
    out = df.select(
        pool["id"],
        *[
            fn(F.col(measure), framed if needs else base).alias(n)
            for n, needs, fn, _ in funcs
        ],
    )
    got_cols = out.columns
    order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    got = sorted(
        tuple(str(row[i]) for i in order) for row in out.collect()
    )

    over = {
        True: f"({psql}{osql} {frsql})",
        False: f"({psql}{osql})",
    }
    sel = ", ".join(
        f"{sqlf(measure)} OVER {over[needs]} AS {n}"
        for n, needs, _, sqlf in funcs
    )
    q = f"SELECT {pool['id']}, {sel} FROM {pool['from']}"
    res = duck.execute(q)
    ocols_ = [d[0] for d in res.description]
    oorder = sorted(range(len(ocols_)), key=lambda i: ocols_[i])
    exp = sorted(
        tuple(str(row[i]) for i in oorder) for row in res.fetchall()
    )

    assert sorted(got_cols) == sorted(ocols_)
    assert got == exp, f"window case failed: {q}"


# RANGE frames: the order column is intentionally NON-unique (ties are the
# whole point — a RANGE frame includes the full tie group on both engines),
# so only frame AGGREGATES are legal here; navigation/rank functions would
# be ambiguous under ties and are excluded by construction.
RANGE_CASES = [
    ("events_type_trail100",
     "events", ["etype"], "PARTITION BY etype ", "cents",
     (-100, 0), "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW"),
    ("events_global_center50",
     "events", [], "", "cents",
     (-50, 50), "RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING"),
    ("orders_status_trail5000",
     "orders", ["status"], "PARTITION BY status ", "millis",
     (-5000, 0), "RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW"),
    ("orders_global_ahead2000",
     "orders", [], "", "millis",
     (0, 2000), "RANGE BETWEEN CURRENT ROW AND 2000 FOLLOWING"),
]


@pytest.mark.parametrize(
    "case", RANGE_CASES, ids=[c[0] for c in RANGE_CASES]
)
def test_range_frame_aggregates_match_duckdb(spark, sf_dir, duck, case):
    from pyspark.sql import Window

    _, table, pcols, psql, measure, (lo, hi), frsql = case
    pool = WINDOWED[table]
    df = pool["prep"](spark, sf_dir)
    w = (
        Window.partitionBy(*pcols)
        .orderBy(F.col(measure).asc())
        .rangeBetween(lo, hi)
    )
    out = df.select(
        pool["id"],
        F.sum(measure).over(w).alias("s"),
        F.min(measure).over(w).alias("mn"),
        F.max(measure).over(w).alias("mx"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    got = sorted(tuple(str(v) for v in row) for row in out.collect())

    over = f"({psql}ORDER BY {measure} {frsql})"
    q = (
        f"SELECT {pool['id']}, sum({measure}) OVER {over} AS s, "
        f"min({measure}) OVER {over} AS mn, "
        f"max({measure}) OVER {over} AS mx, "
        f"count(*) OVER {over} AS cnt FROM {pool['from']}"
    )
    exp = sorted(
        tuple(str(v) for v in row) for row in duck.execute(q).fetchall()
    )
    assert got == exp, f"range-frame case failed: {q}"


# outer/semi/anti shapes: NULL-preservation and existence semantics are
# the other classic cross-engine parity surface (the inner-star fuzzer
# above can't catch a dropped unmatched row or an EXISTS/IN mismatch)
OSA_CASES = [
    ("left_outer_unmatched_preserved",
     lambda spark, sf: spark.read.parquet(f"{sf}/customer.parquet")
     .join(
         spark.read.parquet(f"{sf}/orders.parquet")
         .filter(F.col("o_orderdate") >= "1998-06-01"),
         F.col("o_custkey") == F.col("c_custkey"), "left")
     .groupBy("c_nationkey")
     .agg(
         F.count("*").cast("bigint").alias("n_rows"),
         F.count("o_orderkey").cast("bigint").alias("n_orders"),
         F.countDistinct("c_custkey").cast("bigint").alias("n_custs"),
     ),
     "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_rows, "
     "CAST(count(o_orderkey) AS BIGINT) AS n_orders, "
     "CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_custs "
     "FROM customer c LEFT JOIN (SELECT * FROM orders "
     "WHERE o_orderdate >= DATE '1998-06-01') o "
     "ON o.o_custkey = c.c_custkey GROUP BY c_nationkey"),
    ("semi_exists",
     lambda spark, sf: spark.read.parquet(f"{sf}/customer.parquet")
     .join(
         spark.read.parquet(f"{sf}/orders.parquet")
         .filter(F.col("o_totalprice") > 200_000),
         F.col("o_custkey") == F.col("c_custkey"), "left_semi")
     .groupBy("c_mktsegment")
     .agg(F.count("*").cast("bigint").alias("n")),
     "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n FROM customer c "
     "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
     "AND o.o_totalprice > 200000) GROUP BY c_mktsegment"),
    ("anti_not_exists",
     lambda spark, sf: spark.read.parquet(f"{sf}/customer.parquet")
     .join(
         spark.read.parquet(f"{sf}/orders.parquet")
         .filter(F.col("o_orderdate") >= "1998-01-01"),
         F.col("o_custkey") == F.col("c_custkey"), "left_anti")
     .groupBy("c_nationkey")
     .agg(
         F.count("*").cast("bigint").alias("n"),
         F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)))
         .cast("bigint").alias("bal_cents"),
     ),
     "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n, "
     "CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) "
     "AS bal_cents FROM customer c WHERE NOT EXISTS "
     "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
     "AND o.o_orderdate >= DATE '1998-01-01') GROUP BY c_nationkey"),
    ("full_outer_digest",
     lambda spark, sf: spark.read.parquet(f"{sf}/customer.parquet")
     .filter(F.col("c_custkey") % 2 == 0)
     .select(F.col("c_custkey").alias("k"))
     .join(
         spark.read.parquet(f"{sf}/customer.parquet")
         .filter(F.col("c_custkey") % 3 == 0)
         .select(F.col("c_custkey").alias("k2")),
         F.col("k") == F.col("k2"), "full")
     .agg(
         F.count("*").cast("bigint").alias("n_rows"),
         F.count("k").cast("bigint").alias("n_left"),
         F.count("k2").cast("bigint").alias("n_right"),
     ),
     "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
     "CAST(count(k) AS BIGINT) AS n_left, "
     "CAST(count(k2) AS BIGINT) AS n_right FROM "
     "(SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0) a "
     "FULL JOIN (SELECT c_custkey AS k2 FROM customer "
     "WHERE c_custkey % 3 = 0) b ON a.k = b.k2"),
]


@pytest.mark.parametrize("case", OSA_CASES, ids=[c[0] for c in OSA_CASES])
def test_outer_semi_anti_shapes_match_duckdb(spark, sf_dir, duck_dims, case):
    _, spark_fn, sql = case
    out = spark_fn(spark, sf_dir)
    cols = out.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    got = sorted(
        tuple(str(row[i]) for i in order) for row in out.collect()
    )
    res = duck_dims.execute(sql)
    ocols = [d[0] for d in res.description]
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
    exp = sorted(
        tuple(str(row[i]) for i in oorder) for row in res.fetchall()
    )
    assert sorted(cols) == sorted(ocols)
    assert got == exp, case[0]
