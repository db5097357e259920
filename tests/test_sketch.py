"""Count-min sketch property tests: the CMS guarantees, checked exactly.

CMS theory promises (i) est ≥ true for every key (one-sided error),
(ii) est ≤ true + eps·N with probability 1−delta, and (iii) therefore
100% recall of true φ-heavy-hitters. (i) and (iii) are deterministic
consequences of the structure — we assert them universally; (ii) is
probabilistic — we assert the *expected-case* bound with generous slack
on a fixed-seed dataset (deterministic test, no flake).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import sketch as K
from data_engineering_project_spark.sources.tables import load_table


def _est_vs_true(spark, sf_dir, depth, width):
    ev = load_table(spark, sf_dir, "events")
    sk = K.count_min_sketch(ev, "user_id", depth=depth, width=width)
    est = K.cms_estimate(
        sk, ev.select("user_id").distinct(), "user_id", depth=depth, width=width
    )
    true = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    return est.join(true, "user_id").collect(), ev.count()


def test_cms_never_underestimates(spark, sf_dir):
    rows, _ = _est_vs_true(spark, sf_dir, K.DEPTH, K.WIDTH)
    assert rows
    for r in rows:
        assert r.est_count >= r.true_count, r


def test_cms_error_within_bound(spark, sf_dir):
    # eps = e/width; expected per-probe collision mass is N/width, and the
    # min over `depth` rows is far below the worst-case bound — assert the
    # formal eps·N bound, which the expected case clears by orders of
    # magnitude on this data.
    rows, n = _est_vs_true(spark, sf_dir, K.DEPTH, K.WIDTH)
    bound = math.e / K.WIDTH * n
    for r in rows:
        assert r.est_count - r.true_count <= bound, r


def test_cms_heavy_hitters_perfect_recall(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    phi = 0.008
    exact = {
        r.user_id
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= phi * n)
        .collect()
    }
    detected = {
        r.user_id
        for r in K.cms_heavy_hitters(ev, "user_id", threshold_frac=phi).collect()
    }
    assert exact, "threshold too high — test would be vacuous"
    assert exact <= detected  # one-sided error ⇒ no false negatives


def test_cms_sketch_is_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sk = K.count_min_sketch(ev, "user_id", depth=3, width=64)
    assert sk.count() <= 3 * 64
    # every input occurrence lands in every row ⇒ each row's cnt sums to N
    per_row = sk.groupBy("row_idx").agg(F.sum("cnt").alias("s")).collect()
    n = ev.count()
    assert {r.s for r in per_row} == {n}
    assert {r.row_idx for r in per_row} == {0, 1, 2}


def test_cms_deterministic_across_builds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = sorted(
        K.cms_heavy_hitters(ev, "user_id", threshold_frac=0.008).collect()
    )
    b = sorted(
        K.cms_heavy_hitters(ev, "user_id", threshold_frac=0.008).collect()
    )
    assert a == b


def test_cms_weighted_preagg_build_is_bit_identical(spark, sf_dir):
    """CMS(exact per-key counts as weights) == CMS(stream), collisions
    included, by linearity of the bucket sums — the pre_agg=True fast
    path (A/B'd zero-marginal on the sf0.5 denominators) must never be
    allowed to drift from the stream build it claims to equal."""
    ev = load_table(spark, sf_dir, "events")
    stream = sorted(
        K.cms_heavy_hitters(ev, "user_id", threshold_frac=0.008).collect()
    )
    weighted = sorted(
        K.cms_heavy_hitters(
            ev, "user_id", threshold_frac=0.008, pre_agg=True
        ).collect()
    )
    assert stream == weighted
    # and at a lower threshold (more rows, more collision exposure)
    stream2 = sorted(
        K.cms_heavy_hitters(ev, "user_id", threshold_frac=0.0001).collect()
    )
    weighted2 = sorted(
        K.cms_heavy_hitters(
            ev, "user_id", threshold_frac=0.0001, pre_agg=True
        ).collect()
    )
    assert stream2 == weighted2


def test_hll_estimate_close_to_exact_and_deterministic(spark, sf_dir):
    # raw estimates (the catalog query now emits the bound WITNESS; the
    # underlying sketch accuracy is asserted here on the raw aggregate)
    from pyspark.sql import functions as F

    from data_engineering_project_spark.plans.catalog import queries

    def raw():
        ev = load_table(spark, sf_dir, "events")
        return [
            tuple(r)
            for r in ev.groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(12))
                ).alias("est"),
                F.countDistinct("user_id").alias("exact"),
            )
            .collect()
        ]

    a, b = raw(), raw()
    assert a == b  # fixed lgK + deterministic hashing ⇒ stable estimates
    assert a
    for _etype, est, exact in a:
        assert abs(est - exact) / exact <= 0.05  # lgK=12 ⇒ ~1.6% rse

    # and the catalog query's witness columns agree
    wit = queries()["events_hll_distinct_users"](spark, sf_dir).collect()
    assert wit and all(r.sketch_within_5pct for r in wit)


def test_hll_daily_union_within_bound_of_exact(spark, sf_dir):
    # mergeability: folding 30 per-day sketches answers within the error
    # bound of the exact distinct count without re-scanning raw data — the
    # property that lets a warehouse persist per-partition sketches and
    # roll up arbitrary ranges. NOTE the old equality form (daily-union
    # estimate == one-pass estimate) is NOT a DataSketches HLL property:
    # a stream-built sketch answers via the HIP estimator while a union
    # result falls back to the composite estimator; they coincide only
    # while every sketch is still in coupon mode (true at tiny SF, false
    # at sf0.1 — found by the sf0.1 parity sweep).
    from pyspark.sql import functions as F

    from data_engineering_project_spark.plans.catalog import queries
    from data_engineering_project_spark.sources.tables import load_table

    row = queries()["events_hll_daily_rollup"](spark, sf_dir).collect()[0]
    assert row.direct_within_5pct
    assert row.union_within_5pct
    assert row.n_days > 1  # the rollup actually merged multiple sketches

    # independently recompute the union path against exact ground truth
    ev = load_table(spark, sf_dir, "events")
    daily_union = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u"))
        .collect()[0]["u"]
    )
    exact = ev.select("user_id").distinct().count()
    assert abs(daily_union - exact) / exact <= 0.05
    # determinism: the union path itself is repeatable bit-for-bit
    again = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u"))
        .collect()[0]["u"]
    )
    assert daily_union == again


def test_misra_gries_bounds_hold_under_forced_decrements(spark):
    """Skewed stream through a deliberately tiny summary (capacity 4,
    ~40 distinct keys): decrements MUST fire, and the merged
    est_lower <= true <= est_upper guarantee must survive the merge."""
    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators.sketch import space_saving_topk

    # key 0: 4000 rows; keys 1..40: ~100 rows each, across 8 partitions
    df = (
        spark.range(8000, numPartitions=8)
        .select(
            F.when(F.col("id") < 4000, F.lit(0))
            .otherwise(F.col("id") % 40 + 1)
            .alias("k")
        )
    )
    top = space_saving_topk(df, "k", k=5, capacity=4)
    rows = top.collect()
    true = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert rows[0]["k"] == 0  # the hot key always survives
    assert rows[0]["est_upper"] > rows[0]["est_lower"]  # decrements fired
    for r in rows:
        assert r["est_lower"] <= true[r["k"]] <= r["est_upper"]


def test_misra_gries_exact_when_capacity_fits(spark):
    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators.sketch import space_saving_topk

    df = spark.range(1000, numPartitions=4).select((F.col("id") % 7).alias("k"))
    rows = space_saving_topk(df, "k", k=7, capacity=64).collect()
    true = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        assert r["est_lower"] == r["est_upper"] == true[r["k"]]  # dec == 0 → exact
