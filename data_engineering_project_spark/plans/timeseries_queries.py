"""Time-series rollup queries: dense gapfilled grids with interpolation.

The hypertable/time_bucket_gapfill operator family over `events`, backed by
`operators/timeseries.py`. Everything is oracle-checked; float aggregates
follow the repo invariant (snap to integer units pre-sum, one exact division
at the end) so partial-aggregation order can never flip a bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import intervals
from data_engineering_project_spark.operators import timeseries as TS
from data_engineering_project_spark.functions.scalars import decimal_units
from data_engineering_project_spark.plans.catalog import register
from data_engineering_project_spark.sources.tables import load_table

#: integer-unit scale for `value` sums (4 decimal places)
UNIT = 10_000


@register(
    "events_hourly_gapfill_locf",
    sql=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM events) t,
             bounds,
             LATERAL (SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                                    INTERVAL 1 HOUR)) AS h) g
    ),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*) AS n,
               sum(CAST(round(value * {UNIT}) AS BIGINT)) AS units
        FROM events GROUP BY event_type, h
    ),
    joined AS (
        SELECT s.event_type, s.h,
               coalesce(hourly.n, 0) AS n_events,
               -- half-away-from-zero to 4dp from the EXACT integer pair
               -- (units, n): round(units/(n*UNIT), 4) on the raw double
               -- flips on .00005 boundaries between engines (sf0.1 found
               -- three such hours)
               CASE WHEN hourly.n IS NOT NULL THEN round(
                   (CASE WHEN hourly.units < 0
                         THEN -((-2 * CAST(hourly.units AS HUGEINT)
                                 + hourly.n) // (2 * hourly.n))
                         ELSE ((2 * CAST(hourly.units AS HUGEINT)
                                + hourly.n) // (2 * hourly.n)) END)
                   / {UNIT}.0, 4)
               END AS hour_avg
        FROM spine s
        LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
    )
    SELECT event_type,
           h AS bucket_ts,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_events = 0 AS INTEGER) AS is_gap,
           last_value(hour_avg IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_avg
    FROM joined
    """,
    doc="time_bucket_gapfill + locf: per event type, a DENSE hourly grid "
    "over the global [min, max] hour range; silent hours appear with "
    "n_events=0, is_gap=1, and the hourly mean value carried forward from "
    "the last observed hour (NULL before the first observation). "
    "Generalizes the reference's 24-row dense report "
    "(src/Task1/data_processing.py:306-338) to arbitrary ranges and an "
    "interpolation rule. The spine and LOCF window run on the "
    "post-aggregation frame (types × hours), never the raw events; the "
    "mean is integer-units summed then divided once, so Spark's partial-agg "
    "order cannot flip a bit vs the oracle.",
    tags=("timeseries", "gapfill", "window"),
)
def events_hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        TS.time_bucket(F.col("ts")).alias("h"),
        F.round(F.col("value") * UNIT).cast("bigint").alias("units"),
    )
    hourly = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"), F.sum("units").alias("units")
    )
    # hourly feeds three consumers (spine bounds, spine keys, the join);
    # persist the ≤(types×hours)-row aggregate or Catalyst re-runs the raw
    # scan+groupBy for each — 3× full-data cost at 100 TB
    hourly = hourly.persist()
    spine = TS.bucket_spine(hourly, ["event_type"], "h")
    joined = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        # half-away-from-zero to 4dp from the exact integer (units, n)
        # pair — the double-boundary-immune twin of the oracle's CASE
        F.when(
            F.col("n").isNotNull(),
            F.round(
                F.when(
                    F.col("units") < 0,
                    -F.call_function(
                        "div",
                        -2 * F.col("units") + F.col("n"),
                        2 * F.col("n"),
                    ),
                ).otherwise(
                    F.call_function(
                        "div",
                        2 * F.col("units") + F.col("n"),
                        2 * F.col("n"),
                    )
                )
                / UNIT,
                4,
            ),
        ).alias("hour_avg"),
    )
    return joined.select(
        "event_type",
        F.col("h").alias("bucket_ts"),
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("n_events") == 0).cast("int").alias("is_gap"),
        TS.locf("hour_avg", ["event_type"], "h").alias("filled_avg"),
    )


@register(
    "events_ohlc_daily",
    sql="""
    WITH ranked AS (
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               value,
               row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           MIN(value) AS low_value,
           MAX(value) AS high_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ranked GROUP BY event_type, day
    """,
    doc="OHLC downsampling (open/high/low/close per event_type per day) — "
    "the classic tick-data rollup. Open/close are picked by struct-ordered "
    "MIN/MAX over (ts, event_id, value): (ts, event_id) is a unique total "
    "order, so the pick is deterministic WITHOUT a window sort — one "
    "map-side-combinable aggregation instead of the row_number approach "
    "the oracle restates (which needs a full partition sort). At 100 TB "
    "the agg form wins: partial min/max merge in the combiner, no skew "
    "sensitivity beyond the group key.",
    tags=("timeseries", "agg"),
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # timeline ops exclude timestamp-less rows
    )
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    pick = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        e.select(F.col("event_type"), day.alias("day"), F.col("value"), pick.alias("pick"))
        .groupBy("event_type", "day")
        .agg(
            F.min("pick")["value"].alias("open_value"),
            F.max("pick")["value"].alias("close_value"),
            F.min("value").alias("low_value"),
            F.max("value").alias("high_value"),
            F.count("*").alias("n_events"),
        )
    )


def _typed_intervals(
    spark: SparkSession, sf_dir: str, event_type: str, hours: int
) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select(
            "user_id",
            F.col("event_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr(f"interval {hours} hour")).alias("end"),
        )
    )


@register(
    "events_interval_overlap",
    sql="""
    WITH p AS (
        SELECT user_id, event_id AS purchase_id,
               ts AS ps, ts + INTERVAL 2 HOUR AS pe
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, event_id AS click_id,
               ts AS cs, ts + INTERVAL 1 HOUR AS ce
        FROM events WHERE event_type = 'click'
    ),
    pairs AS (
        SELECT p.user_id, purchase_id, click_id,
               epoch_us(least(pe, ce)) - epoch_us(greatest(ps, cs)) AS ov
        FROM p JOIN c
          ON p.user_id = c.user_id AND ps < ce AND cs < pe
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ov) AS BIGINT) AS overlap_us
    FROM pairs GROUP BY user_id
    """,
    doc="Interval-overlap join: per user, 2-hour purchase windows vs 1-hour "
    "click windows, counting strictly-overlapping pairs and total overlap "
    "(exact integer microseconds). The oracle states the textbook theta "
    "join; the Spark plan (operators/intervals.py) bins both interval sets "
    "onto an hourly grid and EQUI-joins on (user_id, bin) — candidate cost "
    "bounded by per-cell density, proper hash shuffle with AQE/broadcast "
    "support, exact predicate re-checked and pair-duplicates distinct-ed. "
    "A theta join would be a cartesian product at 100 TB; "
    "tests/test_plan_quality.py asserts no nested-loop node survives.",
    tags=("timeseries", "interval", "join"),
)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _typed_intervals(spark, sf_dir, "purchase", 2)
    c = _typed_intervals(spark, sf_dir, "click", 1)
    pairs = intervals.overlap_pairs(
        p.withColumnRenamed("event_id", "purchase_id"),
        c.withColumnRenamed("event_id", "click_id"),
        "user_id",
        left_id="purchase_id",
        right_id="click_id",
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("overlap_us").cast("bigint").alias("overlap_us"),
    )


@register(
    "events_daily_anomalies",
    sql="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(ROUND(sum(ROUND(value * 100, 0)) / count(*), 0) AS BIGINT)
                   AS mu
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, day, mu,
               count(*) OVER win AS n7,
               sum(mu) OVER win AS s7,
               sum(mu * mu) OVER win AS ss7
        FROM daily
        WINDOW win AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           ROUND(mu / 100.0, 2) AS day_mean,
           ROUND(CAST(mu * n7 - s7 AS DOUBLE) / n7
                 / sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE) / (n7 * (n7 - 1))),
                 4) AS z
    FROM w
    WHERE n7 >= 4 AND n7 * ss7 - s7 * s7 > 0
      AND abs(CAST(mu * n7 - s7 AS DOUBLE) / n7
              / sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE) / (n7 * (n7 - 1))))
          > 1.5
    """,
    doc="Trailing-window anomaly detection: per (event_type, day), flag "
    "days whose mean value deviates > 1.5σ from the PRECEDING 7 days "
    "(frame excludes the current row — the classic leakage mistake is "
    "including it, which shrinks z for the very anomaly being tested). "
    "Determinism design: the day mean is snapped to integer centi-units "
    "and the window carries only integer sufficient statistics "
    "(n, Σμ, Σμ²) — exact under ANY accumulation order (Spark sliding "
    "frames vs DuckDB segment trees associate differently; float sums "
    "would drift), so mean/variance/z re-derive closed-form from exact "
    "integers and hash-match bit-for-bit. One shuffle (daily agg reused "
    "by the window partition).",
    tags=("timeseries", "anomaly", "window"),
)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # timeline ops exclude timestamp-less rows
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.round(
            F.sum(decimal_units(F.col("value"), 100)) / F.count("*"), 0
        )
        .cast("bigint")
        .alias("mu")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "mu",
        F.count("*").over(win).alias("n7"),
        F.sum("mu").over(win).alias("s7"),
        F.sum(F.col("mu") * F.col("mu")).over(win).alias("ss7"),
    )
    z = (
        (F.col("mu") * F.col("n7") - F.col("s7")).cast("double")
        / F.col("n7")
        / F.sqrt(
            (F.col("n7") * F.col("ss7") - F.col("s7") * F.col("s7")).cast(
                "double"
            )
            / (F.col("n7") * (F.col("n7") - 1))
        )
    )
    return (
        w.filter(
            (F.col("n7") >= 4)
            & (F.col("n7") * F.col("ss7") - F.col("s7") * F.col("s7") > 0)
            & (F.abs(z) > 1.5)
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("mu") / 100.0, 2).alias("day_mean"),
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "events_seasonal_decompose",
    sql=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CAST(floor(value * {UNIT} + 0.5) AS BIGINT)) AS BIGINT)
                   AS units
        FROM events WHERE ts IS NOT NULL GROUP BY d
    ),
    trended AS (
        SELECT d, units,
               sum(units) OVER w AS s7,
               count(*) OVER w AS n7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detrended AS (
        SELECT CAST((date_diff('day', DATE '1970-01-01', d) + 4) % 7
                    AS INTEGER) AS dow,
               units * 7 - s7 AS det7
        FROM trended WHERE n7 = 7
    )
    SELECT dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(floor(sum(det7) * 100.0 / (7.0 * count(*) * {UNIT}) + 0.5)
                AS BIGINT) AS seasonal_c
    FROM detrended GROUP BY dow
    """,
    doc="Weekly seasonal decomposition (STL-lite): daily totals -> 7-day "
    "centered moving-average trend -> day-of-week mean of the detrended "
    "residual, the additive seasonal index in integer cents. All "
    "arithmetic is exact-integer until one final division: daily sums "
    "snap to 1/10000 units (LONG), the detrended term is units*7 - "
    "sum7(units) (no fractional trend), and the per-dow mean divides "
    "once at the end — so partial-agg merge order can never flip a bit, "
    "and the portable floor(x+0.5) rounds identically on every engine. "
    "The trend window runs on the POST-AGGREGATION daily series (365 "
    "rows/year), so the unpartitioned ORDER BY is a bounded-size frame, "
    "not a scale risk; day-of-week is epoch-day arithmetic ((days+4)%7, "
    "Sunday=0), immune to engine dow-numbering and locale.",
    tags=("timeseries", "window", "seasonal"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # timeline ops exclude timestamp-less rows
    )
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(decimal_units(F.col("value"), UNIT)).alias("units")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "units",
        F.sum("units").over(w).alias("s7"),
        F.count("*").over(w).alias("n7"),
    )
    det = trended.filter(F.col("n7") == 7).select(
        ((F.datediff("d", F.lit("1970-01-01")) + 4) % 7)
        .cast("int")
        .alias("dow"),
        (F.col("units") * 7 - F.col("s7")).alias("det7"),
    )
    return det.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.floor(
            F.sum("det7") * 100.0 / (7.0 * F.count("*") * UNIT) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("seasonal_c"),
    )


@register(
    "events_window_dedup",
    sql="""
    WITH keyed AS (
        SELECT event_type, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 300 AS bucket,
               ts, event_id
        FROM events
    ),
    ranked AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id, event_type, bucket
                                  ORDER BY ts, event_id) AS rn
        FROM keyed
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_removed
    FROM ranked GROUP BY event_type
    """,
    doc="Tumbling-window telemetry dedup: keep the earliest event per "
    "(user, type, 5-min bucket), report kept/removed per type — the "
    "batch contract of at-least-once ingestion cleanup (streaming twin: "
    "deduped_event_stream's dropDuplicates-within-watermark). The bucket "
    "is integer epoch-seconds division, so assignment is engine-portable "
    "and stateless; the ranking window shares one hash partitioning on "
    "the dedup key — no global sort, state bounded by the window length.",
    tags=("timeseries", "dedup", "window"),
)
def events_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        "user_id",
        F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("bucket"),
        "ts",
        "event_id",
    )
    ranked = keyed.select(
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy("user_id", "event_type", "bucket").orderBy(
                "ts", "event_id"
            )
        )
        .alias("rn"),
    )
    return ranked.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.count(F.when(F.col("rn") == 1, 1)).cast("bigint").alias("n_kept"),
        F.count(F.when(F.col("rn") > 1, 1)).cast("bigint").alias("n_removed"),
    )


@register(
    "events_sliding_2h_windows",
    sql=f"""
    WITH assigned AS (
        SELECT u.off AS off,
               date_trunc('hour', ts) - to_hours(u.off) AS window_start,
               event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS units
        FROM events, (SELECT unnest(generate_series(0, 1)) AS off) u
        WHERE ts IS NOT NULL
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(units) / 100.0, 2) AS total_value
    FROM assigned GROUP BY window_start, event_type
    """,
    doc="Sliding event-time windows (size 2 h, slide 1 h) via "
    "F.window(ts, '2 hours', '1 hour') — the overlapping-window analog of "
    "`events_hourly_tumbling` (each event lands in exactly size/slide = 2 "
    "windows; Spark expands the assignment map-side, no self-join). The "
    "oracle restates the expansion explicitly: every event contributes to "
    "the windows starting at floor_hour(ts) and floor_hour(ts)−1 h. Value "
    "sums snap to integer cents before aggregation (determinism "
    "invariant). Shuffle: one hash partitioning on (window, type) — "
    "identical cost shape to the tumbling query, ×2 rows from the "
    "overlap, which is the honest price of sliding windows at any scale.",
    tags=("timeseries", "window", "streaming-analog"),
)
def events_sliding_2h_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(decimal_units(F.col("value"), 100)) / 100.0, 2
            ).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


#: truncated-EWM geometry: trailing 10 calendar days, weight 2^(9-lag) —
#: power-of-two weights keep every product exact in integer arithmetic.
_EWM_LAGS = 10


@register(
    "events_ewm_daily",
    sql=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS units
        FROM events GROUP BY 1
    ),
    lags AS (
        SELECT unnest(generate_series(0, {_EWM_LAGS - 1})) AS lag
    ),
    pairs AS (
        SELECT a.day,
               s.units * (1 << ({_EWM_LAGS - 1} - l.lag)) AS wunits,
               (1 << ({_EWM_LAGS - 1} - l.lag)) AS w
        FROM daily a
        JOIN lags l ON TRUE
        JOIN daily s ON s.day = a.day - CAST(l.lag AS INTEGER)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_days_present,
           ROUND(sum(wunits) * 1.0 / sum(w) / 100.0, 4) AS ewm_value
    FROM pairs GROUP BY day
    """,
    doc="Exponentially-weighted trailing mean of the daily total value, "
    "truncated to the last 10 calendar days with power-of-two weights "
    "2^(9−lag) — the smoothing primitive behind drift dashboards, made "
    "bit-reproducible: integer cent-units times integer weights summed as "
    "integers, one float division at the end. (The textbook recursive EWMA "
    "is order-DEPENDENT float accumulation — unreproducible across "
    "partitionings and engines; truncation at 10 lags bounds the weight "
    "error at 2^-10 while making the computation a pure calendar "
    "self-join.) Calendar pairing (day − lag), not positional LAG, so "
    "missing days renormalize instead of silently shifting. Everything "
    "after the one raw-data shuffle runs on the ~|days|-row aggregate "
    "with broadcast joins — same scaffold as `events_daily_acf`.",
    tags=("timeseries", "stats", "window"),
)
def events_ewm_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(decimal_units(F.col("value"), 100)).alias("units")
    )
    # both pair sides read the same ~|days|-row aggregate; persist it or
    # Catalyst re-runs the raw scan+groupBy for each side (ACF precedent)
    daily = daily.persist()
    lags = spark.range(_EWM_LAGS).select(
        F.col("id").cast("int").alias("lag"),
        # shiftleft's python wrapper takes a literal bit count; the SQL
        # function form accepts the per-row expression
        F.expr(
            f"CAST(shiftleft(1, {_EWM_LAGS - 1} - CAST(id AS INT)) AS BIGINT)"
        ).alias("w"),
    )
    a = daily.select(F.col("day").alias("day_t"))
    s = daily.select(F.col("day").alias("day_s"), "units")
    pairs = a.crossJoin(F.broadcast(lags)).join(
        F.broadcast(s),
        F.col("day_s") == F.date_sub(F.col("day_t"), F.col("lag")),
    )
    return (
        pairs.groupBy("day_t")
        .agg(
            F.count("*").cast("bigint").alias("n_days_present"),
            F.round(
                F.sum(F.col("units") * F.col("w"))
                / F.sum("w")
                / 100.0,
                4,
            ).alias("ewm_value"),
        )
        .select(
            F.date_format("day_t", "yyyy-MM-dd").alias("day"),
            "n_days_present",
            "ewm_value",
        )
    )


@register(
    "events_seasonal_naive_backtest",
    sql="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS units
        FROM events GROUP BY 1, 2
    ),
    paired AS (
        SELECT a.event_type,
               abs(a.units - b.units) AS abs_err,
               a.units AS actual
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.day = a.day - 7
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_forecasts,
           ROUND(sum(abs_err) / 100.0 / count(*), 4) AS mae,
           ROUND(sum(abs_err) * 1.0 / sum(actual), 6) AS wape
    FROM paired GROUP BY event_type ORDER BY event_type
    """,
    doc="Seasonal-naive forecast backtest: predict each day's per-type "
    "total with the value from 7 days earlier, report MAE and WAPE — the "
    "baseline every forecasting pipeline must beat, and the backtesting "
    "harness shape (join actuals to lagged actuals on the CALENDAR, so "
    "missing days produce no phantom pairs). All errors are exact integer "
    "cent sums; the two ratios are single defensive ROUNDs. Everything "
    "after the one raw-data shuffle runs on the ~|type×days| aggregate.",
    tags=("timeseries", "forecast", "evaluation"),
)
def events_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(decimal_units(F.col("value"), 100)).alias("units"))
    daily = daily.persist()
    a = daily.select(
        "event_type", F.col("day").alias("day_a"), F.col("units").alias("actual")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_b"),
        F.col("units").alias("lagged"),
    )
    paired = a.join(
        b,
        (F.col("et_b") == F.col("event_type"))
        & (F.col("day_b") == F.date_sub(F.col("day_a"), 7)),
    )
    return (
        paired.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_forecasts"),
            F.round(
                F.sum(F.abs(F.col("actual") - F.col("lagged")))
                / 100.0
                / F.count("*"),
                4,
            ).alias("mae"),
            F.round(
                F.sum(F.abs(F.col("actual") - F.col("lagged")))
                * 1.0
                / F.sum("actual"),
                6,
            ).alias("wape"),
        )
        .orderBy("event_type")
    )
