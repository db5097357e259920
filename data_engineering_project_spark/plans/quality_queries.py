"""Data-quality queries: the validation rule engine over the hourly report.

Mirrors the reference's warehouse-load validation flow
(``src/Task2/warehouse.py:91-256``): the Task-1 report is checked for nulls,
negatives, and the clicks-vs-impressions invariant; offenders route to a
dead-letter output with a ``validation_error`` reason; with auto_correct the
clicks are clipped instead. All rules are column predicates — the oracle
restates them as SQL CASE expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark import quality as Q
from data_engineering_project_spark.functions.scalars import (
    half_up_ratio,
    sql_half_up_ratio,
)
from data_engineering_project_spark.operators.report import hourly_type_counts
from data_engineering_project_spark.plans.catalog import register
from data_engineering_project_spark.sources.tables import load_table

# the (date, hour, impression_count, click_count) report the reference loads
# into its warehouse — views play impressions (FIXTURES.md §C mapping)
_REPORT_SQL = """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
           CAST(hour(ts) AS INTEGER) AS hour,
           count(*) FILTER (event_type = 'view')  AS impression_count,
           count(*) FILTER (event_type = 'click') AS click_count
    FROM events WHERE event_type IN ('view', 'click')
    GROUP BY 1, 2
"""


def _report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = hourly_type_counts(
        ev.filter(F.col("event_type").isin("view", "click")),
        date_col=F.to_date("ts"),
        hour_col=F.hour("ts"),
        type_col=F.col("event_type"),
        types=("view", "click"),
    )
    return counts.select(
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        F.col("hour").cast("int").alias("hour"),
        F.col("view_count").alias("impression_count"),
        "click_count",
    )


def _rules() -> list[Q.Rule]:
    return [
        Q.null_rule(["date", "hour", "impression_count", "click_count"]),
        Q.negative_rule(["impression_count", "click_count"]),
        Q.clicks_exceed_impressions_rule(),
    ]


@register(
    "dq_invalid_routing",
    sql=f"""
    WITH report AS ({_REPORT_SQL})
    SELECT date, hour, impression_count, click_count,
           CASE
             WHEN date IS NULL OR hour IS NULL OR impression_count IS NULL
                  OR click_count IS NULL THEN 'Contains null values'
             WHEN impression_count < 0 OR click_count < 0
                  THEN 'Contains negative values'
             WHEN click_count > impression_count THEN 'Clicks exceed impressions'
           END AS validation_error,
           'events' AS source_file
    FROM report
    WHERE click_count > impression_count
       OR impression_count < 0 OR click_count < 0
       OR date IS NULL OR hour IS NULL OR impression_count IS NULL
       OR click_count IS NULL
    """,
    doc="Dead-letter routing: report rows violating V2/V3/V4 with their "
    "first-violated-rule reason and source provenance "
    "(reference warehouse.py:117-163, client_report_invalid DDL).",
    tags=("quality",),
)
def dq_invalid_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = _report(spark, sf_dir)
    res = Q.split_valid_invalid(report, _rules(), source_file="events")
    return res.invalid


@register(
    "dq_autocorrect_clip",
    sql=f"""
    WITH report AS ({_REPORT_SQL})
    SELECT date, hour, impression_count,
           least(click_count, impression_count) AS click_count
    FROM report
    WHERE click_count > impression_count
      -- the validity rules route NULL date/hour rows to invalid, so the
      -- auto-corrected VALID output excludes them (null-fuzz)
      AND date IS NOT NULL AND hour IS NOT NULL
    """,
    doc="Auto-correct mode: clicks clipped to impressions (only rows that "
    "needed clipping shown). The reference does this ONLY at the warehouse "
    "layer with auto_correct=True (warehouse.py:144-148) and deliberately "
    "not on the Spark path — the engine preserves that switch.",
    tags=("quality",),
)
def dq_autocorrect_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = _report(spark, sf_dir)
    needs_fix = report.filter(F.col("click_count") > F.col("impression_count"))
    res = Q.split_valid_invalid(needs_fix, _rules(), auto_correct=True)
    return res.valid


@register(
    "dq_count_relationship",
    sql=f"""
    WITH report AS ({_REPORT_SQL})
    SELECT CASE
             WHEN impression_count = 0 AND click_count > 0
                  THEN 'clicks_without_impressions'
             WHEN click_count > impression_count THEN 'clicks_exceed_impressions'
             WHEN impression_count > click_count THEN 'impressions_exceed_clicks'
             ELSE 'equal'
           END AS count_relationship,
           count(*) AS n_hours,
           CAST(sum(impression_count) AS BIGINT) AS total_impressions,
           CAST(sum(click_count) AS BIGINT) AS total_clicks
    FROM report GROUP BY count_relationship
    """,
    doc="The reference's 3-way count-relationship classifier "
    "(warehouse.py:179-256) aggregated into a profile.",
    tags=("quality", "agg"),
)
def dq_count_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = _report(spark, sf_dir)
    classified = Q.classify_count_relationship(report)
    return classified.groupBy("count_relationship").agg(
        F.count("*").alias("n_hours"),
        F.sum("impression_count").alias("total_impressions"),
        F.sum("click_count").alias("total_clicks"),
    )



@register(
    "lineitem_expectations",
    sql="""
    WITH j AS (
        SELECT l_quantity, l_discount, l_returnflag, l_shipdate, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    agg AS (
        SELECT count(*) AS n_rows,
               count(*) - count(l_quantity) AS q_nulls,
               min(l_quantity) AS q_min, max(l_quantity) AS q_max,
               min(l_discount) AS d_min, max(l_discount) AS d_max,
               sum(CASE WHEN l_shipdate >= o_orderdate THEN 1 ELSE 0 END)
                   AS ship_ok,
               count(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END)
                   AS bad_flag
        FROM j
    )
    SELECT e.expectation, e.passed, CAST(a.n_rows AS BIGINT) AS n_rows
    FROM agg a CROSS JOIN LATERAL (VALUES
        ('l_quantity_no_nulls', a.q_nulls = 0),
        ('l_quantity_in_range', a.q_min >= 1 AND a.q_max <= 50),
        ('l_discount_in_range', a.d_min >= 0 AND a.d_max <= 0.1),
        ('l_shipdate_after_orderdate_rate', a.ship_ok * 100 >= a.n_rows * 95),
        ('returnflag_domain', a.bad_flag = 0)
    ) AS e(expectation, passed)
    """,
    doc="Expectation suite (deequ/Great-Expectations style) over "
    "lineitem⋈orders: nullability, numeric ranges, cross-table temporal "
    "sanity (ship ≥ order date for ≥95% of rows — integer-scaled "
    "comparison, no float rate), and a categorical domain check. ONE scan "
    "+ one scalar aggregate evaluates every expectation; results pivot to "
    "(expectation, passed, n_rows) rows. The assertion layer on top of "
    "lineitem_column_profile's observability layer.",
    tags=("quality", "expectations", "aggregate"),
)
def lineitem_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_quantity", "l_discount", "l_returnflag", "l_shipdate", "o_orderdate"
    )
    agg = j.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("l_quantity")).alias("q_nulls"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
        F.min("l_discount").alias("d_min"),
        F.max("l_discount").alias("d_max"),
        F.sum(
            (F.col("l_shipdate") >= F.col("o_orderdate")).cast("long")
        ).alias("ship_ok"),
        F.count(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), F.lit(1))
        ).alias("bad_flag"),
    )
    checks = F.array(
        F.struct(
            F.lit("l_quantity_no_nulls").alias("expectation"),
            (F.col("q_nulls") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("l_quantity_in_range").alias("expectation"),
            ((F.col("q_min") >= 1) & (F.col("q_max") <= 50)).alias("passed"),
        ),
        F.struct(
            F.lit("l_discount_in_range").alias("expectation"),
            ((F.col("d_min") >= 0) & (F.col("d_max") <= 0.1)).alias("passed"),
        ),
        F.struct(
            F.lit("l_shipdate_after_orderdate_rate").alias("expectation"),
            (F.col("ship_ok") * 100 >= F.col("n_rows") * 95).alias("passed"),
        ),
        F.struct(
            F.lit("returnflag_domain").alias("expectation"),
            (F.col("bad_flag") == 0).alias("passed"),
        ),
    )
    return agg.select(
        F.explode(checks).alias("e"), F.col("n_rows")
    ).select("e.expectation", "e.passed", "n_rows")


@register(
    "events_benford_first_digit",
    sql=f"""
    WITH units AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS u
        FROM events WHERE value > 0
    ),
    digits AS (
        SELECT CAST(substr(CAST(u AS VARCHAR), 1, 1) AS INTEGER) AS d
        FROM units WHERE u > 0
    ),
    obs AS (
        SELECT d, count(*) AS n,
               sum(count(*)) OVER () AS total
        FROM digits GROUP BY d
    )
    SELECT d AS digit,
           CAST(n AS BIGINT) AS n_obs,
           {sql_half_up_ratio('n', 'total', 6)} AS obs_frac,
           ROUND(log10(1 + 1.0 / d), 6) AS benford_frac,
           CAST(floor(
               (CAST(n AS DOUBLE) / total - log10(1 + 1.0 / d))
               * (CAST(n AS DOUBLE) / total - log10(1 + 1.0 / d))
               / log10(1 + 1.0 / d) * total * 1000000 + 0.5
           ) AS BIGINT) AS chi2_term_micro
    FROM obs ORDER BY d
    """,
    doc="Benford's-law first-digit conformance of event values — the "
    "classic forged-or-synthetic-numbers screen (real multiplicative "
    "data leads with 1 ~30% of the time; fabricated or uniformly "
    "generated values don't). First digits come from the integer-cent "
    "string (no float log10 on the extraction path); observed fractions, "
    "the Benford expectation log10(1+1/d), and each digit's (O−E)²/E "
    "chi-square contribution (micro-quantized, summable by the caller) "
    "are deterministic doubles from exact integer counts. One "
    "map-side-combined shuffle over 9 digit groups.",
    tags=("quality", "stats", "profile"),
)
def events_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    units = ev.filter(F.col("value") > 0).select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("u")
    )
    digits = units.filter(F.col("u") > 0).select(
        F.substring(F.col("u").cast("string"), 1, 1).cast("int").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    obs = obs.withColumn("total", F.sum("n").over(Window.partitionBy()))
    frac = F.col("n").cast("double") / F.col("total")
    bf = F.log10(1 + 1.0 / F.col("d"))
    chi_term = F.floor(
        (frac - bf) * (frac - bf) / bf * F.col("total") * 1000000 + F.lit(0.5)
    ).cast("bigint")
    return obs.select(
        F.col("d").alias("digit"),
        F.col("n").cast("bigint").alias("n_obs"),
        half_up_ratio(F.col("n"), F.col("total"), 6).alias("obs_frac"),
        F.round(bf, 6).alias("benford_frac"),
        chi_term.alias("chi2_term_micro"),
    ).orderBy("digit")
