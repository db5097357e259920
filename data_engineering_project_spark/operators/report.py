"""The reference's core query surface as composable DataFrame operators.

Pipeline (reference ``src/Task1/data_processing.py``):
  filter on a (possibly nested) column == literal   (:139-141)
  → count events per (date, hour, type)             (:268-288)
  → densify to all 24 hours via a generated spine   (:306-338)
  → zero-fill missing buckets                       (:338)
  → fixed column order + sort                       (:359-362)

Differences from the reference, on purpose:
- ONE plan across all dates (no per-date driver loop): the spine is
  (distinct dates) × (0..23), so a single job densifies every date.
- No eager count/collect logging (the reference re-executes lineage ≥8 times
  per date, ``:134-136,144,252,268-291``). Use ``df.observe`` for metrics.
- Both densification-join sides are tiny post-agg (dates × 24 rows); the
  counts side is explicitly broadcast (build-right — the only supported
  build side for a left-outer broadcast join) so the join never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_equals(df: DataFrame, column: str, value) -> DataFrame:
    """Equality filter on a column path; nested paths (``a.b.c``) work and the
    predicate is pushed into the parquet scan by Catalyst
    (reference ``src/Task1/data_processing.py:139-141``)."""
    return df.filter(F.col(column) == F.lit(value))


def hourly_type_counts(
    df: DataFrame,
    *,
    date_col: Column | str,
    hour_col: Column | str,
    type_col: Column | str,
    types: Sequence[str],
) -> DataFrame:
    """Count events per (date, hour), one ``<type>_count`` column per type.

    One hash aggregate with count-if columns (map-side partial agg is
    automatic) — the reference computes each type in a separate job and joins
    (``src/Task1/data_processing.py:273-288, 318-333``); a single conditional
    aggregate is one shuffle instead of two jobs + a join.
    """
    date_col = F.col(date_col) if isinstance(date_col, str) else date_col
    hour_col = F.col(hour_col) if isinstance(hour_col, str) else hour_col
    type_col = F.col(type_col) if isinstance(type_col, str) else type_col

    aggs = [
        F.count(F.when(type_col == t, F.lit(1))).alias(f"{t}_count") for t in types
    ]
    return df.groupBy(date_col.alias("date"), hour_col.alias("hour")).agg(*aggs)


def hour_spine(df_dates: DataFrame, date_col: str = "date") -> DataFrame:
    """(distinct dates) × (hours 0..23) dimension — the densification spine
    (reference builds a bare ``spark.range(0,24)`` per date,
    ``src/Task1/data_processing.py:306-308``; here one spine covers all dates).
    """
    dates = df_dates.select(F.col(date_col).alias("date")).distinct()
    hours = F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour")
    return dates.select("date", hours)


def densify_hours(
    counts: DataFrame,
    *,
    fill_cols: Sequence[str],
    date_col: str = "date",
    hour_col: str = "hour",
    spine: DataFrame | None = None,
) -> DataFrame:
    """LEFT JOIN a dense (date × 24h) spine against sparse hourly counts and
    zero-fill — guarantees exactly 24 rows per date even for all-zero dates
    (reference ``src/Task1/data_processing.py:318-338``).

    The counts side post-aggregation is small relative to the raw events
    (≤ 24 rows/date), and the spine is exactly dates×24, so this join is
    broadcast-able at any raw-data scale. The hint goes on the COUNTS side:
    Spark only supports build-right for a left-outer BroadcastHashJoin, so a
    hint on the spine (the left side) is silently dropped and the join would
    shuffle both (small) sides instead.
    """
    if spine is None:
        spine = hour_spine(counts.select(F.col(date_col).alias("date")))
    joined = spine.join(
        F.broadcast(counts),
        on=[spine["date"] == counts[date_col], spine["hour"] == counts[hour_col]],
        how="left",
    )
    out = joined.select(spine["date"], spine["hour"], *fill_cols)
    return out.na.fill(0, list(fill_cols))


def combine_hourly_reports(
    df: DataFrame,
    *,
    date_col: Column | str,
    hour_col: Column | str,
    type_col: Column | str,
    types: Sequence[str],
    sort: bool = False,
) -> DataFrame:
    """Full report: counts → densify → zero-fill → ordered columns.

    Output schema mirrors the reference's daily report
    (``date, hour, <type>_count...``; exactly 24 rows per observed date,
    golden example ``output/task1_output_2022-05-26.csv``).

    ``sort`` is OFF by default: a global orderBy adds a range-partition
    exchange + sort stage that neither consumer needs — the CSV sink orders
    rows per date-partition itself (``sinks/csv_sink.py:36``), and
    relational consumers treat row order as meaningless. Pass ``sort=True``
    only when handing the frame directly to something order-sensitive.
    """
    counts = hourly_type_counts(
        df, date_col=date_col, hour_col=hour_col, type_col=type_col, types=types
    )
    fill = [f"{t}_count" for t in types]
    # Densify WITHOUT a spine join: fold each date's ≤24 sparse rows into an
    # hour→counts map (one tiny post-agg shuffle on date), explode the full
    # 0..23 sequence, and zero-fill lookup misses. The round-2 design joined
    # a spine derived from `counts` back against `counts`, which needed a
    # persist barrier (Catalyst otherwise collapses distinct-over-agg into a
    # SECOND full scan of the raw events) — and that cache leaked across
    # catalog sweeps. This shape is single-scan by construction: no cache to
    # leak, no join, and the per-date map is bounded at 24 entries.
    per_date = counts.groupBy("date").agg(
        F.map_from_entries(
            F.collect_list(F.struct("hour", F.struct(*fill)))
        ).alias("_by_hour")
    )
    exploded = per_date.select(
        "date",
        F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour"),
        "_by_hour",
    )
    out = exploded.select(
        "date",
        "hour",
        *[
            F.coalesce(F.col("_by_hour")[F.col("hour")][c], F.lit(0)).alias(c)
            for c in fill
        ],
    )
    return out.orderBy("date", "hour") if sort else out
