"""Interval-overlap join: pairs of time intervals that overlap, at scale.

The naive formulation is a theta join (``a.start < b.end AND b.start <
a.end``) which Spark can only execute as a nested-loop/cartesian product —
quadratic, and a non-starter at 100 TB. The scalable shape bins each
interval onto a coarse time grid, equi-joins on ``(key, bin)``, then
re-checks the exact overlap predicate and dedups candidate pairs:

- candidate generation touches only pairs sharing a grid cell, so cost is
  bounded by per-cell density instead of |L|×|R|;
- the equi-join shuffles on a proper hash key, gets AQE skew handling,
  and broadcast when one side is small — all the machinery a theta join
  forfeits;
- an interval spanning k bins appears k times, so the pair list is
  ``distinct``-ed on the pair identity before any aggregation.

Bin width trades duplication (wide bins → few duplicates) against cell
density (narrow bins → fewer false candidates); set it near the typical
interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binned(df: DataFrame, key: str, start: str, end: str, bin_width: str) -> DataFrame:
    bins = F.sequence(
        F.date_trunc("hour", F.col(start)),
        F.date_trunc("hour", F.col(end)),
        F.expr(f"interval {bin_width}"),
    )
    return df.withColumn("_bin", F.explode(bins))


def overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_id: str,
    right_id: str,
    bin_width: str = "1 hour",
) -> DataFrame:
    """All (left, right) interval pairs with the same ``key`` whose
    half-open intervals strictly overlap.

    Inputs carry columns ``(key, <id>, start, end)``. Output:
    ``(key, left_id, right_id, overlap_us)`` — one row per overlapping
    pair, ``overlap_us`` the overlap length in microseconds (exact
    integer arithmetic, no float drift).

    Note: ``bin_width`` must divide evenly into the 1-hour truncation
    grid (e.g. '1 hour', '30 minutes'); both sides are truncated to the
    hour before binning so grid cells align across sides.
    """
    lb = _binned(left, key, "start", "end", bin_width).select(
        F.col(key), F.col(left_id), F.col("_bin"),
        F.col("start").alias("_ls"), F.col("end").alias("_le"),
    )
    rb = _binned(right, key, "start", "end", bin_width).select(
        F.col(key), F.col(right_id), F.col("_bin"),
        F.col("start").alias("_rs"), F.col("end").alias("_re"),
    )
    joined = lb.join(rb, [key, "_bin"]).filter(
        (F.col("_ls") < F.col("_re")) & (F.col("_rs") < F.col("_le"))
    )
    # unix_micros requires TIMESTAMP_LTZ; inputs may be NTZ (nanos-normalized
    # parquet reads). The session tz is pinned to UTC, so the cast is exact.
    overlap = F.unix_micros(
        F.least(F.col("_le"), F.col("_re")).cast("timestamp")
    ) - F.unix_micros(F.greatest(F.col("_ls"), F.col("_rs")).cast("timestamp"))
    # a pair sharing k bins appears k times; overlap_us is a pure function
    # of the pair, so distinct on the projected row is pair-identity dedup
    return joined.select(
        F.col(key), F.col(left_id), F.col(right_id), overlap.alias("overlap_us")
    ).distinct()
