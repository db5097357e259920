"""Two-pass distributed prefix sums — the cluster-scale upgrade path the
grouped-frequency statistics document (KS, Mann-Whitney, weighted median,
the concurrency sweep) instead of a single-reducer ordered window.

A plain ``Window.orderBy(k)`` running sum coalesces every row through ONE
task — fine for the saturating cell tables those queries reduce to, fatal
if the ordered table itself scales with the data. The standard fix is the
textbook parallel scan, expressed here in three declarative steps:

1. bucket each row by an order-preserving range split of the key;
2. one tiny aggregate computes per-bucket totals, and a window over the
   ≤ ``n_buckets``-row result turns them into exclusive bucket offsets
   (broadcast back — this is the only serial step, O(buckets) not O(rows));
3. a window PARTITIONED by bucket (parallel across buckets) computes the
   local running sum; local + offset = the global prefix sum.

Equality with the single-reducer window is property-tested in
``tests/test_properties.py`` for arbitrary skewed inputs, ties included
(ties need a total order: pass a unique ``tie_col``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_bucket(key: Column, lo: Column, hi: Column, n_buckets: int) -> Column:
    """Order-preserving bucket id 0..n_buckets-1 from an even value-range
    split of [lo, hi]. Value-range splits are deterministic (exact integer
    min/max, no sampling) but skew-prone — a production range partitioner
    would sample split points instead; every downstream step is identical
    either way, which is why this stays a separate, swappable function."""
    span = (hi - lo + 1).cast("double")
    b = F.floor((key - lo).cast("double") / span * n_buckets).cast("int")
    # hi itself lands exactly on n_buckets; clamp into the last bucket
    return F.least(b, F.lit(n_buckets - 1))


def partitioned_cumsum(
    df: DataFrame,
    *,
    order_col: str,
    value_col: str,
    tie_col: str | None = None,
    n_buckets: int = 32,
    out_col: str = "cumsum",
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_col`` order without a
    single-reducer global window (two-pass parallel scan, see module doc).

    ``tie_col`` must make (order_col, tie_col) a total order when
    ``order_col`` has duplicates — the same requirement any deterministic
    running sum has. Integer/date order keys only (range split needs
    arithmetic); at 100 TB swap :func:`range_bucket` for sampled splits.
    """
    order_keys = [order_col] + ([tie_col] if tie_col else [])

    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    )
    bucketed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_bucket",
        range_bucket(F.col(order_col), F.col("lo"), F.col("hi"), n_buckets),
    )

    # pass 1: per-bucket totals -> exclusive offsets (<= n_buckets rows;
    # the only ordered-serial step is this tiny window)
    offsets = (
        bucketed.groupBy("_bucket")
        .agg(F.sum(value_col).alias("_bsum"))
        .select(
            "_bucket",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_offset"),
        )
    )

    # pass 2: local running sums, parallel across buckets
    local = F.sum(value_col).over(
        Window.partitionBy("_bucket")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, local + F.col("_offset"))
        .drop("_bucket", "_bsum", "_offset", "lo", "hi")
    )
