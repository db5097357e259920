"""Two-pass distributed prefix sums — the cluster-scale upgrade path the
grouped-frequency statistics document (KS, Mann-Whitney, weighted median,
the concurrency sweep) instead of a single-reducer ordered window.

A plain ``Window.orderBy(k)`` running sum coalesces every row through ONE
task — fine for the saturating cell tables those queries reduce to, fatal
if the ordered table itself scales with the data. The standard fix is the
textbook parallel scan, expressed here in three declarative steps:

1. bucket each row by an order-preserving split of the key — either the
   deterministic value-range split (:func:`range_bucket`) or quantile-sketch
   sampled splits (:func:`sampled_splits`, the production path for skewed
   key spaces: split points land where the DATA is, so hot regions get
   their own buckets);
2. one tiny aggregate computes per-bucket totals, and a window over the
   ≤ ``n_buckets``-row result turns them into exclusive bucket offsets
   (broadcast back — this is the only serial step, O(buckets) not O(rows));
3. a window PARTITIONED by bucket (parallel across buckets) computes the
   local running sum; local + offset = the global prefix sum.

NULL semantics match the single-reducer ``Window.orderBy`` baseline
exactly: NULL order keys sort first (Spark's ascending default) and are
routed to a dedicated leading bucket; a row's running sum is NULL iff no
non-null value precedes it (SQL sum-of-nothing), never silently dropped.

Equality with the single-reducer window is property-tested in
``tests/test_properties.py`` for arbitrary skewed inputs — ties, NULL
keys, NULL values, both split strategies (ties need a total order: pass
a unique ``tie_col``)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket id reserved for NULL order keys — sorts before every real bucket,
#: matching Window.orderBy's nulls-first ascending placement.
NULL_BUCKET = -1


def range_bucket(key: Column, lo: Column, hi: Column, n_buckets: int) -> Column:
    """Order-preserving bucket id 0..n_buckets-1 from an even value-range
    split of [lo, hi]. Value-range splits are deterministic (exact integer
    min/max, no sampling) but skew-prone — :func:`sampled_splits` is the
    production alternative for skewed key spaces; every downstream step is
    identical either way, which is why bucketing stays swappable. NULL
    keys map to :data:`NULL_BUCKET`; an all-NULL column (NULL lo/hi) puts
    every row there."""
    span = (hi - lo + 1).cast("double")
    b = F.floor((key - lo).cast("double") / span * n_buckets).cast("int")
    # hi itself lands exactly on n_buckets; clamp into the last bucket
    return F.when(
        key.isNull() | lo.isNull(), F.lit(NULL_BUCKET)
    ).otherwise(F.least(b, F.lit(n_buckets - 1)))


def sampled_splits(
    df: DataFrame,
    order_col: str,
    n_buckets: int,
    accuracy: int = 10_000,
    sample_cap: int = 8_192,
) -> list:
    """Split points for an order-preserving bucketing from the data's own
    distribution — the production path for skewed key spaces. Numeric keys
    use ``percentile_approx`` (a single-pass mergeable GK sketch over the
    FULL column); any other orderable type (strings, dates) uses the
    classic range-partitioner recipe: a deterministic hash-thinned sample
    capped at ``sample_cap`` rows, sorted driver-side, evenly-spaced
    picks. Returns ≤ ``n_buckets - 1`` driver-side values (an O(buckets)
    / O(sample_cap) collect, never O(rows)).

    Under heavy skew some splits coincide — a single hot key cannot be
    subdivided by ANY range partitioner — but every produced bucketing is
    order-preserving, so downstream correctness never depends on where
    the splits land (property-tested), only load balance does."""
    from pyspark.sql.types import NumericType

    if n_buckets < 2:
        return []
    vals = df.select(order_col).where(F.col(order_col).isNotNull())
    if isinstance(df.schema[order_col].dataType, NumericType):
        qs = [i / n_buckets for i in range(1, n_buckets)]
        row = vals.agg(
            F.percentile_approx(order_col, qs, accuracy).alias("s")
        ).first()
        return sorted(set(row["s"] or []))
    # generic path: hash-thin to ~1/64 of rows (pmod — xxhash64 is signed),
    # cap the collect; a tiny input falls back to taking rows directly.
    # WHICH rows the limit surfaces is irrelevant: splits only steer load
    # balance, never results.
    sample = [
        r[0]
        for r in vals.where(F.pmod(F.xxhash64(order_col), F.lit(64)) == 0)
        .limit(sample_cap)
        .collect()
    ]
    if len(sample) < n_buckets * 4:
        sample = [r[0] for r in vals.limit(sample_cap).collect()]
    if not sample:
        return []
    sample.sort()
    n = len(sample)
    return sorted({sample[(i * n) // n_buckets] for i in range(1, n_buckets)})


def splits_bucket(key: Column, splits: Sequence) -> Column:
    """Bucket id = number of split points ≤ key (monotone in key, hence
    order-preserving for any split values). NULL keys map to
    :data:`NULL_BUCKET`."""
    if not splits:
        return F.when(key.isNull(), F.lit(NULL_BUCKET)).otherwise(F.lit(0))
    b = None
    for s in splits:
        term = F.when(key >= F.lit(s), 1).otherwise(0)
        b = term if b is None else b + term
    return F.when(key.isNull(), F.lit(NULL_BUCKET)).otherwise(b.cast("int"))


def partitioned_cumsum(
    df: DataFrame,
    *,
    order_col: str,
    value_col: str,
    tie_col: str | None = None,
    partition_cols: Sequence[str] = (),
    n_buckets: int = 32,
    out_col: str = "cumsum",
    split_strategy: str = "range",
) -> DataFrame:
    """Running sum of ``value_col`` in ``order_col`` order — per
    ``partition_cols`` group if given, else global — without a
    single-reducer global window (two-pass parallel scan, see module doc).

    ``tie_col`` must make (order_col, tie_col) a total order within a
    group when ``order_col`` has duplicates — the same requirement any
    deterministic running sum has. ``split_strategy='range'`` needs an
    integer/date order key (arithmetic split, no sampling pass);
    ``'sampled'`` works for any orderable key and balances skewed key
    spaces via quantile-sketch splits (one extra O(buckets)-result pass).
    NULL order keys sort first, exactly like ``Window.orderBy``."""
    order_keys = [order_col] + ([tie_col] if tie_col else [])
    parts = list(partition_cols)

    if split_strategy == "sampled":
        splits = sampled_splits(df, order_col, n_buckets)
        bucketed = df.withColumn(
            "_bucket", splits_bucket(F.col(order_col), splits)
        )
    elif split_strategy == "range":
        bounds = df.agg(
            F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi")
        )
        bucketed = df.crossJoin(F.broadcast(bounds)).withColumn(
            "_bucket",
            range_bucket(
                F.col(order_col), F.col("_lo"), F.col("_hi"), n_buckets
            ),
        )
    else:
        raise ValueError(f"unknown split_strategy {split_strategy!r}")

    # pass 1: per-(group, bucket) totals -> exclusive offsets
    # (≤ groups × n_buckets rows; the only ordered-serial step is this tiny
    # per-group window). The offset stays NULL — not 0 — when no preceding
    # bucket holds a non-null value, so the final sum keeps SQL's
    # sum-of-nothing-is-NULL semantics.
    off_w = Window.partitionBy(*parts).orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy(*parts, "_bucket")
        .agg(F.sum(value_col).alias("_bsum"))
        .select(
            *parts,
            "_bucket",
            F.sum("_bsum").over(off_w).alias("_offset"),
        )
    )

    # pass 2: local running sums, parallel across (group, bucket)
    local = F.sum(value_col).over(
        Window.partitionBy(*parts, "_bucket")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL-SAFE offsets join: a NULL group key (or a NULL-order bucket)
    # is a legitimate partition — the name-list equi-join silently dropped
    # its rows, so the cumsum LOST whole NULL-key groups (null-fuzz)
    keys = [*parts, "_bucket"]
    off = offsets.select(
        *[F.col(c).alias(f"_o_{c}") for c in keys], "_offset"
    )
    cond = None
    for c in keys:
        e = bucketed[c].eqNullSafe(off[f"_o_{c}"])
        cond = e if cond is None else (cond & e)
    out = (
        bucketed.join(F.broadcast(off), cond)
        .drop(*[f"_o_{c}" for c in keys])
        .withColumn("_local", local)
        .withColumn(
            out_col,
            F.when(
                F.col("_local").isNull() & F.col("_offset").isNull(),
                F.lit(None),
            ).otherwise(
                F.coalesce(F.col("_local"), F.lit(0))
                + F.coalesce(F.col("_offset"), F.lit(0))
            ),
        )
        .drop("_bucket", "_bsum", "_offset", "_local")
    )
    if split_strategy == "range":
        out = out.drop("_lo", "_hi")
    return out
