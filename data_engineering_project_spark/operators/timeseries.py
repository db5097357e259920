"""Time-series operators: hourly bucketing, gap-filling, LOCF interpolation.

The hypertable-rollup family (time_bucket_gapfill + locf in timescale-style
engines) re-expressed as DataFrame plans: aggregate to the bucket grain,
LEFT-JOIN a dense bucket spine, then carry the last observation forward with
an IGNORE NULLS window. Generalizes the reference's dense 24-hour report
grid (``src/Task1/data_processing.py:306-338``) from one day×24 to an
arbitrary [min, max] bucket range per series key.

Scale shape: the spine and the window both operate on the POST-aggregation
frame (#keys × #buckets), which is orders of magnitude smaller than the raw
events — the only full-data pass is the bucketing groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column, unit: str = "hour") -> Column:
    """Truncate a timestamp to its bucket start (`date_trunc` — JVM-side)."""
    return F.date_trunc(unit, ts)


def bucket_spine(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    *,
    step: str = "INTERVAL 1 HOUR",
    max_slots: int = 2_000_000,
) -> DataFrame:
    """(distinct keys) × (dense bucket range) — the gapfill spine.

    The bucket range is the GLOBAL [min, max] of ``bucket_col`` so every
    series shares one clock; ``F.sequence`` builds it without collecting
    bounds to the driver (stays one Catalyst plan).

    ``max_slots`` is the loud-refusal guard the hostile-time sweep
    mandated: the dense range is data-dependent, so ONE corrupt
    timestamp (year 1582, year 9999) silently turns the spine into tens
    of millions of slots materialized as a single ``F.sequence`` array —
    at sweep scale that OOM-killed the JVM, and on a production cluster
    it would take the executor down instead of surfacing the bad row.
    Ranges beyond ``max_slots`` (default 2M ≈ 228 years hourly; a strict
    bound — the end-inclusive ``sequence`` yields at most ``max_slots``
    slots) raise a clear error inside the plan (evaluated on the 1-row
    bounds frame, so the guard is free); quarantine the offending rows or
    widen the knob deliberately. Empty/all-NULL input yields an empty
    spine by construction (explicit NULL arm, not optimizer accident)."""
    bounds = df.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    # raise_error is NullType; keeping _hi in the when() branch preserves
    # the timestamp type (the half_up_div debug-guard pattern). The
    # explicit NULL arm matters: on empty/all-NULL input both bounds are
    # NULL, the range condition evaluates NULL, and without the isNull
    # branch the otherwise(raise_error) arm would be nominally selected —
    # the current optimizer happens not to fire it, but an empty spine
    # must be empty BY CONSTRUCTION (sequence(NULL, NULL) → NULL →
    # explode drops it), not by null-propagation accident (ADVICE r10).
    # exact bound: sequence(lo, hi, step) emits floor((hi-lo)/step)+1
    # slots, which is <= max_slots  iff  lo + step*max_slots > hi. The
    # earlier >= (max_slots-1) form was conservative — it refused legal
    # non-step-aligned spans (step 1h, max_slots 10, span 9.5h -> 10
    # slots but lo+9h < hi raised; ADVICE r11).
    hi_ok = F.when(F.col("_hi").isNull(), F.col("_hi")).when(
        F.expr(f"_lo + ({step}) * {max_slots}") > F.col("_hi"),
        F.col("_hi"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "bucket_spine: dense range [%s, %s] exceeds max_slots="
                f"{max_slots} at step {step} — a corrupt timestamp would "
                "otherwise OOM the spine; quarantine it or raise max_slots",
                F.col("_lo").cast("string"),
                F.col("_hi").cast("string"),
            )
        )
    )
    buckets = bounds.select(
        F.explode(F.sequence(F.col("_lo"), hi_ok, F.expr(step))).alias(
            bucket_col
        )
    )
    return df.select(*key_cols).distinct().crossJoin(buckets)


def locf(
    value_col: str | Column,
    key_cols: Sequence[str],
    order_col: str,
) -> Column:
    """Last observation carried forward: latest non-null value up to the
    current bucket within each series. Buckets before the first observation
    stay NULL (nothing to carry)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.last(value_col, ignorenulls=True).over(w)
