"""As-of (most-recent-prior-event) join — absent in Spark and the reference.

The classic implementation is a range join (quadratic blowup) or a
per-key sort-merge. The scalable Spark expression is union + window:

    tag both streams, union them, window over (key ORDER BY time),
    carry the last left-side time/value forward with
    last(..., ignorenulls=True), then keep only right-side rows.

One shuffle (the window partition), no range join, no per-key loop; skewed
keys are the same risk as any window partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    carry: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each right row, attach the latest left row with
    ``left_time <= right_time`` and the same ``on`` key.

    ``carry`` lists the left columns to attach (each becomes ``asof_<name>``);
    ``left_time`` arrives as ``asof_<left_time>``. Ties at identical
    timestamps resolve by ``tie_break`` ordering (left rows sort before right
    rows at equal time, making 'at-or-before' inclusive).
    """
    reserved = {"_k", "_t", "_side", "_row"}
    outputs = {f"asof_{left_time}", *(f"asof_{c}" for c in carry)}
    for label, names in (("carry", carry), ("right", right.columns)):
        clash = (set(names) & reserved) | (set(names) & outputs)
        if clash:
            raise ValueError(
                f"asof_join: {label} column(s) {sorted(clash)} collide with "
                f"internal names {sorted(reserved)} or generated outputs "
                f"{sorted(outputs)}; rename them before joining"
            )
    if on in carry or left_time in carry:
        raise ValueError(
            "asof_join: carry must not repeat the join key or left_time "
            f"(got {carry!r}) — both are attached automatically"
        )
    # NULL-time rows are excluded on BOTH sides: they have no position on
    # the as-of timeline, and their window order even DIFFERS between
    # engines (Spark ASC puts NULLs first, DuckDB last) — null-fuzz finding
    left = left.filter(F.col(left_time).isNotNull())
    right = right.filter(F.col(right_time).isNotNull())
    lt = F.col(left_time)
    tagged_left = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in carry],
    )
    rcols = [c for c in right.columns]
    # right side carries its full row via a struct so no column collides
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(tagged_left.schema[c].dataType).alias(c) for c in carry],
        F.struct(*[F.col(c) for c in rcols]).alias("_row"),
    )
    tagged_left = tagged_left.withColumn(
        "_row", F.lit(None).cast(tagged_right.schema["_row"].dataType)
    )
    unioned = tagged_left.unionByName(tagged_right)

    order = [F.col("_t"), F.col("_side")]
    if tie_break:
        order.append(F.col(tie_break))
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_row",
        F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias(f"asof_{left_time}"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in carry
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_row.{c}").alias(c) for c in rcols],
        f"asof_{left_time}",
        *[f"asof_{c}" for c in carry],
    )


def sessionize(
    events: DataFrame,
    *,
    key: str,
    time_col: str,
    gap: str = "30 minutes",
    order_tie_break: str | None = None,
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the time since
    the previous event of the same key reaches ``gap``. Returns the input
    plus ``session_id`` (key-scoped ordinal). One window shuffle.

    Boundary semantics match the streaming twin ``F.session_window`` (whose
    window is ``[event, event + gap)``): an event at exactly ``prev + gap``
    starts a NEW session — hence ``>=``, not ``>``. NULL-time rows are
    excluded (no place on a timeline; cross-engine NULL window order
    diverges — null-fuzz finding), matching session_window's own drop."""
    events = events.filter(F.col(time_col).isNotNull())
    order = [F.col(time_col)] + (
        [F.col(order_tie_break)] if order_tie_break else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    prev_t = F.lag(time_col).over(w)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = (
        prev_t.isNull() | (F.col(time_col).cast("timestamp") >= prev_t + gap_expr)
    ).cast("int")
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
