"""Change-data-capture operators: changelog → current state / SCD2 history.

A warehouse fed by upsert/delete changelogs (Debezium-style CDC, the
generalization of the reference's replace-window merge protocol,
src/Task2/warehouse.py:392-466) needs two derived shapes:

- **latest state**: one row per key, the payload of the newest change,
  deletes removing the key entirely;
- **SCD Type-2 history**: one row per key per *distinct* payload run,
  carrying ``[valid_from, valid_to)`` effective ranges and an
  ``is_current`` flag.

Scale design (100 TB changelogs):

- ``latest_state`` is a single map-side-combinable aggregation —
  ``max(struct(seq…, payload…))`` picks the newest change per key inside
  the combiner, so the shuffle carries one partial row per (partition,
  key), NOT the full changelog. The naive ``row_number() = 1`` window
  form shuffles and sorts every change row; the agg form is what survives
  a 1000-executor run. Requires the seq columns to form a total order
  per key (enforced by the caller supplying a tiebreaker).
- ``scd2_history`` cannot avoid per-key ordering (the output IS the
  ordered run structure), so it uses one window shuffle partitioned by
  key — state is bounded by the largest single key's history, and the
  change-suppression filter (drop no-op changes) runs BEFORE range
  assembly so repeated identical payloads never inflate the output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_state(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    payload_cols: Sequence[str],
    *,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Newest change per key via one aggregation (no window sort).

    ``seq_cols`` must totally order changes within a key (e.g. ``(ts,
    change_id)``). Struct comparison is lexicographic over the fields, so
    ``max(struct(*seq_cols, *payload))`` is exactly "payload of the last
    change". When ``op_col`` is given, keys whose newest change is a
    ``delete_op`` are dropped (CDC delete semantics); the op column rides
    inside the struct so delete-resolution uses the same single pass.

    Output: ``key_cols`` + ``payload_cols`` + ``n_changes`` (all changes
    seen for the key, deletes included).
    """
    carried = list(payload_cols) + ([op_col] if op_col else [])
    # payload may repeat a seq column (e.g. carry the change timestamp);
    # struct fields must stay unique for the later `.field` extraction
    fields = list(seq_cols) + [c for c in carried if c not in seq_cols]
    newest = F.max(F.struct(*[F.col(c) for c in fields]))
    agg = df.groupBy(*key_cols).agg(
        newest.alias("_newest"), F.count(F.lit(1)).alias("n_changes")
    )
    if op_col:
        agg = agg.filter(F.col(f"_newest.{op_col}") != delete_op)
    return agg.select(
        *key_cols,
        *[F.col(f"_newest.{c}").alias(c) for c in payload_cols],
        "n_changes",
    )


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    tiebreak_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Effective-dated history: collapse consecutive identical payloads,
    then derive ``valid_from`` / ``valid_to`` / ``is_current``.

    Change suppression uses null-safe equality (``eqNullSafe``) on every
    payload column against the per-key predecessor, so NULL→NULL is "no
    change" while NULL→value opens a new version — the standard SCD2
    contract. ``valid_to`` is the next surviving change's ``seq_col``
    (half-open ranges: a version is live in ``[valid_from, valid_to)``),
    NULL on the current version.

    One shuffle on ``key_cols``; both windows (lag for suppression, lead
    for range close) share the same partitioning, so Catalyst plans a
    single Exchange + sort.
    """
    order = [F.col(seq_col), F.col(tiebreak_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    def unchanged() -> Column:
        same: Column = F.lit(True)
        for c in payload_cols:
            same = same & F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
        # lag() is NULL on the first row of a key → eqNullSafe(False-ish)
        # only when the payload itself is NULL; guard with row_number
        return same & (F.row_number().over(w) > 1)

    kept = df.withColumn("_dup", unchanged()).filter(~F.col("_dup")).drop("_dup")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return kept.select(
        *key_cols,
        *payload_cols,
        F.col(seq_col).alias("valid_from"),
        F.lead(F.col(seq_col)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull().cast("int"))
