"""CDC / slowly-changing-dimension queries over the `events` changelog.

The `events` table is read as a Debezium-style change stream: each row is
a change to the per-user profile value, ordered by ``(ts, event_id)``;
``event_type = 'error'`` rows are treated as tombstones (deletes). This is
the generalization of the reference's replace-window merge
(src/Task2/warehouse.py:392-466): where the reference replaces a [min,max]
batch window wholesale, CDC apply resolves per-key latest-wins state, and
SCD2 keeps the full effective-dated history a warehouse dimension needs.

Both queries are oracle-checked; the derivation of op/seq from `events` is
restated identically in the DuckDB SQL, so the check exercises the actual
merge semantics, not a fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import cdc
from data_engineering_project_spark.plans.catalog import register
from data_engineering_project_spark.sources.tables import load_table


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (user_id, ts, event_id, op, value): 'error' rows delete.
    NULL-ts rows are excluded — a changelog entry without a sequence
    position cannot be ordered (null-fuzz)."""
    return load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )


@register(
    "cdc_user_state",
    sql="""
    WITH ch AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value
        FROM events WHERE ts IS NOT NULL
    ),
    ranked AS (
        SELECT user_id, ts, event_id, op, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_changes
        FROM ch
    )
    SELECT user_id,
           value AS last_value,
           ts AS last_ts,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM ranked
    WHERE rn = 1 AND op <> 'D'
    """,
    doc="CDC apply, latest-wins: one row per user with the payload of the "
    "newest change; users whose newest change is a tombstone drop out "
    "entirely. The Spark plan is a single map-side-combinable "
    "max(struct(ts, event_id, op, value)) aggregation (operators/cdc.py:"
    "latest_state) — the shuffle carries one partial row per (partition, "
    "key), not the changelog. The oracle restates it as the textbook "
    "row_number()=1 window, proving the agg form computes identical "
    "latest-wins semantics while scaling where the window form (full "
    "shuffle + sort of every change) does not.",
    tags=("cdc", "agg", "merge"),
)
def cdc_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = cdc.latest_state(
        _changelog(spark, sf_dir),
        key_cols=["user_id"],
        seq_cols=["ts", "event_id"],
        payload_cols=["ts", "value"],
        op_col="op",
    )
    return state.select(
        "user_id",
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


@register(
    "scd2_user_value_history",
    sql="""
    WITH ch AS (
        SELECT user_id, ts, event_id, value
        FROM events
        WHERE ts IS NOT NULL AND event_type IS DISTINCT FROM 'error'
    ),
    marked AS (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM ch
    ),
    kept AS (
        SELECT user_id, ts, event_id, value
        FROM marked
        WHERE rn = 1 OR value IS DISTINCT FROM prev_value
    )
    SELECT user_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS INTEGER) AS is_current
    FROM kept
    """,
    doc="SCD Type-2 dimension build: per user, one row per distinct payload "
    "run with half-open [valid_from, valid_to) effective ranges and an "
    "is_current flag. Change suppression (null-safe equality against the "
    "per-key predecessor) runs BEFORE range assembly, so repeated identical "
    "payloads never inflate the history. One shuffle on user_id; the lag "
    "(suppression) and lead (range close) windows share the partitioning, "
    "so Catalyst plans a single Exchange. operators/cdc.py:scd2_history.",
    tags=("cdc", "scd2", "window"),
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    upserts = _changelog(spark, sf_dir).filter(F.col("op") != "D")
    return cdc.scd2_history(
        upserts,
        key_cols=["user_id"],
        seq_col="ts",
        tiebreak_col="event_id",
        payload_cols=["value"],
    ).select("user_id", "value", "valid_from", "valid_to", "is_current")


@register(
    "events_pit_enrichment",
    sql="""
    WITH u AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type <> 'error' THEN 0 ELSE 1 END AS kind,
               CASE WHEN event_type <> 'error' THEN value END AS cv
        FROM events WHERE ts IS NOT NULL
    ),
    s AS (
        SELECT user_id, ts, event_id, kind,
               last_value(cv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS state_value
        FROM u
    )
    SELECT event_id, user_id, state_value
    FROM s WHERE kind = 1
    """,
    doc="Point-in-time-correct enrichment — the feature-store AS-OF "
    "lookup: every 'error' event (the fact side) is annotated with the "
    "user's profile value effective AT its timestamp, derived from the "
    "same changelog the SCD2 build consumes (`scd2_user_value_history`). "
    "PIT correctness rules: changes apply BEFORE facts at the same "
    "timestamp (kind sort key), concurrent changes resolve by event_id "
    "(the SCD2 tiebreak — the fact sees the interval the SCD2 build "
    "would open last), and facts before any change get NULL, never a "
    "future value (no leakage). Spark-first shape: instead of the "
    "interval join against the SCD2 dimension (per-fact range probe, "
    "join fan-out = intervals per user), the changelog and facts UNION "
    "and a single per-user LOCF window resolves every lookup — ONE "
    "shuffle, zero fan-out, identical output to the interval join. The "
    "looked-up double is carried untouched (no arithmetic), so it "
    "hash-matches bit-for-bit.",
    tags=("cdc", "asof", "feature-store", "window"),
)
def events_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # null-fuzz: timeline ops
    )
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") != "error", F.lit(0))
        .otherwise(F.lit(1))
        .alias("kind"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("cv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = u.select(
        "event_id",
        "user_id",
        "kind",
        F.last("cv", ignorenulls=True).over(w).alias("state_value"),
    )
    return s.filter(F.col("kind") == 1).select(
        "event_id", "user_id", "state_value"
    )
