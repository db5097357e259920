"""Size-gated broadcast hints.

An unconditional ``F.broadcast()`` on a scale-growing table (supplier, part,
customer, or any aggregate whose cardinality tracks the fact table) overrides
Spark's size check, so what is a convenient hint at test SF becomes a
driver/executor OOM at 100× the data. ``broadcast_if_small`` keeps the hint's
determinism at small SF while deferring to Catalyst's size estimate: above
the session's ``spark.sql.autoBroadcastJoinThreshold`` the frame is returned
unhinted and AQE picks the join strategy from runtime shuffle statistics.

Fixed-cardinality frames keep unconditional hints at the call sites: nation
(25 rows), region (5 rows), single-row scalar aggregates, and the bounded
24-rows/date report spine are size-invariant in SF and always broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_if_small(
    df: DataFrame,
    threshold_bytes: int | None = None,
    *,
    estimate_from: DataFrame | None = None,
) -> DataFrame:
    """Broadcast hint gated on Catalyst's plan-time size estimate.

    The estimate is the optimized plan's ``stats().sizeInBytes`` — for
    parquet scans that's the file footprint, with filter/projection
    selectivity applied for derived frames. ``threshold_bytes`` defaults to
    the session's ``autoBroadcastJoinThreshold``; a disabled threshold (-1)
    never hints, matching what the engine itself would do.

    ``estimate_from``: gate on ANOTHER frame's estimate instead of ``df``'s
    own. Catalyst's no-column-stats JOIN estimates multiply and routinely
    blow past the threshold for a dim⋈dim frame whose true size is bounded
    by one base scan (round-6 q5 find: the declined hint made the planner
    hash LINEITEM as the build side). Pass the base scan whose row count
    upper-bounds ``df`` — the gate then stays size-safe at 100 TB (a dim
    that genuinely outgrows the threshold declines) without the join-
    estimate false negative.
    """
    session = df.sparkSession
    if threshold_bytes is None:
        raw = session.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        threshold_bytes = int(
            session._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                str(raw)
            )
        )
    if threshold_bytes < 0:
        return df
    probe = estimate_from if estimate_from is not None else df
    estimate = int(probe._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return F.broadcast(df) if estimate <= threshold_bytes else df
