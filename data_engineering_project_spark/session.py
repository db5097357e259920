"""SparkSession factory — the single place engine configuration lives.

Analog of the reference's ``main.py:43-117`` (create_spark_session) minus the
Windows/Hadoop scaffolding. Defaults are chosen for correctness-at-scale:

- AQE on (runtime coalescing, skew-join splitting) — reference `main.py:60`
- Arrow on for any Python boundary (pandas UDFs, toPandas)
- session timezone pinned to UTC so filename/event-time derivation is
  deterministic across environments
- shuffle partitions sized from the local core count; on a real cluster the
  caller overrides via `extra_conf` (rule of thumb: 2-3x total cores, or let
  AQE coalesce from a high initial value)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the local[<cpus>] test harness; a cluster deployment
# overrides master/memory/shuffle via extra_conf or spark-submit conf.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # nested-schema pruning + pushdown are default-on in Spark >= 3.1; pinned
    # here because the engine's scans rely on them (SURVEY.md §4.1)
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # make timestamp semantics deterministic: parquet timestamps without a
    # timezone are read as NTZ (wall-clock), matching the DuckDB oracle
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # parquet TIMESTAMP(NANOS) (pandas-written ns timestamps) is otherwise an
    # illegal type for the vectorized reader; read as long and normalize in
    # the source layer (sources/tables.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "8g",
    "spark.driver.maxResultSize": "4g",
    # runtime bloom-filter join pre-filtering: a selective join side injects
    # a bloom filter into the other side's scan — at 100 TB this is the
    # difference between shuffling the whole fact table and only the
    # qualifying keys (semi-join reduction without rewriting queries)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # MIN/MAX/COUNT answered from parquet footer statistics where legal —
    # a metadata read instead of a scan
    "spark.sql.parquet.aggregatePushdown": "true",
    # bound Arrow batch size so pandas-UDF executor memory is O(batch), not
    # O(partition), even with fat binary payload columns (multimodal ops)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # keep broadcast threshold at default 10MB; dimension tables at test SFs
    # broadcast automatically, large-cluster users tune per-deployment
}


def get_spark(
    app_name: str = "data_engineering_project_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the env
    var is unset). On a cluster, pass ``master=None`` *and* set
    ``spark.master`` externally via spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
