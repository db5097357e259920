"""Training-shard layout: deterministic global shuffle + uniform shard files.

The last mile of a training-data pipeline: the curated corpus must be
written as N shards that are (a) well-mixed — no source/time locality
within a shard, (b) reproducible — the same corpus + seed always yields
byte-identical shard membership and intra-shard order, regardless of
cluster size or input partitioning, and (c) uniform — loaders stream
shards round-robin, so one oversized shard stalls the job.

``df.repartition(n)`` fails (a)+(b): it round-robins rows by their
*input* partition layout, so membership changes with the reader's split
planning. The deterministic recipe used here:

- shuffle key = portable hash of (salt, doc key) — `sampling.hash_bucket`'s
  md5 construction, so membership is a pure row function, engine-portable,
  and re-derivable by any auditor;
- shard id = key mod n_shards → each shard is a uniform random 1/N of the
  corpus (md5 uniformity), no coordination, no skew beyond binomial noise;
- intra-shard order = sort by the full 32-hex digest — a global
  pseudo-random order, decided per-row, stable under any partitioning.

At 100 TB this is one hash-partitioned Exchange (the unavoidable global
mix) followed by a per-partition sort — no driver involvement, no sample
pass; `maxRecordsPerFile` caps file sizes for object-store-friendly
output without a second job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.sampling import hash_bucket


def shard_key(key: Column, *, salt: str = "shard-v1") -> Column:
    """Full 32-hex md5 of (salt, key): the global pseudo-random sort key."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def assign_shard(key: Column, n_shards: int, *, salt: str = "shard-v1") -> Column:
    """Deterministic shard id in [0, n_shards): hash-bucket mod N."""
    return (hash_bucket(key, salt=salt) % n_shards).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    *,
    salt: str = "shard-v1",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write ``df`` as ``shard=K/`` parquet directories: deterministic
    membership, pseudo-random intra-shard order, bounded file sizes.

    ``repartition(n, shard)`` co-locates each shard's rows (one shuffle);
    ``sortWithinPartitions`` fixes the intra-shard order without a global
    range exchange; ``partitionBy`` keeps the shard id navigable in the
    path for loaders that map shards to workers.
    """
    out = df.withColumn("shard", assign_shard(F.col(key_col), n_shards, salt=salt))
    out = out.withColumn("_order", shard_key(F.col(key_col), salt=salt))
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_order")
        .drop("_order")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
