"""Storage layout sinks: partitioned and bucketed writes.

The reference's input layout encodes everything in filenames inside one flat
directory (SURVEY.md §2.1 S2/S3) — no partition pruning is possible and
every job lists and reads everything. At 100 TB layout IS the optimizer:

- **Partitioning** (`partitionBy(event_date, event_type)`): date/type
  predicates prune entire directories at plan time, and joins against a
  filtered dimension prune at runtime (dynamic partition pruning). The
  bronze landing zone should be written this way once and scanned many
  times (SURVEY.md §4.1 'partition pruning: none').
- **Bucketing** (`bucketBy(N, key)` + `sortBy`): pre-shuffles data by the
  join/agg key at write time. Two tables co-bucketed on the same key join
  with NO Exchange on either side — the shuffle is paid once at ingest,
  not on every query. The right call for fact⋈fact joins (orders⋈lineitem)
  that recur at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    mode: str = "overwrite",
    dynamic_overwrite: bool = True,
) -> None:
    """Write parquet partitioned by ``partition_cols``.

    ``dynamic_overwrite`` scopes an overwrite to only the partitions present
    in ``df`` — the declarative version of the reference's per-date
    archive/delete/insert idempotency (warehouse.py:422-466): re-delivering
    one date replaces exactly that date's directory.
    """
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if dynamic_overwrite and mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    table. Joins/aggregations between tables bucketed on the same key with
    the same bucket count run shuffle-free (verified in
    tests/test_layout.py: SortMergeJoin with zero Exchange nodes)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
