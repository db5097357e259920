"""JSONL corpus ingestion — the wire format LLM training corpora actually
ship in (one JSON document per line, usually gzipped).

Spark's native json reader does the heavy lifting (line-delimited by
default, transparent .gz/.zst-by-codec decompression, schema projection
into the parse so unreferenced fields are never materialized). What this
module adds is the ENGINE's contract on top:

- **Schema-pinned, never inferred** in the pipeline path: inference is a
  whole extra pass over 100 TB and yields run-dependent schemas on dirty
  corpora. Callers pass the expected schema; ``infer_jsonl_schema`` exists
  for exploration only and samples a bounded number of files.
- **Corrupt lines are routed, not dropped and not fatal** — the same
  dead-letter semantics as the validation layer (quality.py): PERMISSIVE
  parse with a corrupt-record column, good rows come back clean, bad rows
  come back as ``(raw line, source file)`` for quarantine. A 100 TB crawl
  ALWAYS has broken lines; a FAILFAST job that dies at 99 % is worthless
  and a silent DROPMALFORMED pipeline lies about recall.

The one Spark subtlety handled here: referencing ONLY the internal
corrupt-record column of a raw JSON scan is disallowed (SPARK-21610). We
avoid it structurally instead of caching around it: read raw LINES with
``spark.read.text`` (same codec machinery, so .gz decompresses the same),
parse each line with ``from_json`` — an ordinary expression, exempt from
the restriction — and split on the parse's corrupt column. No persist, no
extra pass, nothing pinned in executor memory: at corpus scale, lazily
re-scanning per consumer beats materializing 100 TB into a cache. Catalyst
additionally prunes the ``from_json`` parse schema to the fields a consumer
actually selects (json expression optimization), so projection survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Parse line-delimited JSON at ``path`` (file, directory, or glob;
    compressed files decompress transparently) against a pinned schema.

    Returns ``(good, bad)`` — both LAZY (no cache is taken; each consumer
    re-scans, which at corpus scale beats pinning the parse in memory):
    - ``good``: rows matching the schema, corrupt column dropped. Fields
      missing on a line are NULL (per JSON semantics); extra fields on a
      line are ignored (schema projection).
    - ``bad``: one row per unparseable line — ``(raw, source_file)`` —
      ready for a dead-letter sink, same contract as quality.py's
      invalid-rows channel.

    Blank / whitespace-only lines are skipped (matching the native json
    reader), not routed as corrupt.
    """
    if CORRUPT_COL in schema.fieldNames():
        full = schema
    else:
        full = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    parsed = (
        spark.read.text(path)
        .select(
            F.col("value").alias("_raw"),
            F.col("_metadata.file_path").alias("source_file"),
        )
        .filter(F.length(F.trim(F.col("_raw"))) > 0)
        .withColumn(
            "_parsed",
            F.from_json(
                F.col("_raw"),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ),
        )
    )
    corrupt = F.col(f"_parsed.{CORRUPT_COL}")
    good = (
        parsed.filter(corrupt.isNull())
        .select("_parsed.*")
        .drop(CORRUPT_COL)
    )
    bad = parsed.filter(corrupt.isNotNull()).select(
        F.col("_raw").alias("raw"), "source_file"
    )
    return good, bad


def infer_jsonl_schema(
    spark: SparkSession, path: str, sample_files: int = 4
) -> T.StructType:
    """Exploration helper: infer a schema from a BOUNDED sample of files
    (never the whole corpus — inference is a full extra read). Pin the
    result in code; do not call this in the pipeline path."""
    import glob as _glob
    import os

    if os.path.isdir(path):
        candidates = sorted(_glob.glob(os.path.join(path, "*")))[:sample_files]
    else:
        candidates = sorted(_glob.glob(path))[:sample_files]
    return spark.read.json(candidates or path).schema


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int = 100_000,
    compression: str = "gzip",
    mode: str = "error",
) -> None:
    """Export a corpus as size-bounded JSONL shards — the hand-off format
    tokenizer/packing workers consume. ``maxRecordsPerFile`` bounds shard
    size WITHOUT a repartition (each task rolls to a new file at the
    limit), so export parallelism stays the upstream partitioning and no
    shuffle is added; gzip by default (what corpus mirrors ship).

    ``mode`` follows ``DataFrameWriter.mode`` and defaults to ``error``:
    exporting onto an existing shard set raises instead of silently
    destroying it — pass ``mode="overwrite"`` explicitly to replace."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .json(path)
    )
