"""Ingestion-surface queries: drive the corpus wire-format reader
(sources/jsonl.py) through the driver's oracle gate.

The JSONL dead-letter source is pipeline-critical at 100 TB (a crawl ALWAYS
has broken lines; see the module doc of sources/jsonl.py), so its routing
decision — which lines parse, which quarantine, per source file — is
hash-checked against DuckDB reading the very same committed fixture shards
as raw text. The fixture keeps its corrupt lines syntactically invalid JSON
(not merely type-mismatched) so Spark's Jackson parser and DuckDB's
``json_valid`` agree on the good/bad boundary by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_project_spark.plans.catalog import register

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_FIXTURE_DIR = os.path.join(_REPO_ROOT, "tests", "fixtures", "jsonl_corrupt")

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

_DEAD_LETTER_SQL = f"""
    WITH raw AS (
        SELECT filename AS fn, line
        FROM read_csv('{_FIXTURE_DIR}/*.jsonl',
                      columns={{'line': 'VARCHAR'}}, delim='\x01',
                      quote='', escape='', header=false, filename=true)
    ),
    nb AS (
        SELECT regexp_extract(fn, '([^/]+)$', 1) AS file, line
        FROM raw WHERE line IS NOT NULL AND trim(line) <> ''
    ),
    cls AS (SELECT file, line, json_valid(line) AS ok FROM nb),
    perfile AS (
        SELECT file, CAST(count(*) FILTER (WHERE NOT ok) AS BIGINT) AS n_bad
        FROM cls GROUP BY file
        HAVING count(*) FILTER (WHERE NOT ok) > 0
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_good_total,
               CAST(sum(length(json_extract_string(line, '$.text'))) AS BIGINT)
                   AS good_chars_total
        FROM cls WHERE ok
    )
    SELECT file, n_bad, n_good_total, good_chars_total FROM perfile, tot
"""


@register(
    "jsonl_dead_letter_audit",
    sql=_DEAD_LETTER_SQL,
    doc="The JSONL corpus reader's routing decision, oracle-checked: "
    "read_jsonl (sources/jsonl.py) parses the committed corrupt-line "
    "fixture shards against a pinned schema; corrupt lines route to the "
    "dead-letter channel with file provenance, good lines parse clean. "
    "Returns one row per file that produced dead letters (file, n_bad) "
    "with the global good-row count and good-text char sum alongside — "
    "so the hash pins BOTH channels and the provenance attribution. The "
    "oracle re-reads the same shards as raw text lines in DuckDB and "
    "classifies with json_valid.",
    tags=("source", "jsonl", "dead-letter"),
)
def jsonl_dead_letter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.sources.jsonl import read_jsonl

    good, bad = read_jsonl(spark, _FIXTURE_DIR, _DOC_SCHEMA)
    per_file = bad.groupBy(
        F.regexp_extract("source_file", r"([^/]+)$", 1).alias("file")
    ).agg(F.count("*").cast("bigint").alias("n_bad"))
    totals = good.agg(
        F.count("*").cast("bigint").alias("n_good_total"),
        F.sum(F.length("text")).cast("bigint").alias("good_chars_total"),
    )
    # 1-row aggregate × per-file rows: a broadcast of one row, not a shuffle
    return per_file.crossJoin(F.broadcast(totals))
