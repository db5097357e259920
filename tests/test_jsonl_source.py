"""JSONL corpus source: schema-pinned parse, corrupt-line dead-letter
routing, transparent gzip — the ingestion contract a crawl-scale corpus
needs (see sources/jsonl.py module doc)."""

from __future__ import annotations

import gzip

from pyspark.sql import types as T

from data_engineering_project_spark.sources.jsonl import (
    infer_jsonl_schema,
    read_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "hola", "lang": "es", "extra_field": true}',
    '{"doc_id": 3, "text": "no lang here"}',
]
BAD = [
    '{"doc_id": 4, "text": "unterminated',
    "not json at all",
]


def test_jsonl_routes_corrupt_lines_and_keeps_partial_rows(spark, tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-000.jsonl").write_text(
        "\n".join([GOOD[0], BAD[0], GOOD[1]]) + "\n"
    )
    (p / "part-001.jsonl").write_text("\n".join([GOOD[2], BAD[1]]) + "\n")

    good, bad = read_jsonl(spark, str(p), SCHEMA)
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in good.collect()}
    # extra fields ignored, missing fields NULL, corrupt lines absent
    assert rows == {
        1: ("hello world", "en"),
        2: ("hola", "es"),
        3: ("no lang here", None),
    }
    assert "_corrupt_record" not in good.columns

    dead = bad.collect()
    assert {r["raw"] for r in dead} == set(BAD)
    # dead-letter rows name their source file for quarantine triage
    assert all(r["source_file"].endswith(".jsonl") for r in dead)
    assert {r["source_file"].rsplit("/", 1)[-1] for r in dead} == {
        "part-000.jsonl", "part-001.jsonl",
    }


def test_jsonl_skips_blank_lines_and_takes_no_cache(spark, tmp_path):
    p = tmp_path / "blanky.jsonl"
    p.write_text(GOOD[0] + "\n\n   \n" + BAD[1] + "\n")
    good, bad = read_jsonl(spark, str(p), SCHEMA)
    assert good.count() == 1 and bad.count() == 1  # blanks neither good nor bad
    # 100 TB contract: the reader must NOT eagerly persist the corpus
    assert good.storageLevel.useMemory is False
    assert good.storageLevel.useDisk is False


def test_jsonl_export_refuses_to_clobber_by_default(spark, tmp_path):
    import pytest

    from data_engineering_project_spark.sources.jsonl import write_jsonl

    df = spark.createDataFrame([(1, "a", "en")], "doc_id long, text string, lang string")
    out = str(tmp_path / "export")
    write_jsonl(df, out)
    with pytest.raises(Exception):
        write_jsonl(df, out)  # mode defaults to error
    write_jsonl(df, out, mode="overwrite")  # explicit replace allowed


def test_jsonl_reads_gzip_transparently(spark, tmp_path):
    gz = tmp_path / "shard.jsonl.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write("\n".join(GOOD) + "\n")
    good, bad = read_jsonl(spark, str(gz), SCHEMA)
    assert good.count() == 3 and bad.count() == 0


def test_jsonl_schema_inference_is_bounded_exploration(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    for i in range(3):
        (p / f"f{i}.jsonl").write_text(GOOD[0] + "\n")
    inferred = infer_jsonl_schema(spark, str(p), sample_files=2)
    assert {f.name for f in inferred.fields} == {"doc_id", "text", "lang"}


def test_jsonl_export_roundtrips_and_bounds_shard_size(spark, tmp_path):
    import glob

    from data_engineering_project_spark.sources.jsonl import write_jsonl

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en") for i in range(100)],
        "doc_id long, text string, lang string",
    ).coalesce(1)
    out = str(tmp_path / "export")
    write_jsonl(df, out, max_records_per_file=30, compression="gzip")
    shards = glob.glob(out + "/*.json.gz")
    assert len(shards) >= 4  # 100 rows / 30-per-file bound, one task
    good, bad = read_jsonl(spark, out, SCHEMA)
    assert bad.count() == 0
    assert {r["doc_id"] for r in good.collect()} == set(range(100))
