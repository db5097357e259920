"""Streaming-mode tests: exactly-once file consumption across runs (the
reference deletes inputs to get this — T3), idempotent upsert on re-delivered
hours (T4), late-file updates (T5)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from data_engineering_project_spark.streaming.pipeline import run_incremental_report

SCHEMA = T.StructType(
    [
        T.StructField("interaction_id", T.LongType()),
        T.StructField("page_url", T.StringType()),
    ]
)


def _write_events(path, n):
    pq.write_table(
        pa.table(
            {
                "interaction_id": list(range(n)),
                "page_url": [f"https://x.test/{i}" for i in range(n)],
            }
        ),
        path,
    )


@pytest.fixture()
def dirs(tmp_path):
    (tmp_path / "in").mkdir()
    return {
        "in": str(tmp_path / "in"),
        "target": str(tmp_path / "report"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _counts(spark, target):
    return {
        (r["date"], r["hour"], r["event_type"]): r["n"]
        for r in spark.read.parquet(target).collect()
    }


def test_incremental_runs_consume_each_file_once(spark, dirs):
    _write_events(f"{dirs['in']}/impressions_processed_dk_20220526113212045_1-4_1.parquet", 4)
    run_incremental_report(spark, dirs["in"], dirs["target"], dirs["ckpt"], SCHEMA)
    assert _counts(spark, dirs["target"]) == {("2022-05-26", 11, "impressions"): 4}

    # second tick: a new file for the SAME hour arrives; checkpoint must skip
    # the already-seen file and the upsert must revise, not duplicate
    _write_events(f"{dirs['in']}/impressions_processed_dk_20220526114500000_5-8_1.parquet", 3)
    run_incremental_report(spark, dirs["in"], dirs["target"], dirs["ckpt"], SCHEMA)
    assert _counts(spark, dirs["target"]) == {("2022-05-26", 11, "impressions"): 7}


def test_multi_type_and_late_file(spark, dirs):
    _write_events(f"{dirs['in']}/impressions_processed_dk_20220527123000000_1-4_1.parquet", 4)
    _write_events(f"{dirs['in']}/clicks_processed_dk_20220527123100000_1-7_1.parquet", 7)
    run_incremental_report(spark, dirs["in"], dirs["target"], dirs["ckpt"], SCHEMA)
    got = _counts(spark, dirs["target"])
    assert got[("2022-05-27", 12, "impressions")] == 4
    assert got[("2022-05-27", 12, "clicks")] == 7

    # late file for an EARLIER hour (11:xx) arrives in the next tick —
    # within watermark tolerance it must land in its own hour bucket
    _write_events(f"{dirs['in']}/clicks_processed_dk_20220527114000000_8-10_1.parquet", 3)
    run_incremental_report(spark, dirs["in"], dirs["target"], dirs["ckpt"], SCHEMA)
    got = _counts(spark, dirs["target"])
    assert got[("2022-05-27", 11, "clicks")] == 3
    assert got[("2022-05-27", 12, "clicks")] == 7
