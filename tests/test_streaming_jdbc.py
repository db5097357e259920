"""Streaming → warehouse wiring: micro-batches land through the SAME
staging + archive→delete→insert JDBC protocol as the batch load.

ROADMAP item "foreachBatch → JDBC merge wiring": the merge statements were
tested against DuckDB and the write.jdbc path against Derby, but no
exercised path connected a *stream* to the warehouse sink. This drives
``jdbc_report_batch`` end-to-end: file stream → tumbling hourly counts →
pivot to client_report shape → ``load_report_jdbc`` per micro-batch, with
checkpointed exactly-once input and replace-window idempotence across
ticks (reference cron tick: ``src/Task2/warehouse.py:422-466``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from data_engineering_project_spark.sinks.warehouse_sink import (
    JdbcStatementConnection,
    MergeSpec,
)
from data_engineering_project_spark.streaming.pipeline import (
    hourly_counts_stream,
    jdbc_report_batch,
    read_event_stream,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

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
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/whs;create=true"
    jvm = spark._jvm
    conn = JdbcStatementConnection(jvm.java.sql.DriverManager.getConnection(url))
    ddl = '("datetime" TIMESTAMP, "impression_count" BIGINT, "click_count" BIGINT)'
    conn.execute(f'CREATE TABLE "client_report" {ddl}')
    conn.execute(f'CREATE TABLE "client_report_archive" {ddl}')
    conn.close()
    return url


SPEC = MergeSpec(
    target="client_report",
    archive="client_report_archive",
    staging="client_report_staging",
    key="datetime",
    columns=("datetime", "impression_count", "click_count"),
    invalid_table=None,
)


def _tick(spark, in_dir, ckpt, derby_url):
    events = read_event_stream(spark, in_dir, SCHEMA)
    counts = hourly_counts_stream(events)
    jvm = spark._jvm
    writer = jdbc_report_batch(
        derby_url,
        SPEC,
        properties={"driver": DRIVER},
        connection_factory=lambda: JdbcStatementConnection(
            jvm.java.sql.DriverManager.getConnection(derby_url)
        ),
    )
    q = (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(writer)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _table(spark, url, name):
    df = spark.read.jdbc(url, f'"{name}"', properties={"driver": DRIVER})
    return {
        (str(r["datetime"]), r["impression_count"], r["click_count"])
        for r in df.collect()
    }


def test_stream_lands_and_revises_through_jdbc_merge(spark, tmp_path, derby):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    _write_events(
        f"{in_dir}/impressions_processed_dk_20220526113212045_1-4_1.parquet", 4
    )
    _write_events(
        f"{in_dir}/clicks_processed_dk_20220526113300000_1-2_1.parquet", 2
    )
    _tick(spark, str(in_dir), ckpt, derby)
    assert _table(spark, derby, "client_report") == {
        ("2022-05-26 11:00:00", 4, 2)
    }
    assert _table(spark, derby, "client_report_archive") == set()

    # second tick: a late file for the SAME hour — update-mode re-emits the
    # revised count; the merge's replace window swaps the row, archiving the
    # superseded one, and the checkpoint skips the already-seen files
    _write_events(
        f"{in_dir}/impressions_processed_dk_20220526114500000_5-7_1.parquet", 3
    )
    _tick(spark, str(in_dir), ckpt, derby)
    assert _table(spark, derby, "client_report") == {
        ("2022-05-26 11:00:00", 7, 2)
    }
    assert _table(spark, derby, "client_report_archive") == {
        ("2022-05-26 11:00:00", 4, 2)
    }

    # empty tick: no new files → no batch lands, warehouse untouched
    _tick(spark, str(in_dir), ckpt, derby)
    assert _table(spark, derby, "client_report") == {
        ("2022-05-26 11:00:00", 7, 2)
    }


def test_psql_report_batch_closes_sessions_and_tolerates_null_counts(
    spark, tmp_path, monkeypatch
):
    """The psql writer must not leak a psql subprocess per micro-batch
    (every session closed before the batch returns) and must parse
    ``psql -At``'s empty-string rendering of NULL counts like the JDBC
    twin tolerates NULLs (ADVICE r6)."""
    from data_engineering_project_spark.sinks import psql_transport
    from data_engineering_project_spark.streaming.pipeline import (
        psql_report_batch,
    )

    created = []

    class FakeSession:
        def __init__(self):
            self.closed = False
            created.append(self)

        def fetch_rows(self, sql):
            # target already holds this hour with NULL counts written out
            # of band — psql -At renders NULL as ''
            return [["2022-05-26 11:00:00", "", ""]]

        def close(self):
            self.closed = True

    landed = {}
    monkeypatch.setattr(
        psql_transport,
        "load_report_psql",
        lambda df, spec, session, *, scratch_dir: landed.update(
            rows=df.collect(), session=session
        ),
    )
    writer = psql_report_batch(
        SPEC, FakeSession, scratch_dir=str(tmp_path / "scratch")
    )
    batch = spark.createDataFrame(
        [("impressions", "2022-05-26", 11, 4)],
        "event_type string, date string, hour int, n long",
    )
    writer(batch, 0)

    assert len(created) == 2  # one read session + one load session
    assert all(s.closed for s in created)
    (row,) = landed["rows"]
    # clicks not revised by this batch: coalesce falls back to the
    # target's NULL-parsed-as-0, not a ValueError
    assert (row["impression_count"], row["click_count"]) == (4, 0)
    assert landed["session"] in created
