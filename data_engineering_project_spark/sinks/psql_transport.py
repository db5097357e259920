"""psql-subprocess warehouse transport: the no-JDBC-driver bulk path.

``load_report_jdbc`` (warehouse_sink.py) runs the merge protocol over a
live JDBC connection — the preferred transport when the Postgres JDBC jar
ships with the cluster. Plenty of deployments instead bulk-load through the
``psql`` client (COPY is Postgres's fastest ingest path and needs no JVM
driver); this module provides that transport with the SAME statement plan:

  1. Spark writes the batch as CSV part files (parallel, schema-stable)
  2. one persistent psql session TRUNCATEs staging and ``\\copy``s each
     part in — truncate-and-load, mirroring the JDBC overwrite semantics
  3. :func:`warehouse_sink.execute_merge` runs the pinned archive →
     ranged-delete → insert → dead-letter protocol in ONE transaction on
     that same session

Reference parity: src/Task2/warehouse.py:258-329 (pandas ``to_sql`` +
SQLAlchemy transaction); the statement plan is byte-identical to the JDBC
transport's (tests/test_merge_dialect.py pins it), so the two transports
are interchangeable per environment.

Session protocol: each ``execute`` round-trips one statement and then
echoes psql's ``:ERROR`` variable behind a unique sentinel — a failed
statement raises driver-side while the server transaction sits aborted,
exactly like a failed JDBC execute, so ``execute_merge``'s
rollback-and-reraise contract holds unchanged.
"""

from __future__ import annotations

import glob
import os
import subprocess
import uuid

from pyspark.sql import DataFrame

from data_engineering_project_spark.sinks.warehouse_sink import (
    MergeSpec,
    execute_merge,
)


class PsqlSession:
    """DB-API-ish ``execute``/``fetch_rows`` over one persistent psql
    process — the connection shape :func:`execute_merge` drives."""

    def __init__(
        self,
        *,
        host: str,
        dbname: str = "postgres",
        user: str | None = None,
        port: int | None = None,
    ):
        cmd = ["psql", "-h", host, "-d", dbname, "-qAt"]
        if user:
            cmd += ["-U", user]
        if port:
            cmd += ["-p", str(port)]
        self._p = subprocess.Popen(
            cmd,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,  # errors re-surface via :ERROR
            text=True,
        )

    def _roundtrip(self, payload: str, collect: bool) -> list[list[str]]:
        tag = uuid.uuid4().hex
        self._p.stdin.write(payload)
        self._p.stdin.write(f"\\echo __S_{tag} :ERROR\n")
        self._p.stdin.flush()
        rows: list[list[str]] = []
        while True:
            line = self._p.stdout.readline()
            if not line:
                raise RuntimeError("psql session died")
            if line.startswith(f"__S_{tag}"):
                if line.split()[-1] == "true":
                    raise RuntimeError(
                        f"psql statement failed: {payload[:120]!r}"
                    )
                return rows
            if collect and line.strip():
                rows.append(line.rstrip("\n").split("|"))

    def execute(self, sql: str) -> None:
        self._roundtrip(sql.rstrip().rstrip(";") + ";\n", collect=False)

    def fetch_rows(self, sql: str) -> list[list[str]]:
        return self._roundtrip(sql.rstrip().rstrip(";") + ";\n", collect=True)

    def copy_csv(self, table: str, csv_path: str) -> None:
        """Client-side COPY of one headered CSV file into ``table``.
        ``\\copy`` is a psql meta-command (one line, no trailing
        semicolon needed) that streams the LOCAL file through the
        session — the client-side analog of server COPY."""
        self._roundtrip(
            f"\\copy {table} FROM '{csv_path}' WITH (FORMAT csv, HEADER)\n",
            collect=False,
        )

    def close(self) -> None:
        try:
            self._p.stdin.close()
            self._p.wait(timeout=10)
        except Exception:
            self._p.kill()


def stage_csv_dir(session: PsqlSession, table: str, csv_dir: str) -> int:
    """Truncate ``table`` and ``\\copy`` every CSV part file from a Spark
    CSV output directory into it. Returns the number of part files loaded.

    Runs OUTSIDE the merge transaction by design, matching the JDBC
    transport where ``df.write.jdbc(mode='overwrite')`` commits the staging
    load separately: staging is private to the loader, so a crash between
    staging and merge leaves only an invisible half-staged table that the
    next run truncates."""
    session.execute(f"TRUNCATE {table}")
    parts = sorted(glob.glob(os.path.join(csv_dir, "part-*.csv")))
    for p in parts:
        session.copy_csv(table, p)
    return len(parts)


def load_report_psql(
    df: DataFrame,
    spec: MergeSpec,
    session: PsqlSession,
    *,
    scratch_dir: str,
    invalid_df: DataFrame | None = None,
) -> None:
    """Full batch load over the psql transport: CSV-export ``df`` (and the
    optional dead-letter frame), bulk-COPY into the staging tables, then
    the pinned merge protocol in one transaction on ``session``.

    Column order in the CSV follows ``spec.columns`` exactly (COPY is
    positional); timestamps serialize as ``yyyy-MM-dd HH:mm:ss`` so
    Postgres's timestamp input parser reads them unambiguously."""
    out = os.path.join(scratch_dir, f"stage_{uuid.uuid4().hex[:8]}")
    (
        df.select(*spec.columns)
        .write.option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .mode("overwrite")
        .csv(out)
    )
    staging = ".".join(f'"{p}"' for p in spec.staging.split("."))
    if stage_csv_dir(session, staging, out) == 0:
        raise RuntimeError(f"no CSV part files produced under {out}")
    if invalid_df is not None and spec.invalid_staging:
        iout = os.path.join(scratch_dir, f"stage_inv_{uuid.uuid4().hex[:8]}")
        (
            invalid_df.select(*spec.invalid_columns)
            .write.option("header", True)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
            .mode("overwrite")
            .csv(iout)
        )
        istaging = ".".join(f'"{p}"' for p in spec.invalid_staging.split("."))
        stage_csv_dir(session, istaging, iout)
    execute_merge(session, spec)
