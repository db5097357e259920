"""Postgres-dialect pin for the merge sink (round-3 verdict item #8).

The sandbox has no live Postgres, so the integration tests run against
embedded Derby/DuckDB stand-ins.  These tests close the remaining gap by
asserting that :func:`build_merge_statements` emits the REFERENCE's exact
wire protocol — the archive → ranged-delete → insert transaction of
``src/Task2/warehouse.py:423-466`` and the dead-letter staging +
``ON CONFLICT (datetime, source_file) DO UPDATE`` upsert of
``src/Task2/warehouse.py:277-322`` (DDL ``docker/init/01-init-db.sql:5-31``)
— token for token, so a real Postgres 14+ would accept and execute the
same statements the reference sends.

No SparkSession needed: the builder is pure string assembly.
"""

from __future__ import annotations

import re

from data_engineering_project_spark.sinks.warehouse_sink import (
    MergeSpec,
    build_merge_statements,
)

# the reference's table names, schema-qualified exactly as its SQLAlchemy
# statements render them
SPEC = MergeSpec(
    target="adform_dw.client_report",
    archive="adform_dw.client_report_archive",
    staging="adform_dw.client_report_staging",
    invalid_table="adform_dw.client_report_invalid",
    invalid_staging="adform_dw.client_report_invalid_staging",
)


def tokens(sql: str) -> list[str]:
    """Canonical token stream: strip identifier quotes, fold case on
    keywords (identifiers are already lowercase), collapse whitespace."""
    sql = sql.replace('"', "")
    out = []
    for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[(),=<>*.]|;", sql):
        out.append(tok.upper() if tok.upper() in _KEYWORDS else tok)
    return out


_KEYWORDS = {
    "INSERT", "INTO", "SELECT", "FROM", "WHERE", "AND", "OR", "NOT",
    "EXISTS", "BETWEEN", "DELETE", "ON", "CONFLICT", "DO", "UPDATE",
    "SET", "MIN", "MAX", "EXCLUDED", "BEGIN", "COMMIT", "ROLLBACK",
}


def test_schema_qualified_names_quote_per_part():
    plan = build_merge_statements(SPEC)
    joined = " ".join(plan.statements)
    # "adform_dw"."client_report" (schema-qualified), never
    # "adform_dw.client_report" (a single dotted identifier — a different,
    # nonexistent table in Postgres)
    assert '"adform_dw"."client_report"' in joined
    assert '"adform_dw.client_report"' not in joined


def test_archive_statement_matches_reference_protocol():
    """Statement 1 = reference warehouse.py:427-439 with the :min_date /
    :max_date binds replaced by the staging batch's own key range (the
    sink computes the window in-database instead of driver-side — same
    values, no round trip)."""
    plan = build_merge_statements(SPEC)
    expect = tokens(
        """
        INSERT INTO adform_dw.client_report_archive (
            datetime, impression_count, click_count, audit_loaded_datetime
        )
        SELECT datetime, impression_count, click_count, audit_loaded_datetime
        FROM adform_dw.client_report t
        WHERE t.datetime BETWEEN
              (SELECT min(datetime) FROM adform_dw.client_report_staging)
          AND (SELECT max(datetime) FROM adform_dw.client_report_staging)
          AND NOT EXISTS (
              SELECT 1 FROM adform_dw.client_report_archive a
              WHERE a.datetime = t.datetime
          )
        """
    )
    assert tokens(plan.statements[0]) == expect


def test_delete_statement_matches_reference_protocol():
    """Statement 2 = reference warehouse.py:448-451 (ranged delete of the
    overlap window, the idempotence guarantee T4)."""
    plan = build_merge_statements(SPEC)
    expect = tokens(
        """
        DELETE FROM adform_dw.client_report
        WHERE datetime BETWEEN
              (SELECT min(datetime) FROM adform_dw.client_report_staging)
          AND (SELECT max(datetime) FROM adform_dw.client_report_staging)
        """
    )
    assert tokens(plan.statements[1]) == expect


def test_insert_statement_loads_full_staging_batch():
    """Statement 3 = reference warehouse.py:458-466 (pandas ``to_sql``
    append), restated as set-based INSERT..SELECT from the staging table
    Spark bulk-loaded."""
    plan = build_merge_statements(SPEC)
    expect = tokens(
        """
        INSERT INTO adform_dw.client_report (
            datetime, impression_count, click_count, audit_loaded_datetime
        )
        SELECT datetime, impression_count, click_count, audit_loaded_datetime
        FROM adform_dw.client_report_staging
        """
    )
    assert tokens(plan.statements[2]) == expect


def test_dead_letter_upsert_matches_reference_on_conflict():
    """Statement 4 = reference warehouse.py:291-313: staging +
    ``ON CONFLICT (datetime, source_file) DO UPDATE SET`` over exactly the
    four non-key columns, values from EXCLUDED, in reference column
    order."""
    plan = build_merge_statements(SPEC)
    expect = tokens(
        """
        INSERT INTO adform_dw.client_report_invalid (
            datetime, impression_count, click_count,
            audit_loaded_datetime, validation_error, source_file
        )
        SELECT datetime, impression_count, click_count,
               audit_loaded_datetime, validation_error, source_file
        FROM adform_dw.client_report_invalid_staging
        ON CONFLICT (datetime, source_file)
        DO UPDATE SET impression_count = EXCLUDED.impression_count,
                      click_count = EXCLUDED.click_count,
                      audit_loaded_datetime = EXCLUDED.audit_loaded_datetime,
                      validation_error = EXCLUDED.validation_error
        """
    )
    assert tokens(plan.statements[3]) == expect


def test_transaction_brackets_are_postgres_verbs():
    plan = build_merge_statements(SPEC)
    assert (plan.begin, plan.commit, plan.rollback) == (
        "BEGIN",
        "COMMIT",
        "ROLLBACK",
    )


def test_conflict_targets_match_reference_unique_index():
    """The conflict target must equal the unique index the reference DDL
    declares (01-init-db.sql:23-31: UNIQUE (datetime, source_file)) —
    Postgres rejects ON CONFLICT clauses that match no index."""
    spec = SPEC
    assert spec.invalid_conflict_keys == ("datetime", "source_file")
    # every non-key column gets refreshed from EXCLUDED; key columns never do
    plan = build_merge_statements(spec)
    upsert = plan.statements[3]
    assert "excluded.\"datetime\"" not in upsert.lower()
    assert 'excluded."source_file"' not in upsert.lower()
