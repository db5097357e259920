"""Catalog-wide empty-input sweep: every registered query must degrade to
an empty (or sane aggregate) result on zero-row tables, never crash.

At 100 TB an empty slice is routine — a day partition with no events, a
tenant with no documents — and jobs are often parameterized over such
slices. The failure class this guards (found by the first run of this
sweep): ANSI divide-by-zero in ratio aggregates, iterative operators that
sample seed state from data (k-means init) and assume it is non-empty."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(spark, sf_dir, tmp_path_factory):
    from data_engineering_project_spark.sources.tables import load_table

    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_query_survives_empty_tables(spark, empty_sf):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, empty_sf).limit(5).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {exc!r}"[:160])
    assert not failures, "\n".join(failures)
