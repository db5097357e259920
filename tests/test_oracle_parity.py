"""The correctness gate, locally: every catalog query vs its DuckDB oracle.

Mirrors the driver's comparison (row count + columns + order-insensitive
values) at sf0.001 so regressions surface before a round's verify runs.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare_frames, duckdb_conn

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # rows-only contract: the plan must execute; emptiness is allowed
        # only for genuinely selective queries
        assert sdf is not None
        return
    odf = oracle_con.execute(oracles[name]).fetchdf()
    res = compare_frames(name, sdf, odf)
    assert res.ok, f"{name}: {res.detail} | notes={res.notes[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # dense grid invariant: 24 hours per date
    assert len(rows) % 24 == 0
