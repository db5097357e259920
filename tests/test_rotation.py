"""Staleness-aware driver-sample rotation (round-5 verdict item #1).

The driver hashes the FIRST N names emitted by ``queries()``, so the ordering
contract is load-bearing: changed-since-last-green-hash first (never-hashed
and forced-stale included), then oldest green round first.
"""

from __future__ import annotations

from types import SimpleNamespace

from data_engineering_project_spark.plans import catalog
from data_engineering_project_spark.plans import fingerprints as fp


def _q(body: str, sql: str | None = "SELECT 1 AS x"):
    # exec'd fns have no retrievable source -> compute_fingerprint falls back
    # to repr(); build distinct reprs via distinct names instead.
    ns = {}
    exec(f"def {body}(spark, sf_dir):\n    return None", ns)
    return SimpleNamespace(fn=ns[body], sql=sql)


def test_staleness_order_buckets(tmp_path, monkeypatch):
    queries = {
        "fresh_old": _q("fresh_old"),
        "fresh_new": _q("fresh_new"),
        "rewritten": _q("rewritten"),
        "forced": _q("forced"),
        "never": _q("never"),
    }
    snapshot = {
        "fresh_old": {"fp": fp.compute_fingerprint(queries["fresh_old"].fn, queries["fresh_old"].sql), "round": 1},
        "fresh_new": {"fp": fp.compute_fingerprint(queries["fresh_new"].fn, queries["fresh_new"].sql), "round": 5},
        "rewritten": {"fp": "0" * 64, "round": 4},
        "forced": {"fp": None, "round": 2},
    }
    monkeypatch.setattr(fp, "load_snapshot", lambda: snapshot)
    order = fp.staleness_order(queries)
    # bucket 1: forced/never (sub-bucket 0) before fp-diff (sub-bucket 1);
    # bucket 2: oldest round first.
    assert order == ["forced", "never", "rewritten", "fresh_old", "fresh_new"]


def test_live_snapshot_covers_catalog_and_fronts_stale():
    catalog._ensure_loaded()
    snap = fp.load_snapshot()
    # Every catalog query has a snapshot entry (round-start updater contract)
    # EXCEPT queries added this round, which must sort first anyway.
    order = catalog._ordered_names()
    assert set(order) == set(catalog.QUERIES)
    missing = [n for n in catalog.QUERIES if n not in snap]
    forced = [n for n in snap if snap[n].get("fp") is None]
    changed = [
        n
        for n in catalog.QUERIES
        if n in snap
        and snap[n].get("fp") is not None
        and fp.compute_fingerprint(catalog.QUERIES[n].fn, catalog.QUERIES[n].sql) != snap[n]["fp"]
    ]
    front = set(missing) | set(forced) | set(changed)
    assert set(order[: len(front)]) == front, (
        "all never-hashed/forced-stale/rewritten queries must front the sample"
    )


def test_fingerprint_moves_on_source_or_sql_change():
    def f(spark, sf_dir):
        return 1

    def g(spark, sf_dir):
        return 2

    a = fp.compute_fingerprint(f, "SELECT 1 AS x")
    assert fp.compute_fingerprint(f, "SELECT 1 AS x") == a
    assert fp.compute_fingerprint(f, "SELECT 2 AS x") != a
    assert fp.compute_fingerprint(g, "SELECT 1 AS x") != a
