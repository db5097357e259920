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


def test_round_start_updater_refreshes_only_newest_round(tmp_path, monkeypatch):
    """tools/update_fingerprints.py semantics: names green in the NEWEST
    CORRECTNESS file get the current fingerprint + round; every other entry
    is left untouched (a query rewritten in a round where it was not
    sampled keeps the fingerprint of its last-hashed code and therefore
    reads as changed)."""
    import json

    from tools import update_fingerprints as upd

    # fake repo root with two correctness rounds
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_old": {"hash_match": True}, "q_both": {"hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_both": {"hash_match": True}, "q_err": {"hash_match": False}})
    )
    rounds = upd.correctness_rounds(str(tmp_path))
    assert [r for r, _ in rounds] == [1, 2]
    newest_round, newest_rows = rounds[-1]
    assert newest_round == 2
    # only green rows in the newest round qualify for a refresh
    green = {n for n, row in newest_rows.items() if row.get("hash_match") is True}
    assert green == {"q_both"}


def test_stale_flag_fronts_operator_level_rewrites(monkeypatch):
    """--stale forces fp=None, which staleness_order sorts into bucket 1 —
    the manual nudge for operator-level rewrites the fn-source fingerprint
    cannot see."""
    from types import SimpleNamespace

    from data_engineering_project_spark.plans import fingerprints as fp

    def f(spark, sf_dir):
        return None

    queries = {"q": SimpleNamespace(fn=f, sql="SELECT 1 AS x"),
               "r": SimpleNamespace(fn=f, sql="SELECT 2 AS x")}
    snapshot = {
        "q": {"fp": None, "round": 5},  # what --stale writes
        "r": {"fp": fp.compute_fingerprint(f, "SELECT 2 AS x"), "round": 1},
    }
    monkeypatch.setattr(fp, "load_snapshot", lambda: snapshot)
    assert fp.staleness_order(queries) == ["q", "r"]
