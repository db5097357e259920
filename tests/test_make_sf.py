"""Contract tests for the deterministic upscale tool (round-12 verdict #1).

tools/make_sf.py manufactures the big slope denominator; if its invariants
drift (orphan FKs, non-dense keys, cross-replica duplicate inflation), every
slope measured against the upscaled data silently measures the wrong
workload. Uses sf0.001 x2 so the test stays fast.
"""

from __future__ import annotations

import math
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tools.make_sf import PK, upscale

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def up(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf") / "sf0.002")
    upscale(SRC, out, 2)
    return out


def _read(d, t):
    return pq.read_table(os.path.join(d, f"{t}.parquet"))


def test_row_counts_and_dense_keys(up):
    for t, pk in PK.items():
        base_n = _read(SRC, t).num_rows
        big = _read(up, t)
        assert big.num_rows == 2 * base_n, t
        assert pc.min(big[pk]).as_py() == 0, t
        assert pc.max(big[pk]).as_py() == 2 * base_n - 1, t
        assert pc.count_distinct(big[pk]).as_py() == 2 * base_n, t


def test_fixed_dims_copied_verbatim(up):
    for t in ("region", "nation"):
        assert _read(up, t).equals(_read(SRC, t)), t


def test_fk_integrity(up):
    li = _read(up, "lineitem")
    for col, parent in (
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ):
        pk = PK[parent]
        parents = set(_read(up, parent)[pk].to_pylist())
        child = set(li[col].to_pylist())
        assert child <= parents, (col, sorted(child - parents)[:3])
    orders = _read(up, "orders")
    custs = set(_read(up, "customer")["c_custkey"].to_pylist())
    assert set(orders["o_custkey"].to_pylist()) <= custs


def test_key_derived_names_stay_bijective(up):
    cust = _read(up, "customer")
    names = cust["c_name"].to_pylist()
    keys = cust["c_custkey"].to_pylist()
    assert len(set(names)) == len(names)
    assert all(n == f"Customer#{k:09d}" for n, k in zip(names, keys))


def test_docs_native_dup_rate_no_cross_replica_dups(up):
    base = _read(SRC, "documents")["text"].to_pylist()
    big = _read(up, "documents")["text"].to_pylist()
    base_dups = len(base) - len(set(base))
    big_dups = len(big) - len(set(big))
    assert big_dups == 2 * base_dups  # intra-replica preserved, cross zero
    # n_chars contract: always equals len(text)
    docs = _read(up, "documents")
    for t, n in zip(big, docs["n_chars"].to_pylist()):
        assert n == len(t)


def test_docs_cross_replica_ngram_overlap_is_zero(up):
    base = _read(SRC, "documents")["text"].to_pylist()
    big = _read(up, "documents")["text"].to_pylist()
    rep1 = big[len(base):]

    def grams4(s):
        w = s.split(" ")
        return {tuple(w[i : i + 4]) for i in range(len(w) - 3)}

    # every 4-token window of a replica-1 doc contains >=1 tagged word,
    # so it can never collide with a base-replica window
    for b, r in zip(base[:50], rep1[:50]):
        assert not (grams4(b) & grams4(r)), (b[:40], r[:40])


def test_embeddings_rotation_preserves_intra_replica_cosines(up):
    base = _read(SRC, "embeddings")
    big = _read(up, "embeddings")
    n = base.num_rows
    b_vecs = base["embedding"].to_pylist()
    g_vecs = big["embedding"].to_pylist()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    # replica 1 = rotated copies: pairwise cosine structure identical
    assert cos(g_vecs[n], g_vecs[n + 1]) == pytest.approx(
        cos(b_vecs[0], b_vecs[1]), abs=1e-6
    )
    # and a vector is NOT a near-dup of its own rotation
    assert abs(cos(b_vecs[0], g_vecs[n])) < 0.9


def test_upscale_is_deterministic(up, tmp_path):
    out2 = str(tmp_path / "again")
    upscale(SRC, out2, 2)
    for t in ("lineitem", "documents", "embeddings"):
        assert _read(up, t).equals(_read(out2, t)), t
