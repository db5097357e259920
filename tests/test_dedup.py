"""MinHash/SimHash behavioral tests with constructed near-duplicates —
proving recall/precision the synthetic corpus (no near-dups) can't."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "in the warm sun near the old barn door waiting for dinner time"
)
NEAR = BASE.replace("lazy dog", "lazy hound")  # one-token edit
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines today"
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)],  # 3 is exact dup of 0
        "doc_id long, text string",
    )


def test_minhash_finds_near_and_exact_dups(spark):
    pairs = D.minhash_lsh_pairs(_docs(spark), min_jaccard=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 3)] == 1.0  # exact dup: full signature collision
    assert (0, 1) in got and got[(0, 1)] >= 0.5  # near dup caught by LSH
    assert not any(2 in p for p in got)  # unrelated doc never pairs


def test_minhash_jaccard_matches_direct_computation(spark):
    pairs = D.minhash_lsh_pairs(_docs(spark), min_jaccard=0.1)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    # direct shingle Jaccard for (BASE, NEAR): one token differs → k=3
    # shingles touching it differ
    sh = spark.createDataFrame([(0, BASE), (1, NEAR)], "doc_id long, text string")
    sdf = sh.select("doc_id", D.shingles(F.col("text"), 3).alias("s"))
    a, b = [set(r["s"]) for r in sdf.orderBy("doc_id").collect()]
    expected = round(len(a & b) / len(a | b), 6)
    assert got[(0, 1)] == expected


def test_prefix_jaccard_matches_bruteforce_exactly(spark):
    """Prefix filtering is EXACT (no false negatives, unlike MinHash): the
    result must equal a brute-force all-pairs Jaccard at every threshold."""
    from data_engineering_project_spark.operators.text import jaccard, token_set

    docs = _docs(spark)
    for t in (0.3, 0.5, 0.9):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.jaccard_prefix_pairs(docs, min_jaccard=t).collect()
        }
        ts = docs.select("doc_id", token_set(F.col("text")).alias("ts"))
        a = ts.select(F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a"))
        b = ts.select(F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b"))
        brute = (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("j", F.round(jaccard(F.col("ts_a"), F.col("ts_b")), 6))
            .filter(F.col("j") >= t)
        )
        want = {(r["id_a"], r["id_b"]): r["j"] for r in brute.collect()}
        assert got == want, t


def test_shingles_short_docs(spark):
    df = spark.createDataFrame(
        [(0, "two words"), (1, "one"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", D.shingles(F.col("text"), 3).alias("s")).collect()
    }
    assert out[0] == ["two words"]  # < k tokens → whole doc is the shingle
    assert out[1] == ["one"]
    assert out[2] == [""]  # empty text → single empty shingle (still hashable)


def test_simhash_bucket_members_are_hamming_close(spark):
    """Seeded-fixture invariant for the docs_simhash_buckets query shape:
    bucketing by the top-16 fingerprint bits puts exact dups in the same
    bucket, and any two docs sharing a bucket are Hamming-close on the
    full fingerprint (they already agree on 16 of 64 bits; for this
    fixture the near-dup pair agrees within 12 overall)."""
    df = _docs(spark)
    fps = df.select(
        "doc_id",
        D.simhash64(F.col("text")).alias("fp"),
    ).withColumn("bucket", F.shiftrightunsigned(F.col("fp"), 48))
    rows = {r["doc_id"]: (r["fp"], r["bucket"]) for r in fps.collect()}
    assert rows[0][1] == rows[3][1]  # exact dup -> same bucket, always
    by_bucket: dict = {}
    for fp, bucket in rows.values():
        by_bucket.setdefault(bucket, []).append(fp)
    for members in by_bucket.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert bin(a ^ b).count("1") <= 12


def test_simhash_near_dups_are_hamming_close(spark):
    df = _docs(spark)
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", D.simhash64(F.col("text")).alias("fp")).collect()
    }
    assert fps[0] == fps[3]  # identical text → identical fingerprint
    pairs = spark.createDataFrame(
        [(fps[0], fps[1]), (fps[0], fps[2])], "a long, b long"
    ).select(D.hamming64(F.col("a"), F.col("b")).alias("d"))
    d_near, d_far = [r["d"] for r in pairs.collect()]
    assert d_near < d_far  # one-token edit is closer than unrelated text
    assert d_near <= 12


def test_incremental_minhash_matches_full_repair_cross_slice(spark, tmp_path):
    """Continuous-ingest dedup: probing a persisted band index with a new
    batch must find exactly the (new x old) slice of a full re-pairing —
    the proof that the index path loses nothing while never re-pairing
    the corpus. The index round-trips through the snapshot table (the
    intended production store)."""
    from data_engineering_project_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_band_index,
        minhash_lsh_pairs,
    )
    from data_engineering_project_spark.sinks import snapshot_table as st

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    corpus_rows = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, "completely different text about distributed query engines here"),
        (4, "yet another unrelated document concerning parquet file layouts"),
    ]
    new_rows = [
        # exact duplicate of doc 1: every band matches by construction (a
        # single-word edit's band collision is deterministic for the fixed
        # seeds but sits mid-s-curve — flaky-by-fixture, not by code)
        (101, base),
        (102, "totally novel content with no relatives in the corpus at all"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    table = str(tmp_path / "band_index")
    st.write_table(minhash_band_index(corpus), table, stats_cols=("doc_id",))
    index = st.read_table(spark, table)

    got = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_minhash_pairs(
            new, corpus, index, min_jaccard=0.3
        ).collect()
    }
    full = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), r["jaccard"])
        for r in minhash_lsh_pairs(
            corpus.unionByName(new), min_jaccard=0.3
        ).collect()
        if max(r["id_a"], r["id_b"]) >= 101 and min(r["id_a"], r["id_b"]) < 101
    }
    assert got == full
    assert got  # non-vacuous: the near-dup was actually found
    assert all(nid == 101 for nid, _, _ in got)  # novel doc 102 matched nothing


def test_simhash_banding_pigeonhole_recall(spark):
    """docs_simhash_hamming_pairs' core guarantee on the seeded fixture:
    any two fingerprints within Hamming distance 3 agree exactly on at
    least one of the 4 16-bit bands (pigeonhole), so the band equi-join
    can NEVER miss a within-threshold pair. Exact dups collide on ALL
    four bands; far docs must not verify."""
    df = _docs(spark)
    fps = {
        r["doc_id"]: r["fp"]
        for r in D.simhash_fingerprints(df, spread=False).collect()
    }

    def bands(fp):
        return [(fp >> (16 * b)) & 0xFFFF for b in range(4)]

    assert bands(fps[0]) == bands(fps[3])  # exact dup: all 4 bands agree
    for a in fps.values():
        for b in fps.values():
            if bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3:
                assert any(x == y for x, y in zip(bands(a), bands(b)))
    # far pair (0 vs 2) must not pass the hamming<=3 verification
    assert bin((fps[0] ^ fps[2]) & 0xFFFFFFFFFFFFFFFF).count("1") > 3


def test_canonical_selection_keeps_best_and_collapses_transitively(spark):
    """canonical_selection closes the dedup pipeline: chains collapse
    transitively (A~B, B~C → one cluster even though A≁C), each cluster
    keeps the longest doc (ties → smallest id), the manifest lists only
    the REMOVED members with their canonical replacement, and docs in no
    pair never appear."""
    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators.dedup import (
        canonical_selection,
    )

    docs = spark.createDataFrame(
        [
            (1, 100), (2, 300), (3, 200),      # chain 1~2, 2~3 → keep 2
            (10, 50), (11, 50),                # tie on quality → keep 10
            (99, 999),                          # singleton: in no pair
        ],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in canonical_selection(pairs, docs).collect()
    }
    assert got == {1: (2, 3), 3: (2, 3), 11: (10, 2)}

    # the manifest composes with an anti-join into the deduped corpus
    manifest = canonical_selection(pairs, docs)
    kept = {
        r["doc_id"]
        for r in docs.join(manifest, "doc_id", "left_anti").collect()
    }
    assert kept == {2, 10, 99}


def test_canonical_selection_rejects_pair_ids_missing_from_docs(spark):
    """A pair id absent from docs must raise, not silently shrink the
    cluster — the missing node could have been the canonical member."""
    import pytest

    from data_engineering_project_spark.operators.dedup import (
        canonical_selection,
    )

    docs = spark.createDataFrame([(1, 100)], "doc_id long, n_chars long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="absent from docs"):
        canonical_selection(pairs, docs)


def test_winnowing_guarantee_on_constructed_docs(spark):
    """Winnowing's detection guarantee (Schleimer et al. SIGMOD'03 Thm):
    any shared word run of length >= k + w - 1 (= 8 here) forces a shared
    selected fingerprint; documents with no common 5-gram share none; a
    doc shorter than k + w - 1 words yields no fingerprints at all."""
    from data_engineering_project_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    shared_run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = spark.createDataFrame(
        [
            (1, "xx yy " + shared_run + " zz ww"),
            (2, "completely different prefix words here " + shared_run),
            (3, "no overlap with anything else whatsoever in this text"),
            (4, "tiny doc"),  # < k words: no grams
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, k=5, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-word run must share a fingerprint"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    assert 4 not in by_doc
    # density sanity: ~2/(w+1) of grams get selected, never more than G
    assert 0 < len(by_doc[1]) <= 8


def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for x in list(parent):
        groups.setdefault(find(x), set()).add(x)
    return list(groups.values())


def _expected_capped_pairs(ids, B, S=16):
    """Pure-python mirror of operators/dedup.py:_salted_chunks +
    _chain_edges for ONE bucket holding all ``ids`` (identical docs put
    every doc in every bucket, and the assignment depends only on the id):
    gate the salt on bucket size, md5-spread over S sub-buckets, (md5, id)
    order, ≤B chunks, within-chunk pairs + head chains + cross-sub first
    chain."""
    import hashlib

    def md5s(x):
        return hashlib.md5(str(x).encode()).hexdigest()

    if len(ids) <= B:
        return {(a, b) for a in ids for b in ids if a < b}
    subs = {}
    for i in ids:
        subs.setdefault(int(md5s(i)[16:24], 16) % S, []).append(i)
    pairs = set()
    firsts = []
    for s in sorted(subs):
        members = sorted(subs[s], key=lambda i: (md5s(i), i))
        chunks = [members[k : k + B] for k in range(0, len(members), B)]
        for ch in chunks:
            pairs |= {(a, b) for a in ch for b in ch if a < b}
        heads = [ch[0] for ch in chunks]
        pairs |= {
            (min(h1, h2), max(h1, h2)) for h1, h2 in zip(heads, heads[1:])
        }
        firsts.append(members[0])
    pairs |= {(min(f1, f2), max(f1, f2)) for f1, f2 in zip(firsts, firsts[1:])}
    return pairs


def test_bucket_cap_noop_on_benign_corpus(spark):
    """With every bucket under the cap, capped output == uncapped output
    exactly (the cap must not change semantics until it has to)."""
    docs = _docs(spark)
    base = sorted(map(tuple, D.minhash_lsh_pairs(docs, min_jaccard=0.1).collect()))
    capped = sorted(
        map(tuple, D.minhash_lsh_pairs(docs, min_jaccard=0.1, max_bucket=10).collect())
    )
    assert capped == base


def test_bucket_cap_bounds_supercluster_and_keeps_it_connected(spark):
    """The adversarial 100 TB shape: one boilerplate template repeated N
    times puts all N docs in ONE bucket of every band. Uncapped that is
    C(N,2) candidate pairs; with max_bucket=B the output must be O(N*B)
    — chunks of ≤B plus a head-chain — while the verified pairs still
    connect the whole super-cluster into one component."""
    n = 60
    rows = [(i, BASE) for i in range(n)] + [(1000, FAR), (1001, FAR + " extra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = D.minhash_lsh_pairs(docs, min_jaccard=0.5, max_bucket=5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    # identical docs: every candidate verifies at jaccard 1.0, so the
    # verified set IS the candidate set — which the pure-python mirror of
    # the salted two-level chunking reproduces pair-for-pair (identical
    # signatures ⇒ identical bucket membership every band, and the
    # assignment depends only on the id)
    cluster_pairs = {p for p in pairs if p[0] < 1000 and p[1] < 1000}
    assert cluster_pairs == _expected_capped_pairs(list(range(n)), B=5)
    assert all(r["jaccard"] == 1.0 for r in got if r["id_a"] < 1000)
    # vastly below the uncapped quadratic blow-up
    assert len(cluster_pairs) < n * (n - 1) / 2 / 10
    comps = _union_find_components(cluster_pairs)
    assert len(comps) == 1 and comps[0] == set(range(n))
    # the unrelated docs never entangle with the super-cluster
    assert not any((a < 1000) != (b < 1000) for a, b in pairs)


def test_bucket_cap_deterministic(spark):
    n = 25
    rows = [(i, BASE) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(map(tuple, D.minhash_lsh_pairs(docs, min_jaccard=0.5, max_bucket=4).collect()))
    two = sorted(map(tuple, D.minhash_lsh_pairs(docs, min_jaccard=0.5, max_bucket=4).collect()))
    assert one == two and one


def test_prefix_cap_noop_on_benign_corpus(spark):
    """With every prefix-token bucket under the cap, capped output ==
    uncapped output exactly (the cap must not change semantics until it
    has to) — the equivalence that justifies the catalog query's cap."""
    docs = _docs(spark)
    for t in (0.3, 0.5, 0.9):
        base = sorted(
            map(tuple, D.jaccard_prefix_pairs(docs, min_jaccard=t).collect())
        )
        capped = sorted(
            map(
                tuple,
                D.jaccard_prefix_pairs(
                    docs, min_jaccard=t, max_bucket=10
                ).collect(),
            )
        )
        assert capped == base, t


def test_prefix_cap_bounds_hot_token_bucket_and_keeps_it_connected(spark):
    """The adversarial shape the shuffle audit flagged (exponent 1.62):
    N near-identical docs put all N into every shared prefix token's
    bucket — C(N,2) candidates uncapped. With max_bucket=B the cluster's
    verified pairs must be O(N*B) while still forming ONE component."""
    n = 60
    rows = [(i, BASE) for i in range(n)] + [(1000, FAR), (1001, FAR + " extra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = D.jaccard_prefix_pairs(docs, min_jaccard=0.5, max_bucket=5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    cluster_pairs = {p for p in pairs if p[0] < 1000 and p[1] < 1000}
    # identical docs ⇒ identical salted chunking in every prefix token's
    # bucket — the pure-python mirror reproduces the set pair-for-pair
    assert cluster_pairs == _expected_capped_pairs(list(range(n)), B=5)
    assert all(r["jaccard"] == 1.0 for r in got if r["id_a"] < 1000)
    assert len(cluster_pairs) < n * (n - 1) / 2 / 10  # ≪ quadratic
    comps = _union_find_components(cluster_pairs)
    assert len(comps) == 1 and comps[0] == set(range(n))
    assert not any((a < 1000) != (b < 1000) for a, b in pairs)


def test_salted_chunks_bounds_task_input_on_100k_bucket(spark):
    """The round-7 verdict's adversarial shape: ONE bucket of 10^5 docs.
    The old single-level chunking bounded the cap's OUTPUT but the
    row_number window still sorted all 10^5 rows in one task; the salted
    two-level assignment must bound the INPUT too — no (bucket, sub)
    window partition sees more than ~n/N_SALT rows — while the chain
    families keep the whole bucket one connected component."""
    import pyspark.sql.functions as F

    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("hot").alias("bk")
    )
    chunked = D._salted_chunks(df, ["bk"], "doc_id", max_bucket=64)
    rows = chunked.collect()
    assert len(rows) == n
    # bounded window input: the biggest (bucket, sub) partition is ~n/16
    from collections import Counter

    per_sub = Counter(r["sub"] for r in rows)
    assert len(per_sub) == D.N_SALT
    assert max(per_sub.values()) < 2 * n / D.N_SALT  # uniform hash + slack
    # structure: ≤64-doc chunks, one head per chunk, one first per sub
    per_chunk = Counter((r["sub"], r["chunk"]) for r in rows)
    assert max(per_chunk.values()) <= 64
    heads = [(r["sub"], r["chunk"]) for r in rows if r["is_head"]]
    assert sorted(heads) == sorted(per_chunk)  # exactly one head per chunk
    assert sum(r["is_first"] for r in rows) == D.N_SALT
    # connectivity: within-chunk pairs connect each chunk internally, so
    # union-find over (sub, chunk) nodes + the chain edges must give ONE
    # component covering every chunk
    node = {r["doc_id"]: (r["sub"], r["chunk"]) for r in rows}
    chain = D._chain_edges(chunked, ["bk"], "doc_id").collect()
    # chain volume is O(n/B + N_SALT), not O(n)
    assert len(chain) <= len(per_chunk) + D.N_SALT
    edges = {(node[r["id_a"]], node[r["id_b"]]) for r in chain}
    comps = _union_find_components(edges | {(c, c) for c in per_chunk})
    assert len(comps) == 1 and comps[0] == set(per_chunk)


def test_prefix_cap_deterministic(spark):
    n = 25
    rows = [(i, BASE) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(
        map(
            tuple,
            D.jaccard_prefix_pairs(docs, min_jaccard=0.5, max_bucket=4).collect(),
        )
    )
    two = sorted(
        map(
            tuple,
            D.jaccard_prefix_pairs(docs, min_jaccard=0.5, max_bucket=4).collect(),
        )
    )
    assert one == two and one


def test_salted_chunks_cap_boundary(spark):
    """The salt gate is exact at the boundary: a bucket of B docs keeps
    sub=0 / one chunk (strict noop shape); B+1 docs salt across
    sub-buckets. Checked at B-1, B, B+1."""
    import pyspark.sql.functions as F

    B = 8
    for n, expect_salted in ((B - 1, False), (B, False), (B + 1, True)):
        df = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit("k").alias("bk")
        )
        rows = D._salted_chunks(df, ["bk"], "doc_id", max_bucket=B).collect()
        subs = {r["sub"] for r in rows}
        chunks = {(r["sub"], r["chunk"]) for r in rows}
        if expect_salted:
            assert len(subs) > 1, n  # 9 ids over 16 sub-buckets: spread
        else:
            assert subs == {0} and chunks == {(0, 0)}, n


def test_minhash_signature_profile_keeps_empty_docs(spark, tmp_path):
    """The r13 explode+min-agg rewrite of docs_minhash_signature_profile
    must keep EVERY document row — including NULL-text, whitespace-only and
    single-token docs — with the expression form's exact output:
    (n_shingles=0, minhash_0=NULL) for empty shingle sets, the single
    whole-text shingle for 0 < n_tokens < k, and the distinct-shingle count
    + lexicographic-min md5 otherwise."""
    import hashlib

    import pyspark.sql.functions as F

    from data_engineering_project_spark.plans.dedup_queries import (
        docs_minhash_signature_profile,
    )

    rows = [
        (0, "a b c d"),          # 2 distinct 3-shingles
        (1, "a b c a b c a b c"),  # repeats dedup to distinct shingles
        (2, "one two"),          # shorter than k: one whole-text shingle
        (3, "   "),              # whitespace-only: one empty-token shingle
        (4, None),               # NULL text: empty shingle set
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["minhash_0"])
        for r in docs_minhash_signature_profile(spark, str(tmp_path)).collect()
    }

    def m(s):
        return hashlib.md5(("0:" + s).encode()).hexdigest()

    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0] == (2, min(m("a b c"), m("b c d")))
    assert got[1] == (3, min(m("a b c"), m("b c a"), m("c a b")))
    assert got[2] == (1, m("one two"))
    # whitespace-only text tokenizes to one empty token -> the whole-text
    # shingle is '' (verified identical to the replaced expression form)
    assert got[3] == (1, m(""))
    assert got[4] == (0, None)
