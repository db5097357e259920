"""Streaming incremental connected components (round-5 verdict item #4):
the dedup manifest is MAINTAINED per ingest batch in the snapshot-table
state store — new pairs union prior assignments, only touched components
re-converge, replayed batches are no-ops.

The load-bearing property: after any batch sequence, the incremental state
equals batch connected_components over the UNION of all pairs ever seen.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_engineering_project_spark.operators.components import (
    connected_components,
)
from data_engineering_project_spark.sinks import snapshot_table as st
from data_engineering_project_spark.streaming.pipeline import (
    read_dedup_manifest,
    upsert_components_incremental,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _state(spark, table):
    return {
        r["node"]: r["component"]
        for r in st.read_table(spark, table).collect()
    }


def _batch_cc(spark, all_rows):
    if not all_rows:
        return {}
    comp = connected_components(_pairs(spark, all_rows), src="id_a", dst="id_b")
    return {r["node"]: r["component"] for r in comp.collect()}


def test_incremental_matches_batch_over_merge_chain(spark, tmp_path):
    """Three batches that (a) create clusters, (b) merge two existing
    clusters through a bridge pair, (c) attach a new node with a SMALLER id
    than the existing component label — forcing a relabel of prior members."""
    table = str(tmp_path / "cc")
    write = upsert_components_incremental(table)

    batches = [
        [(10, 20), (30, 40)],   # two clusters: {10,20}->10, {30,40}->30
        [(20, 30)],             # bridge: all four -> 10
        [(5, 40)],              # new node 5 < 10: whole cluster relabels to 5
    ]
    seen: list[tuple[int, int]] = []
    for i, rows in enumerate(batches):
        write(_pairs(spark, rows), i)
        seen += rows
        assert _state(spark, table) == _batch_cc(spark, seen), f"batch {i}"

    final = _state(spark, table)
    assert final == {5: 5, 10: 5, 20: 5, 30: 5, 40: 5}


def test_replayed_batch_is_a_noop_and_commits_no_version(spark, tmp_path):
    table = str(tmp_path / "cc")
    write = upsert_components_incremental(table)
    write(_pairs(spark, [(1, 2), (2, 3)]), 0)
    before_state = _state(spark, table)
    before_version = st.current_version(table)
    # crash re-delivery: same batch again — every edge collapses
    # intra-component, the writer returns before any commit
    write(_pairs(spark, [(1, 2), (2, 3)]), 0)
    assert _state(spark, table) == before_state
    assert st.current_version(table) == before_version


def test_untouched_components_are_not_rewritten(spark, tmp_path):
    """Only files containing touched nodes rewrite (merge_upsert contract):
    a batch touching cluster B must leave cluster A's rows byte-stable —
    checked via the version diff of the manifest file lists."""
    table = str(tmp_path / "cc")
    write = upsert_components_incremental(table)
    write(_pairs(spark, [(1, 2)]), 0)
    write(_pairs(spark, [(100, 200)]), 1)
    m0 = st.read_manifest(table, 0)
    m1 = st.read_manifest(table, st.current_version(table))
    # version 0's file(s) for cluster {1,2} carry over by reference
    assert set(f["path"] for f in m0.files) <= set(
        f["path"] for f in m1.files
    )
    assert _state(spark, table) == {1: 1, 2: 1, 100: 100, 200: 100}


def test_manifest_reader_equals_batch_canonical_selection(spark, tmp_path):
    from data_engineering_project_spark.operators.dedup import (
        canonical_selection,
    )

    table = str(tmp_path / "cc")
    write = upsert_components_incremental(table)
    batches = [[(1, 2), (2, 3)], [(10, 11)], [(3, 10)]]
    seen: list[tuple[int, int]] = []
    for i, rows in enumerate(batches):
        write(_pairs(spark, rows), i)
        seen += rows

    docs = spark.createDataFrame(
        [(n, 100 + (n * 37) % 50) for n in [1, 2, 3, 10, 11, 99]],
        "doc_id long, n_chars long",
    )
    inc = {
        (r["doc_id"], r["canonical_id"], r["cluster_size"])
        for r in read_dedup_manifest(spark, table, docs).collect()
    }
    ref = {
        (r["doc_id"], r["canonical_id"], r["cluster_size"])
        for r in canonical_selection(_pairs(spark, seen), docs).collect()
    }
    assert inc == ref and inc  # identical and non-trivial


def test_incremental_matches_batch_on_random_batches(spark, tmp_path):
    rng = random.Random(20260814)
    table = str(tmp_path / "cc")
    write = upsert_components_incremental(table)
    seen: list[tuple[int, int]] = []
    for i in range(4):
        rows = [
            (rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(8)
        ]
        rows = [(a, b) for a, b in rows if a != b]
        write(_pairs(spark, rows), i)
        seen += rows
    assert _state(spark, table) == _batch_cc(spark, seen)


def test_end_to_end_streaming_dedup_pipeline(spark, tmp_path):
    """The full streaming dedup composition over a 3-batch ingest:
    per batch, intra-batch MinHash pairs PLUS index-probe pairs against
    the already-ingested corpus feed the incremental component state; the
    band index and corpus grow per batch in snapshot tables. At the end
    the maintained manifest must equal the batch pipeline (full-corpus
    minhash pairing -> canonical_selection) run from scratch."""
    from data_engineering_project_spark.operators.dedup import (
        canonical_selection,
        incremental_minhash_pairs,
        minhash_band_index,
        minhash_lsh_pairs,
    )
    from data_engineering_project_spark.sinks import snapshot_table as st

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    alt = "completely different text about distributed query engines here"
    batches = [
        [(1, base), (2, alt)],
        [(3, base), (4, "novel content with no relatives in the corpus")],
        [(5, base), (6, alt + " with a tail"), (7, "lone wolf document")],
    ]
    schema = "doc_id long, text string"
    index_t = str(tmp_path / "band_index")
    corpus_t = str(tmp_path / "corpus")
    cc_t = str(tmp_path / "cc")
    write_cc = upsert_components_incremental(cc_t)
    J = 0.5

    for i, rows in enumerate(batches):
        batch = spark.createDataFrame(rows, schema)
        pairs = minhash_lsh_pairs(batch, min_jaccard=J).select(
            F.col("id_a"), F.col("id_b")
        )
        if st.current_version(index_t) is not None:
            idx = st.read_table(spark, index_t)
            corp = st.read_table(spark, corpus_t)
            cross = incremental_minhash_pairs(
                batch, corp, idx, min_jaccard=J
            ).select(
                F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b")
            )
            pairs = pairs.unionByName(cross)
        write_cc(pairs, i)
        st.write_table(minhash_band_index(batch), index_t, mode="append")
        st.write_table(batch, corpus_t, mode="append")

    corpus = spark.createDataFrame(
        [r for b in batches for r in b], schema
    ).withColumn("n_chars", F.length("text"))
    inc = {
        (r["doc_id"], r["canonical_id"], r["cluster_size"])
        for r in read_dedup_manifest(spark, cc_t, corpus).collect()
    }
    full_pairs = minhash_lsh_pairs(
        corpus.select("doc_id", "text"), min_jaccard=J
    ).select("id_a", "id_b")
    ref = {
        (r["doc_id"], r["canonical_id"], r["cluster_size"])
        for r in canonical_selection(full_pairs, corpus).collect()
    }
    assert inc == ref
    # both constructed families must actually have collapsed (the test is
    # vacuous if the fixture produced no duplicate pairs): base family
    # {1,3,5} keeps 1 (equal lengths, tie -> smallest id); alt family
    # {2,6} keeps 6 (" with a tail" makes it the longest)
    assert {d for d, _, _ in inc} == {2, 3, 5}


def test_incremental_cc_under_real_structured_streaming(spark, tmp_path):
    """Drive upsert_components_incremental through an actual readStream ->
    foreachBatch -> availableNow pipeline (not direct writer calls), across
    TWO runs sharing a checkpoint: run 2 must consume only the files run 1
    has not seen (exactly-once input), and the final state must equal batch
    connected components over every pair ever written."""
    import os
    import time as _time

    src = tmp_path / "pairs_in"
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "cc")
    src.mkdir()

    def _write_pairs(name, rows):
        spark.createDataFrame(rows, "id_a long, id_b long").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    def _run():
        stream = (
            spark.readStream.schema("id_a long, id_b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            stream.writeStream.foreachBatch(
                upsert_components_incremental(table)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1 = [(10, 20), (30, 40)]
    batch2 = [(20, 30)]
    _write_pairs("b1.parquet", batch1)
    _write_pairs("b2.parquet", batch2)
    # pin strictly increasing mtimes so per-file micro-batches order stably
    base = _time.time() - 3600
    for i, name in enumerate(sorted(os.listdir(src))):
        for f in os.listdir(src / name):
            os.utime(src / name / f, (base + 10 * i, base + 10 * i))
        os.utime(src / name, (base + 10 * i, base + 10 * i))
    _run()
    assert _state(spark, table) == _batch_cc(spark, batch1 + batch2)
    v_after_run1 = st.current_version(table)

    # run 2: only the NEW file is consumed (checkpoint excludes b1/b2);
    # node 5 < 10 relabels the whole merged cluster
    batch3 = [(5, 40)]
    _write_pairs("b3.parquet", batch3)
    _run()
    assert _state(spark, table) == {5: 5, 10: 5, 20: 5, 30: 5, 40: 5}
    # exactly-once input: exactly ONE more state version, from batch3 alone
    # (replaying b1/b2 would have been no-ops anyway — monotone labels —
    # but the checkpoint must not even re-read them)
    assert st.current_version(table) == v_after_run1 + 1


def test_manifest_deltas_compose_to_the_full_manifest(spark, tmp_path):
    """dedup_manifest_deltas: applying each version's upsert rows in order
    must reproduce the full manifest after every batch, and no doc_id ever
    needs deletion (monotone merges never un-remove a document)."""
    from data_engineering_project_spark.streaming.pipeline import (
        dedup_manifest_deltas,
    )

    table = str(tmp_path / "cc")
    write = upsert_components_incremental(table)
    docs = spark.createDataFrame(
        [(n, 100 + (n * 37) % 50) for n in range(0, 50)],
        "doc_id long, n_chars long",
    )
    batches = [
        [(1, 2), (2, 3), (10, 11)],
        [(20, 21)],
        [(3, 10)],          # merges {1,2,3} with {10,11}
        [(0, 21)],          # 0 < 20: relabels {20,21} cluster
    ]
    applied: dict[int, tuple[int, int]] = {}
    expected_versions = 0
    for i, rows in enumerate(batches):
        write(_pairs(spark, rows), i)
        v = st.current_version(table)
        assert v == expected_versions  # one state version per non-noop batch
        expected_versions += 1
        delta = {
            r["doc_id"]: (r["canonical_id"], r["cluster_size"])
            for r in dedup_manifest_deltas(spark, table, docs, version=v).collect()
        }
        # monotone: a doc never leaves the manifest
        assert set(applied) <= (set(applied) | set(delta))
        applied.update(delta)
        full = {
            r["doc_id"]: (r["canonical_id"], r["cluster_size"])
            for r in read_dedup_manifest(spark, table, docs).collect()
        }
        assert applied == full, f"after batch {i}"
    # the composed end state is non-trivial and correct: in {0,20,21} the
    # keep rule (n_chars DESC, id ASC) keeps 20 (n_chars 140 > 127 > 100)
    assert applied[21] == (20, 3) and applied[0] == (20, 3)
    assert 20 not in applied
    assert applied[2][1] == 5  # {1,2,3,10,11} merged to one 5-cluster
