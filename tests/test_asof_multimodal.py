"""Unit tests: as-of join, sessionization, and multimodal operators.

Hand-computed golden values on tiny in-memory frames — the operator-level
complement to the DuckDB oracle parity tests (SURVEY.md §5 test strategy:
(a) operator unit tests + (b) golden values + (c) oracle harness).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from data_engineering_project_spark.operators.asof import asof_join, sessionize
from data_engineering_project_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_meta,
    extract_features,
    sample_frames,
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2022, 5, 26, h, m)


class TestAsofJoin:
    def test_matches_latest_at_or_before(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(10), 100.0), (1, _ts(12), 200.0), (2, _ts(11), 300.0)],
            "k long, t timestamp, v double",
        )
        right = spark.createDataFrame(
            [(1, _ts(11)), (1, _ts(13)), (2, _ts(10))],
            "k long, rt timestamp",
        )
        out = asof_join(
            left, right, on="k", left_time="t", right_time="rt", carry=["v"]
        )
        rows = {(r.k, r.rt): (r.asof_t, r.asof_v) for r in out.collect()}
        # right@11 sees left@10; right@13 sees left@12
        assert rows[(1, _ts(11))] == (_ts(10), 100.0)
        assert rows[(1, _ts(13))] == (_ts(12), 200.0)
        # right@10 for key 2: left@11 is in the future -> nulls
        assert rows[(2, _ts(10))] == (None, None)

    def test_equal_timestamps_are_inclusive(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(10), 1.0)], "k long, t timestamp, v double"
        )
        right = spark.createDataFrame([(1, _ts(10))], "k long, rt timestamp")
        out = asof_join(
            left, right, on="k", left_time="t", right_time="rt", carry=["v"]
        ).collect()
        assert out[0].asof_v == 1.0  # at-or-before: ties match

    def test_right_columns_survive_untouched(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(9), 5.0)], "k long, t timestamp, v double"
        )
        right = spark.createDataFrame(
            [(1, _ts(10), "payload")], "k long, rt timestamp, tag string"
        )
        out = asof_join(
            left, right, on="k", left_time="t", right_time="rt", carry=["v"]
        )
        assert set(out.columns) == {"k", "rt", "tag", "asof_t", "asof_v"}
        assert out.collect()[0].tag == "payload"


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        ev = spark.createDataFrame(
            [
                (1, _ts(10, 0), 1),
                (1, _ts(10, 20), 2),   # within 30 min -> same session
                (1, _ts(11, 10), 3),   # 50 min gap -> new session
                (2, _ts(10, 0), 4),    # other key -> its own session 1
            ],
            "user long, t timestamp, eid long",
        )
        out = sessionize(ev, key="user", time_col="t", gap="30 minutes")
        sess = {r.eid: r.session_id for r in out.collect()}
        assert sess[1] == sess[2] == 1
        assert sess[3] == 2
        assert sess[4] == 1

    def test_exact_gap_boundary_starts_new_session(self, spark):
        # >= comparison: an event at exactly prev + gap starts a NEW session,
        # matching the streaming twin F.session_window (window [event,
        # event + gap) — the boundary instant is outside it); one instant
        # earlier stays in-session
        ev = spark.createDataFrame(
            [(1, _ts(10, 0), 1), (1, _ts(10, 30), 2), (2, _ts(10, 0), 3),
             (2, _ts(10, 29), 4)],
            "user long, t timestamp, eid long",
        )
        out = sessionize(ev, key="user", time_col="t", gap="30 minutes")
        sess = {r.eid: r.session_id for r in out.collect()}
        assert sess[1] == 1 and sess[2] == 2  # exact gap -> split
        assert sess[3] == sess[4] == 1  # inside the gap -> same session


class TestMultimodal:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_decode_meta_golden(self, spark):
        text = "a" * 100
        out = decode_image_meta(
            attach_binary_payload(self._docs(spark, [text]))
        ).collect()[0]
        assert out.n_bytes == 100
        assert out.checksum == hashlib.md5(text.encode()).hexdigest()
        assert (out.width, out.height, out.channels) == (
            64 + 100 % 577,
            64 + (100 * 31) % 577,
            3,
        )

    def test_frame_sampling_counts_and_checksums(self, spark):
        text = "x" * 300  # 3 frames of 128 -> sampled idx 0, 2
        out = sample_frames(
            attach_binary_payload(self._docs(spark, [text])),
            frame_bytes=128,
            stride=2,
        ).collect()
        by_idx = {r.frame_idx: r for r in out}
        assert sorted(by_idx) == [0, 2]
        assert by_idx[0].frame_len == 128 and by_idx[0].frame_offset == 0
        assert by_idx[2].frame_len == 300 - 256 and by_idx[2].frame_offset == 256
        assert (
            by_idx[2].frame_checksum
            == hashlib.md5(text.encode()[256:].hex().upper().encode()).hexdigest()
        )

    def test_frame_sampling_short_payload_yields_one_frame(self, spark):
        out = sample_frames(
            attach_binary_payload(self._docs(spark, ["tiny"]))
        ).collect()
        assert len(out) == 1
        assert out[0].frame_idx == 0 and out[0].frame_len == 4

    def test_audio_chunking_overlap_and_tail(self, spark):
        from data_engineering_project_spark.operators.multimodal import chunk_audio

        text = "y" * 100  # 64-byte windows every 32 bytes -> starts 0,32,64,96
        out = chunk_audio(
            attach_binary_payload(self._docs(spark, [text]))
        ).collect()
        by_idx = {r.chunk_idx: r for r in out}
        assert sorted(by_idx) == [0, 1, 2, 3]
        # 4ms window / 2ms hop at 8kHz,16-bit: start_ms = idx*2
        assert [by_idx[i].start_ms for i in range(4)] == [0, 2, 4, 6]
        # full windows hold 32 samples; the tail (100-96=4 bytes) holds 2
        assert [by_idx[i].n_samples for i in range(4)] == [32, 32, 18, 2]
        payload = text.encode()
        assert (
            by_idx[1].chunk_checksum
            == hashlib.md5(payload[32:96].hex().upper().encode()).hexdigest()
        )
        assert (
            by_idx[3].chunk_checksum
            == hashlib.md5(payload[96:].hex().upper().encode()).hexdigest()
        )

    def test_feature_ratios_golden(self, spark):
        text = "Ab 12"  # 5 bytes: 1 vowel(a), 2 digits, 1 space, 1 upper
        feats = extract_features(
            attach_binary_payload(self._docs(spark, [text]))
        ).collect()[0].features
        assert feats == [1 / 5, 2 / 5, 1 / 5, 1 / 5]

    def test_payload_column_pruned_from_meta_output(self, spark):
        out = decode_image_meta(attach_binary_payload(self._docs(spark, ["abc"])))
        assert "payload" not in out.columns


class TestSaltedAggregate:
    def test_matches_plain_groupby(self, spark, sf_dir):
        from data_engineering_project_spark.operators.skew import salted_aggregate
        from data_engineering_project_spark.sources.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        salted = salted_aggregate(
            ev,
            ["event_type"],
            [
                ("count", "*", "n"),
                ("min", "value", "min_v"),
                ("max", "value", "max_v"),
                ("avg", "user_id", "avg_uid"),
            ],
            n_salt=8,
        )
        plain = ev.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.avg("user_id").alias("avg_uid"),
        )
        s = {r.event_type: r for r in salted.collect()}
        p = {r.event_type: r for r in plain.collect()}
        assert set(s) == set(p)
        for k in p:
            assert s[k].n == p[k].n
            assert s[k].min_v == p[k].min_v
            assert s[k].max_v == p[k].max_v
            assert abs(s[k].avg_uid - p[k].avg_uid) < 1e-9

    def test_rejects_non_decomposable(self, spark):
        import pytest

        from data_engineering_project_spark.operators.skew import salted_aggregate

        df = spark.range(10).withColumn("k", F.lit("a"))
        with pytest.raises(ValueError, match="not salt-decomposable"):
            salted_aggregate(df, ["k"], [("median", "id", "m")])


class TestVectorizedLsh:
    def test_matches_expression_buckets(self, spark, sf_dir):
        """The numpy matmul path must assign exactly the buckets the
        bit-exact expression path does on the real vectors."""
        from pyspark.sql import functions as F

        from data_engineering_project_spark.operators.similarity import (
            lsh_bucket,
            lsh_buckets_vectorized,
        )
        from data_engineering_project_spark.sources.tables import load_table

        e = load_table(spark, sf_dir, "embeddings")
        expr_side = {
            r["vec_id"]: r["bucket"]
            for r in e.select(
                "vec_id",
                lsh_bucket(F.col("embedding"), 64, n_planes=12, seed=42).alias(
                    "bucket"
                ),
            ).collect()
        }
        vec_side = {
            r["vec_id"]: r["bucket"]
            for r in lsh_buckets_vectorized(
                e, dim=64, n_planes=12, seed=42
            ).collect()
        }
        assert expr_side == vec_side


class TestConnectedComponents:
    def test_chain_and_island_and_singleton_edge(self, spark):
        from data_engineering_project_spark.operators.components import (
            connected_components,
        )

        # chain 1-2-3-4 (diameter 3, needs >1 round), island 10-11, pair 20-21
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "src long, dst long"
        )
        comp = {
            r["node"]: r["component"]
            for r in connected_components(edges, max_iter=10).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    def test_nonconvergence_raises(self, spark):
        import pytest

        from data_engineering_project_spark.operators.components import (
            connected_components,
        )

        # a 6-chain cannot converge in 1 round of min-propagation; with the
        # star-contraction fallback disabled the round cap stays loud
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="no convergence"):
            connected_components(edges, max_iter=1, fallback_to_star=False)


class TestDeterministicSampling:
    def test_monotone_nesting_and_reproducibility(self, spark, sf_dir):
        from data_engineering_project_spark.operators.sampling import (
            deterministic_sample,
        )
        from data_engineering_project_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        s10 = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.10).select("doc_id").collect()}
        s20 = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.20).select("doc_id").collect()}
        s20_again = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.20).select("doc_id").collect()}
        assert s10 <= s20              # monotone: smaller sample nests
        assert s20 == s20_again        # reproducible across evaluations
        n = d.count()
        assert 0.1 * n <= len(s20) <= 0.3 * n   # roughly the asked rate

    def test_salt_draws_independent_sample(self, spark, sf_dir):
        from data_engineering_project_spark.operators.sampling import (
            deterministic_sample,
        )
        from data_engineering_project_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        a = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.20, salt="a").select("doc_id").collect()}
        b = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.20, salt="b").select("doc_id").collect()}
        assert a != b

    def test_stratified_rates(self, spark, sf_dir):
        from data_engineering_project_spark.operators.sampling import (
            stratified_deterministic_sample,
        )
        from data_engineering_project_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        kept = stratified_deterministic_sample(
            d, "doc_id", "lang", {"en": 0.0}, default_fraction=1.0
        )
        langs = {r.lang for r in kept.select("lang").distinct().collect()}
        assert "en" not in langs and len(langs) >= 2


def test_real_codec_hook_decodes_png_when_pil_available(spark):
    """VERDICT r2 #8: prove the real-codec plug-in contract whenever the
    optional dependency is importable — generated PNGs flow through
    decode_image_meta(use_real_codec=True) and come back with their true
    dimensions. Skips (not passes vacuously) where PIL is absent."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from data_engineering_project_spark.operators.multimodal import (
        _real_decode,
        decode_image_meta,
    )

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (200, 10, 10)).save(buf, format="PNG")
        return buf.getvalue()

    # the hook directly
    assert _real_decode(png_bytes(17, 5)) == (17, 5, 3)

    rows = [(1, bytearray(png_bytes(32, 8))), (2, bytearray(png_bytes(3, 300)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["channels"])
        for r in decode_image_meta(df, use_real_codec=True).collect()
    }
    assert got == {1: (32, 8, 3), 2: (3, 300, 3)}
