"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as `binary`
columns beside typed metadata, processed by Arrow-batched Python
(`mapInPandas`) because media codecs don't exist as Spark expressions. This
module makes the Spark-side plumbing real — schemas, batch iteration,
partition sizing — while the codec itself is stubbed (no media libraries in
this environment): `decode_image_meta` uses a deterministic fake decoder and
raises `NotImplementedError` from the real-codec hook.

Plumbing rules encoded here:
- binary payloads ride along untouched until the UDF that needs them —
  column pruning keeps them out of every other operator's shuffle
- mapInPandas streams Arrow batches: peak executor memory is
  O(batch bytes), not O(partition bytes) — set
  `spark.sql.execution.arrow.maxRecordsPerBatch` by payload size
- output schemas are explicit StructTypes: never inferred from Python
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: utf-8 bytes of a text column as the opaque `binary`
    (stands in for image bytes; the pipeline shape is identical)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _real_decode(payload: bytes) -> tuple[int, int, int]:
    """Real image codec hook: decodes with PIL when it is importable
    (optional dependency — not shipped in this container), else raises.
    Deployments with other codecs (libvips, torchvision.io) override this
    function; the contract is payload bytes → (width, height, channels)."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "media codecs are not installed; deployments plug PIL/libvips here"
        ) from exc
    import io

    with Image.open(io.BytesIO(bytes(payload))) as im:
        return (im.width, im.height, len(im.getbands()))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in: dimensions derived from payload length so
    tests and oracles can verify the plumbing end-to-end."""
    n = len(payload)
    return (64 + n % 577, 64 + (n * 31) % 577, 3)


def decode_image_meta(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_codec: bool = False,
) -> DataFrame:
    """binary payload → (id, n_bytes, md5 checksum, width, height, channels)
    via mapInPandas. The iterator-of-batches shape is the real contract: each
    Arrow batch decodes independently, so executor memory stays bounded
    regardless of partition size."""
    # NOTE: the decoder is re-bound to a local closure so cloudpickle
    # serializes the UDF BY VALUE — the external driver's Python workers
    # don't have this package on sys.path, so a by-reference pickle of a
    # module-level function would raise ModuleNotFoundError on executors.
    if use_real_codec:
        # closure clone of _real_decode (see NOTE above on by-value pickling)
        def decode(payload: bytes) -> tuple[int, int, int]:
            try:
                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "media codecs are not installed; deployments plug "
                    "PIL/libvips here"
                ) from exc
            import io

            with Image.open(io.BytesIO(bytes(payload))) as im:
                return (im.width, im.height, len(im.getbands()))
    else:
        def decode(payload: bytes) -> tuple[int, int, int]:
            n = len(payload)
            return (64 + n % 577, 64 + (n * 31) % 577, 3)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf[payload_col]
            # NULL payloads (corrupt/fuzzed rows) yield an all-NULL meta
            # row — the oracle's md5(NULL)/strlen(NULL) — never a kernel
            # crash that kills the task (null-fuzz sweep finding)
            dims = [decode(p) if p is not None else (None,) * 3 for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(
                        [len(p) if p is not None else None for p in payloads],
                        dtype="object",
                    ),
                    "checksum": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "width": pd.Series([d[0] for d in dims], dtype="object"),
                    "height": pd.Series([d[1] for d in dims], dtype="object"),
                    "channels": pd.Series([d[2] for d in dims], dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 128,
    stride: int = 2,
) -> DataFrame:
    """Video-style frame sampling over an opaque binary payload: split into
    fixed-size frames, keep every ``stride``-th, emit one row per sampled
    frame (the 1→N flat-map shape real frame extractors need). Executor
    memory is O(one Arrow batch); the exploded rows never pass through the
    driver. A real video codec replaces the byte-slicing with keyframe
    decode at the same interface.

    Frame checksums are md5 over the frame's UPPERCASE HEX ENCODING (not
    the raw bytes): the DuckDB oracle has no BLOB substring or BLOB md5,
    so byte-true restatement routes every slice through hex() — which
    Spark, DuckDB, and bytes.hex().upper() render identically (r10
    hostile-string sweep, byte-vs-char recipe)."""

    # self-contained closure: pickled by value so the external driver's
    # workers don't need this package on sys.path (see decode_image_meta)
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            ids, idxs, offs, lens, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # oracle: range over NULL -> no frames
                    continue
                n = len(payload)
                n_frames = max(1, -(-n // frame_bytes))
                for i in range(0, n_frames, stride):
                    chunk = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * frame_bytes)
                    lens.append(len(chunk))
                    sums.append(hashlib.md5(bytes(chunk).hex().upper().encode("ascii")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

#: order of the character-class ratio features emitted by extract_features
FEATURE_NAMES = ("vowel_ratio", "digit_ratio", "space_ratio", "upper_ratio")


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature extraction over binary payloads → fixed-dim double vector
    (here: byte-class frequency ratios; a real featurizer — CLIP embedding,
    MFCC, perceptual hash — slots into the same mapInPandas contract and
    output schema). Count/total ratios are exact integer divisions, so the
    values are engine-reproducible bit-for-bit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vowels = frozenset(b"aeiou")
        digits = frozenset(b"0123456789")
        uppers = frozenset(range(ord("A"), ord("Z") + 1))

        for pdf in it:
            ids, feats = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # oracle: NULL ratios row
                    ids.append(doc_id)
                    feats.append(None)
                    continue
                n = len(payload) or 1
                low = payload.lower()
                ids.append(doc_id)
                feats.append(
                    [
                        sum(b in vowels for b in low) / n,
                        sum(b in digits for b in payload) / n,
                        payload.count(b" ") / n,
                        sum(b in uppers for b in payload) / n,
                    ]
                )
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "features": feats})

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_checksum", T.StringType()),
    ]
)


def resize_payload(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_bytes: int = 96,
) -> DataFrame:
    """Resize stub with real plumbing: strided byte downsampling — keep
    every ceil(n/target)-th byte so the output is ≤ ``target_bytes`` — the
    exact access pattern of nearest-neighbor image downsampling (a real
    codec resize plugs into the same mapInPandas contract and schema).
    Deterministic, so the oracle can restate the stride arithmetic and the
    output checksums verify the resampled bytes end-to-end. Checksums are
    md5 over the resampled bytes' UPPERCASE HEX (see sample_frames — the
    byte-true-oracle contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            ids, orig, rb, cs = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc_id)
                if payload is None:  # oracle: NULL strlen/substr/md5 row
                    orig.append(None)
                    rb.append(None)
                    cs.append(None)
                    continue
                n = len(payload)
                stride = max(1, -(-n // target_bytes))
                resized = payload[::stride]
                orig.append(n)
                rb.append(len(resized))
                cs.append(hashlib.md5(bytes(resized).hex().upper().encode("ascii")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "orig_bytes": pd.Series(orig, dtype="object"),
                    "resized_bytes": pd.Series(rb, dtype="object"),
                    "resized_checksum": pd.Series(cs, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("start_ms", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("chunk_checksum", T.StringType()),
    ]
)


def chunk_audio(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_rate: int = 8000,
    bytes_per_sample: int = 2,
    chunk_ms: int = 4,
    hop_ms: int = 2,
) -> DataFrame:
    """Audio-style fixed-rate chunking with overlap: the payload is
    interpreted as mono PCM at ``sample_rate`` Hz / ``bytes_per_sample``,
    cut into ``chunk_ms`` windows every ``hop_ms`` (hop < chunk ⇒
    overlapping windows, the STFT/feature-extraction front-end shape).
    Emits one row per window with its start time, sample count, and an
    MD5 over the window's raw bytes — proving the exact byte ranges
    crossed the Arrow boundary. Differs from ``sample_frames`` in
    TIME-based addressing and overlap; a real audio decoder (soundfile /
    torchaudio) replaces the byte slicing at the same interface.

    Trailing partial windows are kept (fewer samples); a trailing odd
    byte is checksummed but not counted as a sample. Checksums are md5
    over the window bytes' UPPERCASE HEX (see sample_frames — the
    byte-true-oracle contract).
    """
    chunk_bytes = sample_rate * chunk_ms // 1000 * bytes_per_sample
    hop_bytes = sample_rate * hop_ms // 1000 * bytes_per_sample

    # self-contained closure: pickled by value (see decode_image_meta)
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            ids, idxs, starts, counts, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # oracle: range over NULL -> no chunks
                    continue
                n = len(payload)
                i = 0
                while i * hop_bytes < n:
                    window = payload[i * hop_bytes : i * hop_bytes + chunk_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(i * hop_ms)
                    counts.append(len(window) // bytes_per_sample)
                    sums.append(hashlib.md5(bytes(window).hex().upper().encode("ascii")).hexdigest())
                    i += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "start_ms": pd.Series(starts, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int32"),
                    "chunk_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_CHUNK_SCHEMA)


INTENSITY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("intensity", T.DoubleType()),
    ]
)


def frame_intensity(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 128,
) -> DataFrame:
    """Per-frame mean byte value ("luminance" proxy) over EVERY fixed-size
    frame of a binary payload — the feature a scene-cut detector compares
    between consecutive frames. numpy ``frombuffer`` + vectorized mean per
    frame; a real decoder would emit per-keyframe luma at the same
    interface. Exactness: the mean is an integer byte sum divided by the
    frame length — both operands are exact, so every engine computing the
    same division produces bit-identical doubles (no rounding needed
    downstream)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # oracle: range over NULL -> no frames
                    continue
                buf = np.frombuffer(payload, dtype=np.uint8)
                n = len(buf)
                n_frames = max(1, -(-n // frame_bytes))
                for i in range(n_frames):
                    chunk = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    vals.append(
                        float(chunk.sum(dtype=np.int64)) / max(1, len(chunk))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "intensity": pd.Series(vals, dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, INTENSITY_SCHEMA)
