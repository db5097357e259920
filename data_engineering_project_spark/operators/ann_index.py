"""Persisted IVF index over the snapshot-table format: build once, query many.

The catalog's ANN queries (``emb_ivf_topk``, ``emb_pq_topk``, …) fit their
coarse quantizer inside the query — correct for a driver-hashable one-shot,
wrong as the production serving pattern: at corpus scale the fit is a batch
job and queries must touch only the probed cells' FILES, not re-cluster the
corpus. This module is that serving path, composed from pieces that already
exist:

- **build_ivf_index**: quantized Lloyd fit (``operators/clustering._lloyd``)
  → every vector assigned to its cell → ``(vec_id, cell, q)`` written
  range-partitioned by ``cell`` into a snapshot table with per-file
  ``cell`` min/max stats, so each data file covers one (or few) cells and
  ``read_pruned(cell, c, c)`` touches only that cell's files — partition
  pruning from footer stats, no metastore. The k centroids persist in a
  tiny side table (``<table>__centroids``, k rows), overwritten atomically
  with each rebuild.
- **query_ivf_index**: rank cells driver-side against the k stored
  centroids (k×dim floats — the same bounded state MLlib keeps), read ONLY
  the ``nprobe`` winning cells via manifest pruning, score in-cell with the
  Arrow-vectorized cosine scorer. Cost per query: k-row centroid read +
  nprobe cell file scans; the corpus is never touched.
- **append_to_ivf_index**: assign new vectors with the SAME stored
  centroids (an IVF index absorbs inserts without refit; recall decays only
  as the data distribution drifts — rebuild cadence is the operational
  knob, measurable in-engine exactly as ``emb_ivf_recall`` does) and
  ``merge_upsert`` by id, so redelivered ids replace instead of duplicate —
  the exactly-once contract every other sink in this repo honors.

Cosine on the quantized vectors equals cosine on the originals up to the
quantization round (scale cancels in the ratio); the index stores the
quantized form because integer cells/sums are what keep build determinism
partition-independent (see operators/clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.clustering import (
    _assign,
    _lloyd,
    quantize_vec,
)
from data_engineering_project_spark.operators.similarity import (
    score_cosine_vectorized,
)
from data_engineering_project_spark.sinks import snapshot_table as snap


def _centroid_table(table: str) -> str:
    return table.rstrip("/") + "__centroids"


def build_ivf_index(
    emb: DataFrame,
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 1000,
) -> None:
    """Fit the coarse quantizer and materialize the cell-clustered index."""
    spark = emb.sparkSession
    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        quantize_vec(F.col(vec_col), scale).alias("q"),
    ).persist()
    try:
        assigned, centroids = _lloyd(pts, k, n_iter)
        if assigned is None:
            raise ValueError("build_ivf_index: empty embedding frame")
        rows = [(cid, centroids[cid]) for cid in sorted(centroids)]
        cdf = spark.createDataFrame(rows, "cell int, centroid array<double>")
        # data files range-partitioned by cell: one file ≈ one cell, so the
        # manifest's per-file [min,max] prunes a probe to its cell's files
        data = assigned.select(
            "vec_id", F.col("cluster").alias("cell"), "q"
        ).repartitionByRange(len(centroids), "cell")
        snap.write_table(data, table, mode="overwrite", stats_cols=["cell"])
        snap.write_table(cdf, _centroid_table(table), mode="overwrite")
    finally:
        pts.unpersist()


def _load_centroids(spark: SparkSession, table: str) -> dict[int, list[float]]:
    rows = snap.read_table(spark, _centroid_table(table)).collect()
    return {r["cell"]: [float(v) for v in r["centroid"]] for r in rows}


def query_ivf_index(
    spark: SparkSession,
    table: str,
    query_vec: list[float],
    *,
    k: int = 10,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Top-k cosine neighbors reading only the ``nprobe`` probed cells.

    Cell ranking happens driver-side over the k stored centroids (same L2
    metric the build's Lloyd assignment used, quantized units on both
    sides); ties break toward the smaller cell id, mirroring ``_assign``."""
    centroids = _load_centroids(spark, table)
    qq = [float(round(float(v) * scale)) for v in query_vec]
    ranked = sorted(
        (sum((a - b) ** 2 for a, b in zip(qq, c)), cid)
        for cid, c in centroids.items()
    )
    probed = [cid for _, cid in ranked[:nprobe]]
    parts = [
        snap.read_pruned(spark, table, "cell", c, c).filter(F.col("cell") == c)
        for c in probed
    ]
    cells = parts[0]
    for p in parts[1:]:
        cells = cells.unionByName(p)
    with_q = cells.withColumn("qe", F.array(*[F.lit(v) for v in qq]))
    scored = score_cosine_vectorized(
        with_q, vec_col="q", query_vec_col="qe", keep_cols=("vec_id", "cell")
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cell", F.round("cosine", 6).alias("cosine"))
    )


def append_to_ivf_index(
    emb_new: DataFrame,
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> None:
    """Absorb new vectors without a refit: assign against the stored
    centroids, merge by id (redelivery replaces, never duplicates)."""
    spark = emb_new.sparkSession
    centroids = _load_centroids(spark, table)
    pts = emb_new.select(
        F.col(id_col).alias("vec_id"),
        quantize_vec(F.col(vec_col), scale).alias("q"),
    )
    updates = _assign(pts, centroids).select(
        "vec_id", F.col("cluster").alias("cell"), "q"
    )
    snap.merge_upsert(spark, table, updates, ["vec_id"], stats_cols=["cell"])


def ivf_index_recall(
    spark: SparkSession,
    table: str,
    query_vecs: list[list[float]],
    *,
    k: int = 10,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """In-engine recall@k of the probed search against brute force over the
    SAME index contents — the operational monitor for append-without-refit:
    as appended data drifts away from the stored centroids, this number
    decays and tells the pipeline when a rebuild is due (the persisted-index
    analog of the catalog's ``emb_ivf_recall``).

    ``query_vecs`` is a bounded evaluation sample (tens, not the corpus):
    each query costs one full map-only scan (brute force) plus one probed
    read — O(sample · index), driver state O(k) per query."""
    if not query_vecs:
        raise ValueError("ivf_index_recall: empty query sample")
    hits = total = 0
    for qv in query_vecs:
        qq = [float(round(float(v) * scale)) for v in qv]
        full = snap.read_table(spark, table).withColumn(
            "qe", F.array(*[F.lit(v) for v in qq])
        )
        exact = {
            r["vec_id"]
            for r in score_cosine_vectorized(
                full, vec_col="q", query_vec_col="qe", keep_cols=("vec_id",)
            )
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k)
            .collect()
        }
        approx = {
            r["vec_id"]
            for r in query_ivf_index(
                spark, table, qv, k=k, nprobe=nprobe, scale=scale
            ).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    return spark.createDataFrame(
        [(len(query_vecs), k, nprobe, round(hits / total, 6))],
        "n_queries int, k int, nprobe int, recall double",
    )
