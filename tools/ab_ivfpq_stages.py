"""Phase attribution for emb_ivfpq_rerank_topk (r13 verdict #3).

Replicates ivfpq_topk's internal step sequence with wall timers around
each driver-visible barrier, plus the rerank tail, in ONE fresh process
(bench session shape; untimed JVM-warm pass first so per-phase numbers
are steady-state like bench's own protocol):

    pts+cstats — quantize, persist, posexplode centroid stats collect
    qrow       — query-vector take
    res        — residual broadcast join + init TakeOrdered (materializes res)
    train      — the single recompute round's stats collect (n_iter=2)
    scan       — probed-cell code projection + TakeOrdered shortlist
    rerank     — exact cosine over the 50-candidate semi-join (noop sink)

Usage: python tools/ab_ivfpq_stages.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def run_once(spark, record: dict | None) -> None:
    import math as _math

    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators.clustering import (
        _lloyd_books_multi,
        pq_codes_arrow,
        quantize_vec,
    )
    from data_engineering_project_spark.plans import similarity_queries as SQ
    from data_engineering_project_spark.sources.tables import load_table

    dim, n_sub, k, n_iter = SQ.EMB_DIM, SQ.PQ_S, SQ.PQ_K, SQ.PQ_ITER
    sub = dim // n_sub
    nprobe, topk = SQ.IPQ_NPROBE, SQ.RERANK_SHORTLIST
    query_id = 0

    def tick(name, t0):
        if record is not None:
            record[name] = record.get(name, 0.0) + (time.perf_counter() - t0)
        return time.perf_counter()

    t0 = time.perf_counter()
    e = load_table(spark, SF_DIR, "embeddings")
    pts = (
        e.filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select(
            F.col("vec_id"),
            F.col("label").alias("cell"),
            quantize_vec(F.col("embedding"), SQ.KM_SCALE).alias("qf"),
        )
        .persist()
    )
    cstats = (
        pts.select("cell", F.posexplode("qf").alias("dim", "qv"))
        .groupBy("cell", "dim")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    t0 = tick("pts+cstats", t0)

    cent_int: dict[int, list[int]] = {}
    for r in cstats:
        cent_int.setdefault(r["cell"], [0] * dim)[r["dim"]] = int(
            _math.floor(r["s"] / r["n"] + 0.5)
        )
    qrows = pts.filter(F.col("vec_id") == query_id).take(1)
    q0 = [int(v) for v in qrows[0]["qf"]]
    t0 = tick("qrow", t0)

    probes = sorted(
        cent_int,
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(q0, cent_int[c])),
            c,
        ),
    )[:nprobe]
    cents_df = spark.createDataFrame(
        [(c, v) for c, v in sorted(cent_int.items())],
        "cell int, cvec array<bigint>",
    )
    res = (
        pts.join(F.broadcast(cents_df), "cell")
        .select(
            "vec_id",
            "cell",
            F.zip_with("qf", "cvec", lambda a, b: a - b).alias("r"),
        )
        .persist()
    )
    res.count()  # materialize the residual cache (init TakeOrdered reads it)
    t0 = tick("res", t0)

    books = _lloyd_books_multi(
        res, k=k, n_iter=n_iter, n_sub=n_sub, sub=sub, vec_col="r"
    )
    pts.unpersist()
    t0 = tick("train", t0)

    cand = pq_codes_arrow(
        res.filter(F.col("cell").isin([int(c) for c in probes]))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", "cell", "r"),
        books=books,
        sub=sub,
        vec_col="r",
    )

    def _adc_table(cell: int, s: int) -> dict[int, float]:
        rq = [q0[i] - cent_int[cell][i] for i in range(s * sub, (s + 1) * sub)]
        out = {}
        for cid in sorted(books[s]):
            acc = 0.0
            for a, b in zip(rq, books[s][cid]):
                d = a - b
                acc += d * d
            out[cid] = acc
        return out

    adc = None
    for cell in probes:
        tab = _adc_table(cell, 0)
        cell_adc = F.create_map(
            *[x for cid in sorted(tab) for x in (F.lit(cid), F.lit(tab[cid]))]
        )[F.col("c0")]
        for s in range(1, n_sub):
            tab = _adc_table(cell, s)
            cell_adc = cell_adc + F.create_map(
                *[
                    x
                    for cid in sorted(tab)
                    for x in (F.lit(cid), F.lit(tab[cid]))
                ]
            )[F.col(f"c{s}")]
        adc = (
            F.when(F.col("cell") == int(cell), cell_adc)
            if adc is None
            else adc.when(F.col("cell") == int(cell), cell_adc)
        )
    shortlist = [
        r["vec_id"]
        for r in cand.withColumn("adc", adc)
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(topk)
        .select("vec_id")
        .collect()
    ]
    res.unpersist()
    t0 = tick("scan", t0)

    import data_engineering_project_spark.operators.similarity as S

    cand_df = spark.createDataFrame([(int(v),) for v in shortlist], "vec_id long")
    base = e.filter(F.col("vec_id") != 0).join(
        F.broadcast(cand_df), "vec_id", "left_semi"
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_embedding")
    )
    top = S.topk_cosine_vectorized(base, q, 10).select(
        "vec_id", F.round("cosine", 6).alias("cosine")
    )
    top.write.format("noop").mode("overwrite").save()
    tick("rerank", t0)


def main() -> None:
    from data_engineering_project_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab_ivfpq_stages",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))
        },
    )
    run_once(spark, None)  # untimed warmup (JVM/codegen)
    record: dict = {}
    runs = 3
    for _ in range(runs):
        run_once(spark, record)
    out = {k: round(v / runs, 3) for k, v in record.items()}
    out["total"] = round(sum(out.values()), 3)
    out["sf_dir"] = SF_DIR
    print(json.dumps(out))


if __name__ == "__main__":
    main()
