"""Distributed k-means (Lloyd's) as DataFrame plans with deterministic math.

The IVF-training / semantic-dedup primitive: cluster an embedding corpus so
downstream ANN probes (plans/similarity_queries.py: emb_ivf_topk) get real
learned cells instead of hash grids.

Design for scale AND for cross-engine determinism (the driver compares this
against a DuckDB oracle running the identical algorithm):

- **Quantized input**: components snap to integer units (``round(x*scale)``
  as BIGINT) so every per-cluster sum is exact integer arithmetic — immune
  to Spark's nondeterministic partial-agg merge order (repo invariant).
- **Centroid state on the driver**: k×dim numbers collected per iteration
  and re-embedded as literal arrays — the same broadcast-the-model pattern
  MLlib uses. Data never moves; per iteration one scan computes
  assignments and one narrow (k×dim)-row aggregate updates the state.
  Plan depth is CONSTANT per iteration (each rebuilds from the persisted
  points), so no lineage blow-up and no checkpoint needed.
- **Explicit tie-break**: a point equidistant to two centroids goes to the
  smaller cluster id via lexicographic ``(dist, cid)`` comparison —
  ``array_min`` over structs here, ``arg_min(cid, [dist, cid])`` in the
  oracle — so both engines agree even on exact ties.
- **Empty-cluster rule**: a cluster that loses all members keeps its
  previous centroid (both engines implement the same rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def quantize_vec(vec: Column, scale: int) -> Column:
    """float array → integer-unit BIGINT array (exact, order-safe sums)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )


def _dist2(q: Column, centroid: list[float]) -> Column:
    """Squared distance of a quantized point to one centroid — a sequential
    left-fold over the dims, the same evaluation order the oracle's
    ``list_sum(list_transform(...))`` uses."""
    c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_code(vec: Column, s: int, sub: int, book: dict[int, list[float]]) -> Column:
    """PQ code of subspace ``s`` as a LITERAL projection (no join against an
    assignment frame): argmin over the codebook with the (dist, cid)
    lexicographic tie-break — identical to ``_assign`` because Lloyd's final
    step IS assignment with the final centroids."""
    scored = F.array(
        *[
            F.struct(
                _dist2(F.slice(vec, s * sub + 1, sub), book[cid]).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid in sorted(book)
        ]
    )
    return F.array_min(scored).getField("cid")


def _assign(pts: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    scored = F.array(
        *[
            F.struct(_dist2(F.col("q"), centroids[cid]).alias("d"),
                     F.lit(cid).alias("cid"))
            for cid in sorted(centroids)
        ]
    )
    best = F.array_min(scored)  # lexicographic (d, cid): smallest id wins ties
    return pts.withColumn("cluster", best.getField("cid"))


def kmeans_assignments(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 1000,
    keep_vec: bool = False,
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations; return (id, cluster) assignments.

    ``keep_vec=True`` also returns the quantized vector column ``q`` so
    downstream within-cluster work (e.g. semantic dedup) avoids a join
    back to the corpus.

    Init: the k points with the smallest ``md5(id)`` — deterministic,
    partition-independent, and a real-data init (k-means|| would be the
    production upgrade; the fit loop is identical).
    """
    # NULL vectors cannot be clustered — drop them at ingestion (a crash
    # here took down the whole fit on one corrupt row; null-fuzz finding)
    pts = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"), quantize_vec(F.col(vec_col), scale).alias("q")
    ).persist()

    assigned, _ = _lloyd(pts, k, n_iter)
    if assigned is None:
        # an empty corpus (routine for a day-partition at scale) yields an
        # empty assignment, not a crash on the missing init sample
        cols = ["vec_id", "q"] if keep_vec else ["vec_id"]
        return pts.select(*cols, F.lit(0).cast("int").alias("cluster"))
    out_cols = ["vec_id", "q", "cluster"] if keep_vec else ["vec_id", "cluster"]
    return assigned.select(*out_cols)


def _lloyd(
    pts: DataFrame, k: int, n_iter: int
) -> tuple[DataFrame | None, dict[int, list[float]]]:
    """The shared Lloyd loop over a quantized ``(vec_id, q)`` frame:
    md5-ordered real-data init, ``n_iter - 1`` recompute rounds, final
    assignment. Returns (assignments-with-q, final centroids); (None, {})
    on an empty frame. Centroid state stays driver-side (k×dim numbers)
    like MLlib; assignments stay fully distributed."""
    init_rows = (
        pts.orderBy(F.md5(F.col("vec_id").cast("string"))).limit(k).collect()
    )
    if not init_rows:
        return None, {}
    centroids = {
        cid: [float(v) for v in row["q"]] for cid, row in enumerate(init_rows)
    }
    dim = len(next(iter(centroids.values())))

    for _ in range(n_iter - 1):
        assigned = _assign(pts, centroids)
        stats = (
            assigned.select("cluster", F.posexplode("q").alias("dim", "qv"))
            .groupBy("cluster", "dim")
            .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_c: dict[int, list[float]] = {}
        for r in stats:
            new_c.setdefault(r["cluster"], [0.0] * dim)[r["dim"]] = r["s"] / r["n"]
        # empty clusters keep their previous centroid
        centroids = {
            cid: new_c.get(cid, centroids[cid]) for cid in sorted(centroids)
        }

    return _assign(pts, centroids), centroids


def _lloyd_books_multi(
    frame: DataFrame,
    *,
    k: int,
    n_iter: int,
    n_sub: int,
    sub: int,
    vec_col: str = "q",
) -> list[dict[int, list[float]]] | None:
    """Train ``n_sub`` independent Lloyd codebooks — one per contiguous
    length-``sub`` slice of ``vec_col`` — with SHARED Spark jobs.

    Bit-identical to ``n_sub`` sequential :func:`_lloyd` calls over the
    slices (the r13 job-fusion optimization): the md5-ordered init does not
    depend on the slice, so every subspace draws the SAME k rows (ONE
    TakeOrdered job instead of n_sub); each recompute round evaluates all
    n_sub assignment argmins in one projection and aggregates all
    subspaces' (cluster, dim) integer sums in ONE groupBy job (posexplode
    of the full vector = the union of the n_sub slice explodes). Sums are
    exact bigint (order-free) and the sum/n division happens driver-side in
    the same order, so the returned books match the sequential fit exactly
    — property-tested in tests/test_timeseries_clustering.py.

    Returns the list of per-subspace codebooks, or None on an empty frame
    (the ``_lloyd`` ``(None, {})`` contract).
    """
    init_rows = (
        frame.orderBy(F.md5(F.col("vec_id").cast("string"))).limit(k).collect()
    )
    if not init_rows:
        return None
    books: list[dict[int, list[float]]] = [
        {
            cid: [float(v) for v in row[vec_col][s * sub : (s + 1) * sub]]
            for cid, row in enumerate(init_rows)
        }
        for s in range(n_sub)
    ]

    for _ in range(n_iter - 1):
        cls = F.array(
            *[_pq_code(F.col(vec_col), s, sub, books[s]) for s in range(n_sub)]
        )
        s_col = F.floor(F.col("dim") / sub).cast("int")
        stats = (
            # the assignment argmins resolve in their OWN projection: a
            # generator (posexplode) in the same select strips the struct
            # field names the argmin's getField("cid") needs
            frame.select(F.col(vec_col).alias("_v"), cls.alias("_cls"))
            .select("_cls", F.posexplode("_v").alias("dim", "qv"))
            .select(
                s_col.alias("s"),
                F.element_at(F.col("_cls"), s_col + 1).alias("cluster"),
                (F.col("dim") % sub).alias("d"),
                "qv",
            )
            .groupBy("s", "cluster", "d")
            .agg(F.sum("qv").alias("sm"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_books: list[dict[int, list[float]]] = [{} for _ in range(n_sub)]
        for r in stats:
            if r["cluster"] is None:
                continue  # phantom trailing dims on a malformed row
            new_books[r["s"]].setdefault(r["cluster"], [0.0] * sub)[
                r["d"]
            ] = r["sm"] / r["n"]
        # empty clusters keep their previous centroid, per subspace
        books = [
            {
                cid: new_books[s].get(cid, books[s][cid])
                for cid in sorted(books[s])
            }
            for s in range(n_sub)
        ]
    return books


def opq_dim_permutation(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
    scale: int = 1000,
) -> list[int]:
    """OPQ-style dimension allocation (Ge et al., CVPR'13 — the parametric
    init): assign dimensions to subspaces so each subspace carries a
    BALANCED share of the corpus variance, instead of PQ's arbitrary
    index-order slicing. Full OPQ learns a dense rotation by alternating
    Procrustes/Lloyd; the allocation step alone (rank dims by variance,
    snake-deal into subspaces) captures the bulk of the benefit when
    per-dim scales differ, is a pure PERMUTATION (restatable in SQL), and
    adds zero cost to the scan path.

    Deterministic: variance ranked by the exact integer numerator
    n·Σx² − (Σx)² over quantized components (order-independent sums),
    ties to the smaller dim; snake order (left-to-right then right-to-
    left per pass) balances totals. Returns 0-based source indices in
    subspace-major order: ``perm[s*sub + j]`` is the source dim of slot
    ``j`` of subspace ``s``.
    """
    q = quantize_vec(F.col(vec_col), scale)
    stats = (
        df.select(F.posexplode(q).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    var_num = {
        r["dim"]: r["n"] * r["s2"] - r["s1"] * r["s1"] for r in stats
    }
    ranked = sorted(range(dim), key=lambda d: (-var_num.get(d, 0), d))
    sub_slots: list[list[int]] = [[] for _ in range(n_sub)]
    for rk, d in enumerate(ranked):
        passno, off = divmod(rk, n_sub)
        s = off if passno % 2 == 0 else n_sub - 1 - off
        sub_slots[s].append(d)
    return [d for slots in sub_slots for d in slots]


def pq_topk(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: int = 0,
    dim: int = 64,
    n_sub: int = 4,
    k: int = 8,
    n_iter: int = 2,
    scale: int = 1000,
    topk: int = 10,
    dim_perm: list[int] | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI'11 — the billion-scale
    standard): the vector splits into ``n_sub`` subspaces, each gets its
    own ``k``-code Lloyd codebook, every vector encodes to ``n_sub`` small
    codes, and the query scans CODES with an asymmetric-distance (ADC)
    lookup table instead of raw floats — memory per vector drops from
    dim×4 bytes to n_sub codes, which is what makes billion-vector search
    fit in RAM.

    Determinism: codebooks train on integer-quantized subvectors (exact
    sums), the ADC table is k×n_sub doubles computed in one fixed fold
    order, and ties break on vec_id — the whole train→encode→scan
    pipeline restates in SQL exactly.
    """
    sub = dim // n_sub
    qf = quantize_vec(F.col(vec_col), scale)
    if dim_perm is not None:
        # OPQ allocation (opq_dim_permutation): a literal reorder of the
        # quantized components before slicing — downstream fit/encode/ADC
        # are untouched, and the query vector permutes identically, so
        # distances keep their meaning
        qf = F.array(*[qf.getItem(i) for i in dim_perm])
    full = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        qf.alias("qf"),
    ).persist()

    # one driver-side fetch of the query's full quantized vector (sliced
    # per subspace below, instead of re-collecting it n_sub times), with a
    # clear error when the id is absent from a non-empty corpus
    qrows = full.filter(F.col("vec_id") == query_id).take(1)
    if not qrows and not full.isEmpty():
        raise ValueError(
            f"query id {query_id!r} not found in {id_col!r} of the corpus"
        )
    qfull = [float(v) for v in qrows[0]["qf"]] if qrows else []

    # per-subspace codebooks (driver state k × sub), trained with SHARED
    # jobs — one init TakeOrdered + one stats groupBy per round for ALL
    # subspaces instead of n_sub sequential fits (bit-identical books;
    # r13 job fusion: the fixed training constant dominated bench wall)
    books = _lloyd_books_multi(
        full, k=k, n_iter=n_iter, n_sub=n_sub, sub=sub, vec_col="qf"
    )
    if books is None:
        full.unpersist()
        return full.select(
            "vec_id", F.lit(0.0).alias("adc")
        ).filter(F.lit(False))
    adc_terms = []
    for s in range(n_sub):
        cents = books[s]
        q0 = qfull[s * sub : (s + 1) * sub]
        # ADC lookup entries: ||q0_s - c||² in the SAME left-fold order the
        # oracle's list_sum uses (both are IEEE doubles → bit-identical)
        dist = {}
        for cid in sorted(cents):
            acc = 0.0
            for qi, ci in zip(q0, cents[cid]):
                d = qi - ci
                acc += d * d
            dist[cid] = acc
        lookup = F.create_map(
            *[
                x
                for cid in sorted(dist)
                for x in (F.lit(cid), F.lit(dist[cid]))
            ]
        )
        adc_terms.append(lookup[F.col(f"c{s}")])

    adc = adc_terms[0]
    for t in adc_terms[1:]:
        adc = adc + t
    # codes are literal projections over the quantized corpus (Lloyd's final
    # step IS assignment with the final centroids), so the scan path is ONE
    # map-only pass + TakeOrdered — no n_sub-way join on vec_id, and the
    # corpus cache can be released (no leaked relations across repeated
    # queries in one session; the lazy result recomputes map-only if
    # re-materialized)
    result = (
        full.select(
            "vec_id",
            *[_pq_code(F.col("qf"), s, sub, books[s]).alias(f"c{s}") for s in range(n_sub)],
        )
        .withColumn("adc", adc)
        .filter(F.col("vec_id") != query_id)
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(topk)
        .select("vec_id", F.round("adc", 4).alias("adc"))
    )
    full.unpersist()
    return result


def ivfpq_topk(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    query_id: int = 0,
    dim: int = 64,
    n_sub: int = 4,
    k: int = 8,
    n_iter: int = 2,
    scale: int = 1000,
    nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """IVF-PQ with residual encoding (Jégou et al., PAMI'11 §V — the
    composition billion-scale ANN actually deploys): a coarse quantizer
    partitions the corpus into cells, every vector PQ-encodes its
    RESIDUAL against its cell centroid (residuals concentrate near zero,
    so the same codebook capacity buys far more precision than raw-vector
    PQ), and a query probes only its ``nprobe`` nearest cells, ADC-scanning
    codes with a per-cell lookup table built from the QUERY's residual in
    that cell.

    Determinism discipline (all driver-hash-checkable):
    - cells are the corpus's own ``cell_col`` partitions (the same coarse
      quantizer ``emb_ivf_topk`` uses; a learned k-means coarse quantizer
      drops in without changing any later stage);
    - cell centroids snap to INTEGERS — floor(sum/count + 0.5) per dim on
      exact integer sums — so residuals are exact integers and the whole
      encode path reuses the quantized-Lloyd machinery;
    - probe ranking is pure integer L2 (no float anywhere);
    - PQ codebooks train per subspace over ALL residuals (global residual
      codebooks, the standard variant) with the shared ``_lloyd`` loop;
    - ADC tables are computed driver-side in the same left-fold order the
      oracle's ``list_sum`` uses, keyed (cell, code) since the query
      residual differs per probed cell.

    Scale shape: one posexplode aggregate for centroids (cells × dim
    rows), a broadcast join for residuals, ``n_sub`` Lloyd fits (each
    driver state k × sub), then a map-only ADC projection + TakeOrdered
    over the probed cells — no shuffle on the candidate path; every
    collect is O(cells × dim) or O(k × sub) metadata.
    """
    sub = dim // n_sub
    # a row with no vector or no cell cannot live in an IVF index —
    # drop both classes at ingestion (NULL cells poisoned the centroid
    # key space and crashed probe ranking; null-fuzz finding)
    pts = df.filter(
        F.col(vec_col).isNotNull() & F.col(cell_col).isNotNull()
    ).select(
        F.col(id_col).alias("vec_id"),
        F.col(cell_col).alias("cell"),
        quantize_vec(F.col(vec_col), scale).alias("qf"),
    ).persist()

    # integer cell centroids from exact integer sums (cells × dim rows)
    cstats = (
        pts.select("cell", F.posexplode("qf").alias("dim", "qv"))
        .groupBy("cell", "dim")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not cstats:
        pts.unpersist()
        return pts.select(
            "vec_id", "cell", F.lit(0.0).alias("adc")
        ).filter(F.lit(False))
    import math as _math

    cent_int: dict[int, list[int]] = {}
    for r in cstats:
        cent_int.setdefault(r["cell"], [0] * dim)[r["dim"]] = int(
            _math.floor(r["s"] / r["n"] + 0.5)
        )

    qrows = pts.filter(F.col("vec_id") == query_id).take(1)
    if not qrows:
        raise ValueError(
            f"query id {query_id!r} not found in {id_col!r} of the corpus"
        )
    q0 = [int(v) for v in qrows[0]["qf"]]

    # probe: nprobe nearest cells by exact integer L2, ties to smaller cell
    probes = sorted(
        cent_int,
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(q0, cent_int[c])),
            c,
        ),
    )[:nprobe]

    # integer residuals vs the OWN cell's integer centroid
    cents_df = pts.sparkSession.createDataFrame(
        [(c, v) for c, v in sorted(cent_int.items())],
        "cell int, cvec array<bigint>",
    )
    res = pts.join(F.broadcast(cents_df), "cell").select(
        "vec_id",
        "cell",
        F.zip_with("qf", "cvec", lambda a, b: a - b).alias("r"),
    ).persist()

    # per-subspace global residual codebooks (training collects only the
    # k × sub centroid state; the assignment frames are discarded — final
    # codes are recomputed below as map-only expressions, which is exact
    # because Lloyd's last step IS assignment with these same centroids).
    # All n_sub fits share jobs (_lloyd_books_multi, bit-identical books;
    # r13 job fusion — training constants dominated bench wall)
    books = _lloyd_books_multi(
        res, k=k, n_iter=n_iter, n_sub=n_sub, sub=sub, vec_col="r"
    )
    if books is None:  # unreachable: qrows above proved res non-empty
        books = [{} for _ in range(n_sub)]
    # the first fit materialized ``res``; nothing re-reads the raw corpus
    pts.unpersist()

    def _code_col(s: int) -> Column:
        return _pq_code(F.col("r"), s, sub, books[s])

    # ADC lookup per (probed cell, subspace, code), driver-side in the
    # oracle's left-fold order
    def _adc_table(cell: int, s: int) -> dict[int, float]:
        rq = [
            q0[i] - cent_int[cell][i]
            for i in range(s * sub, (s + 1) * sub)
        ]
        out = {}
        for cid in sorted(books[s]):
            acc = 0.0
            for a, b in zip(rq, books[s][cid]):
                d = a - b
                acc += d * d
            out[cid] = acc
        return out

    def _lookup(cell: int, s: int) -> Column:
        tab = _adc_table(cell, s)
        m = F.create_map(
            *[x for cid in sorted(tab) for x in (F.lit(cid), F.lit(tab[cid]))]
        )
        return m[F.col(f"c{s}")]

    # candidate scan: probed cells only; codes + per-cell ADC are pure
    # projections (literal codebooks and maps), so the whole candidate
    # path is ONE map-only pass over the cached residuals + TakeOrdered —
    # zero joins, zero shuffles (plan-asserted in test_plan_quality.py)
    cand = (
        res.filter(F.col("cell").isin([int(c) for c in probes]))
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            "cell",
            *[_code_col(s).alias(f"c{s}") for s in range(n_sub)],
        )
    )
    adc = None
    for cell in probes:
        cell_adc = _lookup(cell, 0)
        for s in range(1, n_sub):
            cell_adc = cell_adc + _lookup(cell, s)
        adc = (
            F.when(F.col("cell") == int(cell), cell_adc)
            if adc is None
            else adc.when(F.col("cell") == int(cell), cell_adc)
        )
    result = (
        cand.withColumn("adc", adc)
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(topk)
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.round("adc", 4).alias("adc"),
        )
    )
    # release the residual cache before returning: no relations leak across
    # repeated queries in one session; if the caller materializes later the
    # candidate path recomputes as scan → broadcast-join → projection, still
    # shuffle-free (plan-asserted)
    res.unpersist()
    return result


def power_iteration_top_component(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rounds: int = 3,
) -> DataFrame:
    """Top principal direction of X·Xᵀ by power iteration, quantized so the
    unrolled computation is bit-reproducible and oracle-checkable — the
    PageRank integer-arithmetic discipline applied to linear algebra.

    Per round (v held in 2^20 "unit" scale, components in 1e5 units):
      s_r  = floor( Σ_j U_rj·V_j / 2^20 )          row projections
      w_j  = Σ_r s_r·U_rj                           back-projection
      w2_j = (w_j + 2^62) div 2^32 − 2^30           exact scale-down*
      v'_j = floor( w2_j·2^20 / ‖w2‖ + 0.5 )        renormalize

    (*) the +2^62 offset makes the dividend positive so truncating
    division IS floor division in every engine — signed integer division
    truncates toward zero in Spark but not necessarily elsewhere. All
    double intermediates stay below 2^53 (exact); divisions by powers of
    two are exact in doubles; sqrt/floor on identical doubles are
    bit-identical across engines.

    Scale shape: the quantized (row, dim, unit) triples are computed once
    and persisted (the loop invariant); each round is a broadcast join
    against the 64-row direction vector, one row-keyed and one dim-keyed
    aggregation (both map-side combined), and a tiny renormalization.
    Magnitude budget documented inline holds to ~10⁷ rows at 64 dims;
    beyond that raise the w scale-down.

    Returns ``(dim, v_unit)`` — the direction in 2^20-unit scale,
    one row per dimension (1-based).
    """
    M = 1 << 20
    OFF = 1 << 62
    DIV = 1 << 32

    flat = emb.select(
        F.col(id_col).alias("rid"),
        F.posexplode(
            F.transform(
                vec_col,
                lambda x: F.floor(
                    x.cast("double") * 100000 + F.lit(0.5)
                ).cast("long"),
            )
        ).alias("pos0", "uv"),
    ).select("rid", (F.col("pos0") + 1).alias("pos"), "uv")
    flat = flat.persist(StorageLevel.MEMORY_AND_DISK)

    v = (
        flat.select("pos")
        .distinct()
        .select("pos", F.lit(M).cast("long").alias("vv"))
    )
    for i in range(rounds):
        s = (
            flat.join(F.broadcast(v), "pos")
            .groupBy("rid")
            .agg(
                F.floor(
                    F.sum(F.col("uv") * F.col("vv")) / float(M)
                )
                .cast("long")
                .alias("s2")
            )
        )
        w = (
            flat.join(s, "rid")
            .groupBy("pos")
            .agg(F.sum(F.col("s2") * F.col("uv")).alias("w"))
        )
        w2 = w.select(
            "pos",
            (
                F.expr(f"(w + {OFF}L) div {DIV}L") - F.lit(OFF // DIV)
            ).alias("w2"),
        )
        nrm = w2.agg(
            F.sqrt(
                F.sum(F.col("w2") * F.col("w2")).cast("double")
            ).alias("nrm")
        )
        v = (
            w2.crossJoin(F.broadcast(nrm))
            .select(
                "pos",
                F.floor(
                    (F.col("w2") * M) / F.col("nrm") + F.lit(0.5)
                )
                .cast("long")
                .alias("vv"),
            )
        )
        v = v.localCheckpoint(eager=(i == rounds - 1))
    flat.unpersist()
    return v.select(F.col("pos").alias("dim"), F.col("vv").alias("v_unit"))
