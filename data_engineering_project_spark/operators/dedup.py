"""Near-duplicate detection operators: MinHash+LSH, SimHash, shingles.

The scale path for corpus dedup (the docs_* exact/fingerprint queries handle
identical text; these handle *near*-identical):

- **MinHash + LSH banding**: shingle → per-seed min-hash signature → band the
  signature → group by (band, band-signature) → candidate pairs only within
  buckets → verify with true Jaccard. All-pairs similarity without an
  all-pairs join: the only shuffles are the explode/groupBy for signatures
  and the band-key self-join, both hash-partitioned and skew-tolerant.
- **SimHash**: 64-bit weighted-token fingerprint where near-duplicates land
  within a small Hamming distance; pure column expressions.

Hashes are MD5-based (not xxhash64) so signatures are portable across
engines — the DuckDB oracle can restate signature generation exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.text import (
    jaccard,
    jaccard_half_up6,
    tokens,
)


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles ('a b c' word n-grams) — the MinHash unit
    set. Built with transform over the token array: no explode needed yet."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    make = lambda i: F.array_join(F.slice(toks, i + 1, k), " ")  # noqa: E731
    return F.when(n >= k, F.array_distinct(F.transform(idx, make))).otherwise(
        F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


def minhash_signature(shingle_col: Column, n_hashes: int = 16) -> Column:
    """MinHash signature as a single EXPRESSION: for seed i, min over
    shingles of md5(i || shingle).

    min() over hex-string md5 is a valid uniform min-hash (lexicographic
    order on a uniformly distributed digest). Jaccard(a, b) ≈ fraction of
    signature positions that agree.

    PERFORMANCE WARNING: as one n_hashes-element array expression this
    nests n_hashes transform/array_min towers; past codegen's method-size
    limits the whole projection silently drops to INTERPRETED evaluation —
    measured ~130 ms/doc (≈100× the codegen cost) on 300-char docs at
    n_hashes=16. Use :func:`minhash_signatures` (the explode + min-agg
    DataFrame form, bit-identical output) for anything beyond a handful of
    rows — even at n_hashes=1 the interpreted per-shingle closure costs
    ~13× the compiled path at scale (r13 wave-C: the signature-profile
    query's 16 s sf0.5 marginal fell to 1.2 s when it left this form).
    This expression form survives as the bit-exact reference.
    """
    # factory keeps each transform lambda UNARY: a 2-param lambda (even with
    # a default) makes pyspark pass the array index as the second arg,
    # silently corrupting the seed
    def min_for_seed(i: int):
        seed = F.lit(f"{i}:")
        return F.array_min(
            F.transform(shingle_col, lambda s: F.md5(F.concat(seed, s)))
        )

    return F.array(*[min_for_seed(i) for i in range(n_hashes)])


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_k: int = 3,
    spread: bool = True,
) -> DataFrame:
    """``(id, sig: array<string>)`` MinHash signatures for a corpus —
    bit-identical to :func:`minhash_signature` but built as explode +
    ``n_hashes`` min-aggregates, which stays inside whole-stage codegen at
    any signature width (the expression form drops to interpreted
    evaluation — see its warning).

    Docs whose shingle set is EMPTY (only blank text) vanish from the
    output; their expression-form signature is all-null, which every
    downstream use (banding, verification) already treats as
    non-matching, so the end results agree.

    ``spread=True`` (default) hash-repartitions on ``id_col`` before the
    CPU-heavy hashing, then the min-agg reuses that exchange (no second
    shuffle): right for small-file/skewed inputs where the scan gives too
    few partitions to spread the md5 work (the local-bench shape, and any
    corpus of a few big files). Pass ``spread=False`` on inputs with
    ample scan parallelism and very LARGE texts — then partial
    aggregation ships ≤ n_hashes digests per doc per partition instead of
    re-shuffling the raw text.
    """
    sh = shingles(F.col(text_col), shingle_k)
    if spread:
        # EXPLICIT partition count: a bare repartition(col) exchange gets
        # AQE-coalesced back to ~1 partition because the BYTES are tiny —
        # but the cost here is md5 CPU per row, which byte-based coalescing
        # cannot see. An explicit count is honored by AQE.
        n = docs.sparkSession.sparkContext.defaultParallelism
        src = docs.repartition(n, F.col(id_col))
    else:
        src = docs
    exploded = src.select(
        F.col(id_col), F.explode(sh).alias("_shingle")
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("_shingle")))).alias(
            f"_h{i}"
        )
        for i in range(n_hashes)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*mins)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("sig"),
        )
    )


def band_keys(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """Split the signature into bands; each band's joined value is an LSH
    bucket key. Docs agreeing on ALL rows of ANY band become candidates."""
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.element_at(signature, b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
            for b in range(n_bands)
        ]
    )


#: sub-buckets per hot bucket in the ``max_bucket`` cap paths — the window
#: that orders a bucket partitions by (bucket, sub), so the max task input
#: is ~|bucket|/N_SALT instead of |bucket|
N_SALT = 16


def _salted_chunks(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    max_bucket: int,
    n_salt: int = N_SALT,
) -> DataFrame:
    """Two-level skew-bounded chunk assignment for the ``max_bucket`` cap
    paths. A single ``Window.partitionBy(bucket)`` bounded the cap's OUTPUT
    but sorted an entire pathological bucket in one task — at 100 TB a
    million-doc boilerplate bucket serializes one straggler. Here rows of a
    bucket OVER the cap salt into ``hash(id) % n_salt`` sub-buckets first
    (md5-derived so the DuckDB oracle restates the assignment bit-for-bit),
    and the ordering window partitions by (bucket, sub): no task ever sorts
    more than ~|bucket|/n_salt rows (ids hash uniformly; the salt is
    independent of the bucket key). Buckets AT or UNDER the cap keep sub=0 —
    one chunk holding the whole bucket, so capped output equals uncapped
    output exactly until a bucket overflows. Within a sub-bucket the order
    is (md5(id), id) and chunks hold ≤max_bucket docs, exactly as before.

    Connectivity across the split is preserved by TWO chain families the
    callers emit: consecutive chunk HEADS within each sub-bucket, and the
    FIRST row of each non-empty sub-bucket chained in sub-rank order (that
    ranking window sees ≤n_salt rows per bucket — bounded by construction).
    Adds (sub, chunk, is_head, is_first) to ``df``'s columns.
    """
    from pyspark.sql import Window

    # buckets at or under the cap keep sub=0 — one chunk, ALL pairs — so
    # the cap stays a strict no-op until a bucket actually overflows (the
    # tested semantics contract). The count is a parallel partial-agg
    # groupBy, never a whole-bucket window; the attach join is skew-safe
    # (AQE splits a hot bucket's partition — the build side is one row per
    # bucket key)
    cnt = df.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bn"))
    hash_sub = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 17, 8), 16, 10
        ).cast("long")
        % n_salt
    ).cast("int")
    salted = (
        df.join(cnt, on=list(bucket_cols))
        .withColumn(
            "sub",
            F.when(F.col("_bn") <= max_bucket, F.lit(0)).otherwise(hash_sub),
        )
        .drop("_bn")
    )
    w = Window.partitionBy(*bucket_cols, "sub").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    pos = F.row_number().over(w) - F.lit(1)
    return salted.select(
        "*",
        (pos / max_bucket).cast("int").alias("chunk"),
        (pos % max_bucket == 0).alias("is_head"),
        (pos == 0).alias("is_first"),
    )


def _chain_edges(
    chunked: DataFrame, bucket_cols: list[str], id_col: str
) -> DataFrame:
    """The connectivity edges over a :func:`_salted_chunks` frame: head
    chains within each sub-bucket plus the cross-sub first-row chain.
    Output is O(n/max_bucket + n_salt) per bucket — negligible next to the
    within-chunk candidates."""
    from pyspark.sql import Window

    heads = chunked.filter(F.col("is_head")).select(
        F.col(id_col).alias("_hid"), *bucket_cols, "sub", "chunk"
    )
    within_sub = (
        heads.select(
            F.col("_hid").alias("id_a"),
            *bucket_cols,
            "sub",
            F.col("chunk").alias("_c"),
        )
        .join(
            heads.select(
                F.col("_hid").alias("id_b"),
                *bucket_cols,
                "sub",
                (F.col("chunk") - 1).alias("_c"),
            ),
            on=[*bucket_cols, "sub", "_c"],
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy(*bucket_cols).orderBy("sub")
    )
    firsts = chunked.filter(F.col("is_first")).select(
        F.col(id_col).alias("_fid"), *bucket_cols, rk.alias("_rk")
    )
    cross_sub = (
        firsts.select(
            F.col("_fid").alias("id_a"), *bucket_cols, F.col("_rk").alias("_r")
        )
        .join(
            firsts.select(
                F.col("_fid").alias("id_b"),
                *bucket_cols,
                (F.col("_rk") - 1).alias("_r"),
            ),
            on=[*bucket_cols, "_r"],
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
    )
    return within_sub.unionByName(cross_sub)


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """End-to-end near-dup pairs: signature → band explode → bucket self-join
    → exact Jaccard verification ≥ min_jaccard.

    Plan shape at 100 TB: the band explode and bucket self-join carry ONLY
    (id, band_key) — never the shingle sets — so the ×n_bands row blow-up
    multiplies a two-column frame, not the corpus text. Candidate (id_a,
    id_b) pairs are deduped ACROSS bands first; the shingle sets are joined
    back by id afterwards for exact-Jaccard verification. That is two narrow
    hash shuffles (band key, then id) instead of one shuffle whose payload is
    every document's shingle set repeated per band. Hot buckets (boilerplate
    docs) are the skew risk — AQE skew-join handles moderate cases;
    ``max_bucket`` handles pathological ones.

    ``max_bucket``: a bucket of n docs (one boilerplate template repeated a
    million times) makes the self-join emit ~n²/2 candidate rows — quadratic
    in exactly the place a 100 TB corpus is skewed. With ``max_bucket=B``
    each bucket first salts into ``hash(id) % N_SALT`` sub-buckets, each
    sub-bucket is deterministically ordered (md5 of the id, then the id) and
    cut into chunks of ≤B docs (:func:`_salted_chunks` — both the OUTPUT and
    every task's INPUT are bounded: no task sorts more than ~n/N_SALT rows
    of a pathological bucket); candidates are generated within chunks plus
    the :func:`_chain_edges` families (consecutive chunk heads within a
    sub-bucket, first rows across sub-buckets), bounding the bucket's output
    at O(n·B) rows while a genuine near-dup super-cluster stays one
    connected component downstream. The trade, stated honestly: two docs
    that share ONLY this bucket and land in different chunks are not
    candidates here — multi-band redundancy is what recovers such pairs,
    exactly as it does for docs split across buckets by an unlucky band.
    ``None`` (default) preserves the exact uncapped semantics the catalog
    oracle restates.
    """
    rows_per_band = n_hashes // n_bands
    sh = shingles(F.col(text_col), shingle_k)
    # signatures via the codegen-safe explode+min-agg form, then a narrow
    # banded frame: two columns through the explode and the self-join
    banded = minhash_signatures(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        shingle_k=shingle_k,
    ).select(
        F.col(id_col),
        F.explode(
            band_keys(F.col("sig"), n_bands, rows_per_band)
        ).alias("band_key"),
    )
    # both sides of the bucket self-join read this frame — persist the
    # narrow (id, band_key) result or the whole signature computation
    # (the expensive md5 pass) runs twice
    banded = banded.persist()
    if max_bucket is None:
        # self-join on disjoint column names: alias-qualified self-joins on
        # the same lineage resolve ambiguously in Spark — rename BEFORE
        # joining
        left = banded.select(F.col(id_col).alias("id_a"), "band_key")
        right = banded.select(F.col(id_col).alias("id_b"), "band_key")
        cand = (
            left.join(right, on="band_key")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        # salted two-level assignment: sub-bucket by hash(id), order within
        # (band_key, sub) — no task sorts a whole pathological bucket
        chunked = _salted_chunks(
            banded, ["band_key"], id_col, max_bucket
        ).persist()
        left = chunked.select(
            F.col(id_col).alias("id_a"), "band_key", "sub", "chunk"
        )
        right = chunked.select(
            F.col(id_col).alias("id_b"), "band_key", "sub", "chunk"
        )
        within = (
            left.join(right, on=["band_key", "sub", "chunk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        chain = _chain_edges(chunked, ["band_key"], id_col)
        cand = within.union(chain).dropDuplicates(["id_a", "id_b"])
        # candidates are tiny by construction (O(n·B) per bucket): pin them
        # eagerly and release the two cached wide frames NOW, so repeated
        # invocations in a long-lived session don't accumulate cache
        # (round-7 advice); graph queries already accept localCheckpoint
        # lineage-truncation semantics
        cand = cand.localCheckpoint(eager=True)
        chunked.unpersist()
        banded.unpersist()
    # shingle sets re-enter only for the verified candidates, keyed by id —
    # and are COMPUTED only for candidate docs: prune the corpus with a
    # semi-join on the (tiny) candidate id set before the shingle
    # expression runs, so verification cost is O(candidates), not O(corpus)
    cand_ids = (
        cand.select(F.col("id_a").alias("_cid"))
        .union(cand.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    pruned = docs.join(
        F.broadcast(cand_ids),
        docs[id_col] == cand_ids["_cid"],
        "left_semi",
    )
    sh_by_id = pruned.select(F.col(id_col).alias("_sh_id"), sh.alias("_sh"))
    verified = (
        cand.join(sh_by_id, cand["id_a"] == sh_by_id["_sh_id"])
        .select("id_a", "id_b", F.col("_sh").alias("sh_a"))
        .join(sh_by_id, F.col("id_b") == sh_by_id["_sh_id"])
        .select("id_a", "id_b", "sh_a", F.col("_sh").alias("sh_b"))
    )
    # materialize (inter, union) ONCE: the old filter-on-jaccard +
    # emit-half_up6 pair evaluated array_intersect twice per candidate
    # (Catalyst does not CSE across the Filter/Project boundary); the
    # threshold still compares the raw double inter/union and the emitted
    # value still routes the same integers through half_up_ratio, so
    # results are bit-unchanged (r13, guide §1.2 per-task work)
    from data_engineering_project_spark.functions.scalars import (
        half_up_ratio,
    )

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        verified.withColumn("_i", inter)
        .withColumn(
            "_u", F.size("sh_a") + F.size("sh_b") - F.col("_i")
        )
        .filter(
            F.col("_i").cast("double") / F.col("_u") >= min_jaccard
        )
        .select(
            "id_a",
            "id_b",
            half_up_ratio(
                F.col("_i").cast("long"), F.col("_u").cast("long"), 6
            ).alias("jaccard"),
        )
    )


def minhash_band_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """``(id, band_key)`` LSH index table for a corpus.

    Persist this (plain parquet or ``sinks/snapshot_table.write_table`` for
    versioned appends) and probe each ingest batch against it with
    :func:`incremental_minhash_pairs` — continuous-ingest dedup then costs
    banding the NEW batch plus one index join, never re-pairing the whole
    corpus. The index is ~n_bands rows per document, two narrow columns.
    """
    rows_per_band = n_hashes // n_bands
    return minhash_signatures(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        shingle_k=shingle_k,
    ).select(
        F.col(id_col),
        F.explode(
            band_keys(F.col("sig"), n_bands, rows_per_band)
        ).alias("band_key"),
    )


def incremental_minhash_pairs(
    new_docs: DataFrame,
    corpus: DataFrame,
    index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-dup pairs of a NEW ingest batch against an already-indexed
    corpus: band the new docs (same seeds/banding as the index), join the
    index on ``band_key`` for candidates, then exact-Jaccard verify by
    fetching ONLY the candidate texts from each side.

    Contract: ``index`` was built by :func:`minhash_band_index` with the
    same ``n_hashes``/``n_bands``/``shingle_k``, and new ids are disjoint
    from corpus ids. At 100 TB the per-batch cost is
    O(batch + matching index buckets + candidates) — the corpus is touched
    only at candidate ids (parquet/row-group pruning applies); a full
    re-pairing (``minhash_lsh_pairs`` over old ∪ new) would re-shuffle the
    entire corpus every ingest.

    Returns ``(new_id, corpus_id, jaccard)`` with jaccard ≥ min_jaccard —
    identical to the (new × old) cross-slice of a full re-pairing, which
    is what the test asserts.
    """
    new_bands = minhash_band_index(
        new_docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        n_bands=n_bands,
        shingle_k=shingle_k,
    ).select(F.col(id_col).alias("new_id"), "band_key")
    old_bands = index.select(F.col(id_col).alias("corpus_id"), "band_key")
    cand = (
        new_bands.join(old_bands, on="band_key")
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    sh = shingles(F.col(text_col), shingle_k)
    new_sh = new_docs.select(F.col(id_col).alias("_nid"), sh.alias("sh_new"))
    old_sh = corpus.select(F.col(id_col).alias("_oid"), sh.alias("sh_old"))
    verified = (
        cand.join(new_sh, cand["new_id"] == new_sh["_nid"])
        .select("new_id", "corpus_id", "sh_new")
        .join(old_sh, F.col("corpus_id") == old_sh["_oid"])
        .select("new_id", "corpus_id", "sh_new", "sh_old")
    )
    return (
        verified.withColumn("jaccard", jaccard(F.col("sh_new"), F.col("sh_old")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            "new_id",
            "corpus_id",
            jaccard_half_up6(F.col("sh_new"), F.col("sh_old")).alias("jaccard"),
        )
    )


def jaccard_prefix_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """EXACT all-pairs token-set Jaccard ≥ t via prefix filtering (the
    AllPairs/PPJoin family) — the no-false-negative complement to MinHash.

    Theorem (prefix filter): order every token set by one GLOBAL order
    (ascending document frequency, token string as tie-break — rarest
    first); if J(x, y) ≥ t, then the first ``|x| − ⌈t·|x|⌉ + 1`` tokens of x
    and the same-length prefix of y share at least one token. So joining on
    prefix tokens only is COMPLETE, and prefixes of frequent-token-heavy
    docs are short precisely where buckets would be hottest.

    Shuffle shape at 100 TB: token-frequency join (keyed on token), per-doc
    re-aggregation (keyed on id), prefix-token self-join (keyed on token,
    carrying only (id, token)), then a by-id join to bring token sets back
    for exact verification — same narrow-payload discipline as
    minhash_lsh_pairs.

    ``max_bucket``: the prefix filter shortens hot buckets (frequent tokens
    sort LAST, so they rarely enter a prefix) but cannot bound them — a
    corpus of n short docs sharing one rare-ish token still emits ~n²/2
    candidates from that token's bucket, the super-linear growth
    ``tools/shuffle_scaling.json`` measured (exponent 1.62 sf0.01→0.1).
    With ``max_bucket=B``, each token bucket salts into ``hash(id) %
    N_SALT`` sub-buckets, each sub-bucket is deterministically ordered (md5
    of the id, then the id) and cut into chunks of ≤B docs
    (:func:`_salted_chunks` — output AND per-task input both bounded);
    candidates generate within chunks plus the :func:`_chain_edges`
    families — O(n·B) output per bucket, and a genuine duplicate cluster
    stays one connected component downstream. The trade, stated honestly: two
    docs whose ONLY shared prefix token lands them in different chunks are
    not candidates here — with near-identical sets (J ≥ t means the sets
    are mostly shared tokens) the prefixes share ~|prefix| tokens, and each
    shared token re-blocks the pair independently, so the redundancy that
    recovers chunk-split pairs grows exactly where prefixes do. ``None``
    (default) preserves the exact-complete prefix-filter theorem the
    catalog oracle restates.
    """
    # explicit-count spread before the tokenization/explode (AQE's
    # byte-based coalescing would single-thread the CPU-heavy stages of a
    # small-bytes corpus — same fix as minhash_signatures)
    n_par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(n_par, F.col(id_col)).select(
        F.col(id_col), tokens(F.col(text_col)).alias("tk")
    )
    base = base.select(id_col, F.array_distinct("tk").alias("ts"))
    tok = base.select(id_col, F.explode("ts").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (
        tok.join(freq, "tok")
        .groupBy(id_col)
        .agg(
            F.expr("transform(sort_array(collect_list(struct(df, tok))), s -> s.tok)")
            .alias("ordered_toks")
        )
    )
    n = F.size("ordered_toks")
    prefix_len = (n - F.ceil(F.lit(min_jaccard) * n) + 1).cast("int")
    pref = ordered.select(
        id_col,
        n.alias("sz"),
        F.explode(F.slice("ordered_toks", 1, prefix_len)).alias("tok"),
    )
    # the prefix self-join's OUTPUT is the expensive part (per-bucket
    # quadratic candidate generation); pin its parallelism explicitly or
    # AQE coalesces the small-bytes inputs to ~1 task
    pref = pref.repartition(n_par, "tok")
    if max_bucket is None:
        left = pref.select(
            F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "tok"
        )
        right = pref.select(
            F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "tok"
        )
        # PPJoin length filter: J(x,y) >= t forces t*|x| <= |y| <= |x|/t, so
        # size-incompatible candidates drop inside the join, before the
        # (expensive) token-set verification join ships any arrays
        cand = (
            left.join(right, "tok")
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.col("sz_b") >= F.lit(min_jaccard) * F.col("sz_a"))
                & (F.col("sz_a") >= F.lit(min_jaccard) * F.col("sz_b"))
            )
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        # same salted two-level sub-bucketing as minhash_lsh_pairs: order
        # within (tok, sub), ≤B-doc chunks, head + cross-sub chain edges —
        # no task sorts an entire hot token's bucket
        chunked = _salted_chunks(
            pref, ["tok"], id_col, max_bucket
        ).persist()
        left = chunked.select(
            F.col(id_col).alias("id_a"),
            F.col("sz").alias("sz_a"),
            "tok",
            "sub",
            "chunk",
        )
        right = chunked.select(
            F.col(id_col).alias("id_b"),
            F.col("sz").alias("sz_b"),
            "tok",
            "sub",
            "chunk",
        )
        within = (
            left.join(right, on=["tok", "sub", "chunk"])
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.col("sz_b") >= F.lit(min_jaccard) * F.col("sz_a"))
                & (F.col("sz_a") >= F.lit(min_jaccard) * F.col("sz_b"))
            )
            .select("id_a", "id_b")
        )
        # chain edges skip the length filter: they are O(n/B + N_SALT) per
        # bucket and exact verification drops under-threshold pairs anyway
        chain = _chain_edges(chunked, ["tok"], id_col)
        cand = within.union(chain).dropDuplicates(["id_a", "id_b"])
        # eager-pin the (tiny) candidate set and release the cached wide
        # frame immediately — repeated catalog/bench invocations in one
        # session must not accumulate cache (round-7 advice)
        cand = cand.localCheckpoint(eager=True)
        chunked.unpersist()
    ts_by_id = base.select(F.col(id_col).alias("_ts_id"), F.col("ts").alias("_ts"))
    verified = (
        cand.join(ts_by_id, cand["id_a"] == ts_by_id["_ts_id"])
        .select("id_a", "id_b", F.col("_ts").alias("ts_a"))
        .join(ts_by_id, F.col("id_b") == ts_by_id["_ts_id"])
        .select("id_a", "id_b", "ts_a", F.col("_ts").alias("ts_b"))
    )
    return (
        verified.withColumn("jaccard", jaccard(F.col("ts_a"), F.col("ts_b")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            "id_a",
            "id_b",
            jaccard_half_up6(F.col("ts_a"), F.col("ts_b")).alias("jaccard"),
        )
    )


def md5_hash64(col: Column) -> Column:
    """64-bit hash from the md5 digest's SECOND 8 bytes (hex chars 17–32),
    parsed as two 32-bit halves (``conv`` on 16 hex chars would saturate a
    signed long). Portable by construction: any engine with md5 + hex
    parsing restates it bit-for-bit — DuckDB:
    ``CAST('0x' || substr(md5(t), 17, 8) AS BIGINT)`` for the high half.
    Slower than xxhash64 but still JVM-side, and the whole fingerprint
    becomes oracle-checkable (same portability rationale as the md5-based
    MinHash above)."""
    hex_ = F.md5(col)
    hi = F.conv(F.substring(hex_, 17, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hex_, 25, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens.

    Per token: 64-bit md5-derived hash (portable — the DuckDB oracle
    restates the fingerprint exactly; xxhash64 would be Spark-only); per
    bit: +1 if set else −1, summed over tokens; fingerprint bit = sign of
    the sum. Documents within small Hamming distance are near-duplicates.
    One expression tree, no explode — at scale this is a pure map over the
    corpus.
    """
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(toks, lambda t: md5_hash64(t))
    one = F.lit(1).cast("long")

    # factory keeps the merge lambda binary — pyspark rejects extra
    # (defaulted) params; shiftleft stays JVM-side and wraps correctly at
    # bit 63 (a Python 1 << 63 literal would overflow LongType)
    def bit_sum(i: int):
        mask = F.shiftleft(one, i)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    bit_sums = [bit_sum(i) for i in range(64)]
    out = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    spread: bool = True,
) -> DataFrame:
    """``(id, fp)`` 64-bit SimHash fingerprints for a corpus — bit-identical
    to :func:`simhash64` but built as explode + 64 sum-aggregates, for the
    same two reasons as :func:`minhash_signatures`: the 64-tower expression
    form falls out of whole-stage codegen into interpreted evaluation, and
    the per-token hashing needs an explicit-count repartition so AQE's
    byte-based coalescing can't single-thread it.

    Docs with NO tokens (blank text) vanish from the output (the
    expression form gives them fingerprint 0); callers needing them must
    left-join back. The synthetic corpus has none.
    """
    if spread:
        n = docs.sparkSession.sparkContext.defaultParallelism
        src = docs.repartition(n, F.col(id_col))
    else:
        src = docs
    tok = src.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("_t"),
    )
    h = md5_hash64(F.col("_t"))
    one = F.lit(1).cast("long")
    sums = [
        F.sum(
            F.when(h.bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy(id_col).agg(*sums)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(
            F.col(f"_b{i}") > 0, F.shiftleft(one, i)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), fp.alias("fp"))


def canonical_selection(
    pairs: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Near-dup PAIRS → a removal MANIFEST: the keep/drop decision that
    closes a dedup pipeline (what the pair generators and
    ``emb_dup_clusters`` stop short of). Pairs collapse transitively into
    clusters (connected components — A~B~C must fold into one cluster
    even when A≁C), each cluster keeps its best member by
    ``(quality_col DESC, id ASC)`` — longest document by default, the
    standard keep rule in corpus curation — and every OTHER member emits
    one manifest row naming its canonical replacement.

    Output: ``(doc_id, canonical_id, cluster_size)``, one row per REMOVED
    document. Documents in no pair never appear (nothing to remove), and
    the manifest anti-joins cleanly against the corpus to materialize the
    deduplicated table.

    Every id referenced by ``pairs`` MUST exist in ``docs`` — a missing
    node could otherwise have been the canonical member, so the keep
    decision would silently be computed over present members only. The
    join validates this and raises ``ValueError`` naming sample missing
    ids instead of shrinking the cluster.

    Scale shape: components is the iterative piece (lineage-truncated
    large-star/small-star, operators/components.py); everything after is
    one broadcast-sized join per cluster table plus a per-cluster window
    over cluster members (bounded by the largest duplicate family, not by
    the corpus).
    """
    from data_engineering_project_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return manifest_from_components(
        comp, docs, id_col=id_col, quality_col=quality_col
    )


def manifest_from_components(
    comp: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """The keep-best step of :func:`canonical_selection`, factored so an
    already-maintained component assignment (e.g. the streaming incremental
    state in streaming/pipeline.py:upsert_components_incremental) produces
    the same removal manifest without recomputing components.

    ``comp`` is ``(node, component)``; output and validation semantics are
    exactly :func:`canonical_selection`'s.
    """
    from pyspark.sql import Window

    # existence is tracked by an explicit marker, NOT by quality
    # nullness: a doc that EXISTS with a NULL quality value must join the
    # keep-best ranking (it sorts last under DESC on both engines), not
    # masquerade as a missing node (null-fuzz finding)
    quality = docs.select(
        F.col(id_col).alias("node"),
        F.col(quality_col).alias("_q"),
        F.lit(1).alias("_present"),
    )
    joined = comp.select("node", "component").join(quality, "node", "left")
    missing = [
        r["node"]
        for r in joined.filter(F.col("_present").isNull()).limit(5).collect()
    ]
    if missing:
        raise ValueError(
            f"pair ids absent from docs.{id_col} (first 5): {missing} — "
            "a missing node could have been the canonical member"
        )
    sized = (
        joined
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("component")),
        )
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("_q"), F.asc("node")
    )
    ranked = sized.withColumn("_rk", F.row_number().over(w))
    canon = ranked.filter(F.col("_rk") == 1).select(
        "component", F.col("node").alias("canonical_id")
    )
    return (
        ranked.filter(F.col("_rk") > 1)
        .join(canon, "component")
        .select(
            F.col("node").alias(id_col),
            "canonical_id",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram of words, slide a
    window of ``w`` consecutive k-gram hashes, keep each window's MINIMUM.
    The selected set is guaranteed to share a fingerprint with any other
    document containing a common word run of length ≥ k + w - 1 — which
    makes fingerprint EQUALITY a complete detector for long shared
    substrings (the "Deduplicating Training Data" use case, Lee et al.)
    at a density of ~2/(w+1) of the k-gram count, via a plain equi-join
    instead of suffix arrays.

    Scale shape: MAP-ONLY — the gram hashes, per-window minima, and
    in-document dedup are all array expressions inside one row, so the
    only rows that ever leave the scan are the SELECTED fingerprints
    (~2/(w+1) of the grams) and nothing shuffles before the downstream
    fp join. (A first implementation exploded every gram through a per-doc
    window min — a corpus-sized shuffle just to pick minima the row
    already holds.) Hashes are md5 hex strings so the selection order
    (lexicographic min) restates identically in SQL.

    Returns DISTINCT ``(id_col, fp)``. Documents shorter than
    k + w - 1 words yield no fingerprints (no full window exists).
    """

    def _seq1(n: Column) -> Column:
        # sequence(1, 0) counts DOWN in Spark — short docs must yield an
        # empty position list, not [1, 0]
        return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    def _let(value: Column, body) -> Column:
        # bind an intermediate as a LAMBDA VARIABLE (transform over a
        # 1-element array) so it is evaluated once per row. Leaving it as a
        # projected column invites CollapseProject to inline its defining
        # expression at every reference — measured here as the md5 gram
        # array recomputed PER WINDOW POSITION, an O(G²) hash blow-up that
        # turned a 2 s scan into minutes.
        return F.element_at(F.transform(F.array(value), body), 1)

    def _fps_of(t: Column) -> Column:
        hs = F.transform(
            _seq1(F.greatest(F.size(t) - (k - 1), F.lit(0))),
            lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, k))),
        )
        return _let(
            hs,
            lambda h: F.array_distinct(
                F.transform(
                    _seq1(F.size(h) - (w - 1)),  # full windows only
                    lambda p: F.array_min(F.slice(h, p, w)),
                )
            ),
        )

    fps = _let(F.split(F.trim(F.col(text_col)), r"\s+"), _fps_of)
    # EXPLICIT partition count before the md5-heavy projection: a small-file
    # corpus scans as ~1 partition and AQE's byte-based coalescing cannot
    # see per-row CPU (ROADMAP codegen-cliff/AQE rule) — one task would
    # hash every gram. At real corpus scale the scan's own parallelism
    # makes this exchange a no-op-sized reshuffle of (id, text).
    n = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n, F.col(id_col)).select(
        F.col(id_col), F.explode(fps).alias("fp")
    )
