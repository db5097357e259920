"""Shard / split manifest queries over `documents`.

The query-side contracts of `operators/sharding.py`: shard membership and
train/val/test splits are pure row functions (portable md5 buckets), so
both manifests are oracle-checked in DuckDB with the identical hash
restated in SQL — an auditor can re-derive every assignment without Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.sampling import hash_bucket
from data_engineering_project_spark.operators.sharding import assign_shard
from data_engineering_project_spark.plans.catalog import register
from data_engineering_project_spark.sources.tables import load_table

N_SHARDS = 16

#: split thresholds over the 10k-bucket space: 80 / 10 / 10
TRAIN_LT, VAL_LT = 8_000, 9_000


@register(
    "docs_shard_manifest",
    sql=f"""
    WITH sharded AS (
        SELECT doc_id, n_chars, source,
               CAST((CAST(('0x' || substr(md5('shard-v1' || CAST(doc_id AS VARCHAR)),
                                          1, 8)) AS BIGINT) % 10000) % {N_SHARDS}
                    AS INTEGER) AS shard_id
        FROM documents
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM sharded GROUP BY shard_id
    """,
    doc=f"Training-shard manifest: deterministic shard assignment "
    f"(md5-bucket mod {N_SHARDS}, operators/sharding.py:assign_shard) with "
    "per-shard row/byte totals and source mixing (n_sources ≈ all sources "
    "per shard proves the global mix). Membership is a pure row function — "
    "same corpus + salt → identical shards on any cluster, any "
    "partitioning, any engine; the oracle re-derives every assignment in "
    "SQL. The manifest itself is one map-side-combinable aggregation.",
    tags=("sharding", "curation", "agg"),
)
def docs_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            assign_shard(F.col("doc_id"), N_SHARDS).alias("shard_id"),
            "doc_id",
            "n_chars",
            "source",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@register(
    "docs_split_manifest",
    sql=f"""
    WITH tagged AS (
        SELECT lang, n_chars,
               CASE
                   WHEN b < {TRAIN_LT} THEN 'train'
                   WHEN b < {VAL_LT} THEN 'val'
                   ELSE 'test'
               END AS split
        FROM (
            SELECT lang, n_chars,
                   CAST(('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 10000 AS b
            FROM documents
        )
    ),
    counts AS (
        SELECT lang, split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM tagged GROUP BY lang, split
    )
    SELECT lang, split, n_docs, total_chars,
           CAST(round(n_docs * 10000.0 / sum(n_docs) OVER (PARTITION BY lang))
                AS BIGINT) AS frac_bp
    FROM counts
    """,
    doc="Stratified train/val/test split manifest (80/10/10 by md5 bucket, "
    "salt 'split-v1'): per (lang, split) document and char counts plus the "
    "realized within-language fraction in basis points. Assignment is a "
    "pure row function — reproducible on any engine, monotone under "
    "corpus growth (a doc never changes split when others are added), and "
    "leak-free (membership depends only on doc_id). Map-only tag + one "
    "aggregation; the per-lang fraction reuses the tiny post-agg frame.",
    tags=("sharding", "curation", "sampling"),
)
def docs_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), salt="split-v1")
    tagged = d.select(
        "lang",
        "n_chars",
        F.when(b < TRAIN_LT, F.lit("train"))
        .when(b < VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    counts = tagged.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    lang_total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return counts.select(
        "lang",
        "split",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs") * 10000.0 / lang_total)
        .cast("bigint")
        .alias("frac_bp"),
    )


@register(
    "docs_shuffle_positions",
    sql=f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST((CAST(('0x' || substr(md5('shuffle-v1' ||
                                          CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 10000) % {N_SHARDS}
                    AS INTEGER) AS shard_id,
               md5('shuffle-v1' || CAST(doc_id AS VARCHAR)) AS order_key
        FROM documents
    )
    SELECT doc_id, shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id
                                   ORDER BY order_key, doc_id)
                AS BIGINT) AS pos
    FROM keyed
    """,
    doc="Deterministic global training shuffle as a two-level manifest: "
    "shard = md5-bucket mod N (salt 'shuffle-v1'), position = rank of the "
    "full md5 digest WITHIN the shard (doc_id tie-break). A reader that "
    "walks shards in id order and each shard in pos order sees a "
    "pseudorandom permutation of the corpus — yet no global sort ever "
    "runs: the only exchange is the hash partition on shard_id and the "
    "sort is per-shard (1/N of the data, the write_training_shards "
    "layout). Epoch reshuffles are a salt change, not a data move "
    "decision; the same salt reproduces the same permutation on any "
    "engine, which is what makes training runs resumable and auditable.",
    tags=("sharding", "sampling", "curation"),
)
def docs_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        assign_shard(F.col("doc_id"), N_SHARDS, salt="shuffle-v1").alias(
            "shard_id"
        ),
        F.md5(F.concat(F.lit("shuffle-v1"), F.col("doc_id").cast("string")))
        .alias("order_key"),
    )
    w = Window.partitionBy("shard_id").orderBy("order_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "docs_neyman_allocation",
    sql="""
    WITH m AS (
        SELECT lang,
               CAST(count(*) AS HUGEINT) AS nh,
               CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s,
               CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS ss
        FROM documents GROUP BY lang
    ),
    sd AS (
        SELECT lang, nh,
               sqrt(CAST(nh * ss - s * s AS DOUBLE)) / CAST(nh AS DOUBLE)
                   AS sigma
        FROM m
    ),
    w AS (
        SELECT lang, nh, sigma,
               CAST(floor(CAST(nh AS DOUBLE) * sigma * 1000000 + 0.5)
                    AS HUGEINT) AS t_micro
        FROM sd
    ),
    base AS (
        SELECT lang, nh, sigma, t_micro,
               sum(t_micro) OVER () AS denom,
               (1000 * t_micro) // sum(t_micro) OVER () AS alloc0,
               1000 * t_micro
                   - ((1000 * t_micro) // sum(t_micro) OVER ())
                     * sum(t_micro) OVER () AS rem_i
        FROM w
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY rem_i DESC, lang) AS rr,
               CAST(1000 - sum(alloc0) OVER () AS BIGINT) AS leftover
        FROM base
    )
    SELECT lang,
           CAST(nh AS BIGINT) AS stratum_size,
           CAST(floor(sigma * 10000 + 0.5) AS BIGINT) AS sigma_e4,
           CAST(alloc0 + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked
    """,
    doc="Neyman-optimal stratified-sample allocation of a 1000-doc budget "
    "across languages: n_h proportional to N_h * sigma_h (stratum size x "
    "population std of n_chars), the allocation that minimizes the "
    "estimator variance for a fixed budget — what proportional "
    "allocation (`docs_split_manifest`'s hash splits) ignores when "
    "strata differ in spread. Per-stratum sigma derives from exact "
    "HUGEINT/DECIMAL38 moments (sqrt(N*SS - S^2)/N — one sqrt on a "
    "bit-identical integer); each N_h*sigma_h term is floor-quantized "
    "to integer micro-units PER STRATUM before the cross-strata sum "
    "(the events_type_dow_pmi device — a raw double sum over "
    "shuffle-ordered strata would be accumulation-order-dependent), so "
    "the share denominator, the floor(1000*share) base allocation "
    "(exact integer `div`), and the largest-remainder ranking (integer "
    "remainders, ties broken by lang) are all order-independent "
    "integers. One map-side-combined pass over the corpus; everything "
    "after is metadata-sized.",
    tags=("sampling", "sharding", "stats"),
)
def docs_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    dec38 = "decimal(38,0)"
    d = load_table(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast(dec38)
    m = d.groupBy("lang").agg(
        F.count("*").cast(dec38).alias("nh"),
        F.sum(nc).alias("s"),
        F.sum(nc * nc).alias("ss"),
    )
    sigma = (
        F.sqrt((F.col("nh") * F.col("ss") - F.col("s") * F.col("s")).cast("double"))
        / F.col("nh").cast("double")
    )
    sd = m.select("lang", "nh", sigma.alias("sigma"))
    wall = Window.partitionBy()
    # per-stratum micro-quantization BEFORE the cross-strata sum: the share
    # denominator must be an integer sum (a raw double sum over
    # shuffle-ordered strata is accumulation-order-dependent)
    w = sd.select(
        "lang",
        "nh",
        "sigma",
        F.floor(
            F.col("nh").cast("double") * F.col("sigma") * 1_000_000
            + F.lit(0.5)
        )
        .cast(dec38)
        .alias("t_micro"),
    )
    denom = F.sum("t_micro").over(wall)
    # exact integer floor division (`div`) keeps floor(1000*share) and the
    # largest-remainder ordering free of any double rounding
    alloc0 = F.expr(
        "(CAST(1000 AS DECIMAL(38,0)) * t_micro) div _denom"
    )
    base = w.withColumn("_denom", denom).select(
        "lang",
        "nh",
        "sigma",
        alloc0.alias("alloc0"),
        (
            F.lit(1000).cast(dec38) * F.col("t_micro")
            - alloc0.cast(dec38) * F.col("_denom")
        ).alias("rem_i"),
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("rem_i"), F.asc("lang")))
        .alias("rr"),
        (F.lit(1000) - F.sum("alloc0").over(wall)).cast("bigint").alias(
            "leftover"
        ),
    )
    return ranked.select(
        "lang",
        F.col("nh").cast("bigint").alias("stratum_size"),
        F.floor(F.col("sigma") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("sigma_e4"),
        (
            F.col("alloc0")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    )


@register(
    "docs_leakage_safe_split",
    sql=f"""
    WITH base AS (
        SELECT doc_id, n_chars,
               md5(translate(trim(text),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                   'abcdefghijklmnopqrstuvwxyz')) AS fp
        FROM documents
    ),
    tagged AS (
        SELECT n_chars, fp,
               CASE WHEN bn < {TRAIN_LT} THEN 'train'
                    WHEN bn < {VAL_LT} THEN 'val'
                    ELSE 'test' END AS sn,
               CASE WHEN bf < {TRAIN_LT} THEN 'train'
                    WHEN bf < {VAL_LT} THEN 'val'
                    ELSE 'test' END AS ss
        FROM (
            SELECT n_chars, fp,
                   CAST(('0x' || substr(md5('split-v1'
                                            || CAST(doc_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 10000 AS bn,
                   CAST(('0x' || substr(md5('split-fp-v1' || fp),
                                        1, 8)) AS BIGINT) % 10000 AS bf
            FROM base
        )
    ),
    long AS (
        SELECT 'naive' AS scheme, sn AS split, fp, n_chars FROM tagged
        UNION ALL
        SELECT 'fp_safe', ss, fp, n_chars FROM tagged
    ),
    grp AS (
        SELECT scheme, split, fp,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM long GROUP BY 1, 2, 3
    ),
    w AS (
        SELECT *, count(*) OVER (PARTITION BY scheme, fp) AS n_splits
        FROM grp
    )
    SELECT scheme, split,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS straddling_groups,
           CAST(sum(chars) AS BIGINT) AS total_chars
    FROM w GROUP BY scheme, split
    """,
    doc="Dedup-aware (leakage-safe) train/val/test split, with the leakage "
    "audit that justifies it: assigning splits by doc_id hash (the naive "
    "scheme, docs_split_manifest's rule) lets DUPLICATE documents straddle "
    "train and test — memorized-copy eval contamination. The safe scheme "
    "buckets on the normalized content FINGERPRINT "
    "(operators/text.py:fingerprint — ASCII fold + trim + md5), so every "
    "copy of a document lands in the same split by construction. Emits one "
    "row per (scheme, split): docs, fingerprint groups, groups that "
    "STRADDLE >1 split under that scheme (the leakage count — provably 0 "
    "for every fp_safe row, measured >0 for naive wherever dupes exist), "
    "and chars. Scale shape: one map-side tag, one shuffle keyed on the "
    "32-byte fingerprint (the same key exact dedup pays), then a window "
    "over the fp-cell table — never over raw docs; assignment stays a pure "
    "row function, reproducible on any engine/partitioning and monotone "
    "under corpus growth.",
    tags=("sharding", "curation", "dedup", "sampling"),
)
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from data_engineering_project_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents")
    fp = T.fingerprint(F.col("text"))

    def tag(b):
        return (
            F.when(b < TRAIN_LT, F.lit("train"))
            .when(b < VAL_LT, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    tagged = d.select(
        fp.alias("fp"),
        "n_chars",
        tag(hash_bucket(F.col("doc_id"), salt="split-v1")).alias("sn"),
        tag(hash_bucket(fp, salt="split-fp-v1")).alias("ss"),
    )
    long = tagged.selectExpr(
        "fp", "n_chars", "stack(2, 'naive', sn, 'fp_safe', ss) AS (scheme, split)"
    )
    grp = long.groupBy("scheme", "split", "fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    # windowed straddle count (NOT a self-join: a NULL fingerprint — NULL
    # text — is a real group, and join keys would drop it on both engines
    # while window partitions keep it)
    n_splits = F.count(F.lit(1)).over(Window.partitionBy("scheme", "fp"))
    return (
        grp.withColumn("n_splits", n_splits)
        .groupBy("scheme", "split")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum((F.col("n_splits") > 1).cast("int"))
            .cast("bigint")
            .alias("straddling_groups"),
            F.sum("chars").cast("bigint").alias("total_chars"),
        )
    )
