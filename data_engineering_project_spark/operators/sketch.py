"""Count-min sketch: fixed-size frequency summaries as DataFrames.

At 100 TB an exact ``groupBy(key).count()`` carries aggregation state
proportional to the number of distinct keys — fine for hundreds of
millions, hostile for billions of long-tail keys (user ids, URLs,
n-grams). A count-min sketch (Cormode & Muthukrishnan 2005) bounds the
state at ``depth × width`` counters regardless of cardinality, at the
price of a one-sided overestimate: ``true ≤ est ≤ true + eps·N`` with
probability ``1 − (1/2)^depth`` for ``eps = e/width``.

Spark-first representation: the sketch IS a DataFrame of
``(row_idx, bucket, cnt)`` — at most ``depth × width`` rows. Building it
is one pass: each input row explodes into ``depth`` (row_idx, bucket)
probes hashed JVM-side with ``xxhash64`` (no Python UDFs), then a hash
aggregate whose map-side partial combine caps every partition's shuffle
contribution at ``depth × width`` rows — the shuffle is sketch-sized,
not data-sized. Estimation is a broadcast join of the candidate keys'
probes against the sketch and a ``min(cnt)`` per key.

The classic two-pass heavy-hitter query (pass 1: build sketch; pass 2:
estimate candidates, keep ``est ≥ φ·N``) never materializes per-key
exact state. Guarantees (never underestimates; recall of true heavy
hitters is 100%) are property-tested in tests/test_sketch.py.

No reference analog (SURVEY.md §2.4 lists approximate aggregates as
absent); this is part of the training-data-pipeline surface alongside
dedup and similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default geometry: eps = e/2048 ≈ 0.13%, delta = (1/2)^4 ≈ 6%.
DEPTH = 4
WIDTH = 2048


def _probes(key: Column, depth: int, width: int, seed: int) -> Column:
    """Array of ``depth`` structs (row_idx, bucket) for one key value.

    Row ``i`` uses an independent hash by folding ``seed + i`` into
    xxhash64's seed argument; ``pmod`` keeps buckets in [0, width).
    """
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )


def count_min_sketch(
    df: DataFrame,
    key: str,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
    seed: int = 42,
) -> DataFrame:
    """One-pass CMS build → ``(row_idx, bucket, cnt)``, ≤ depth×width rows.

    Partial aggregation bounds the shuffle at depth×width rows per input
    partition, so the network cost is independent of data volume.
    """
    return (
        df.select(F.explode(_probes(F.col(key), depth, width, seed)).alias("p"))
        .groupBy(F.col("p.row_idx").alias("row_idx"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key: str,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
    seed: int = 42,
) -> DataFrame:
    """Point-query the sketch for every row of ``candidates``.

    Returns ``candidates`` + ``est_count``. The sketch (≤ depth×width
    rows) is broadcast, so estimation adds no shuffle beyond the
    per-key min-merge; a bucket never hit during the build means the
    true count is 0 and the min over present probes is still an upper
    bound, so missing joins coalesce to 0.
    """
    probed = candidates.select(
        F.col(key), F.explode(_probes(F.col(key), depth, width, seed)).alias("p")
    ).select(key, "p.row_idx", "p.bucket")
    return (
        probed.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key: str,
    *,
    threshold_frac: float,
    depth: int = DEPTH,
    width: int = WIDTH,
    seed: int = 42,
) -> DataFrame:
    """Two-pass φ-heavy-hitters: keys whose estimated count ≥ φ·N.

    Pass 1 builds the sketch (sketch-sized shuffle); pass 2 estimates
    each distinct key and filters. CMS never underestimates, so every
    true heavy hitter survives (perfect recall); collisions can admit a
    near-threshold false positive — precision is governed by width.
    Returns ``(key, est_count, total_count)`` ordered by est desc.
    """
    sketch = count_min_sketch(df, key, depth=depth, width=width, seed=seed)
    total = df.count()
    est = cms_estimate(
        sketch, df.select(key).distinct(), key, depth=depth, width=width, seed=seed
    )
    return (
        est.filter(F.col("est_count") >= threshold_frac * total)
        .withColumn("total_count", F.lit(total))
        .orderBy(F.col("est_count").desc(), F.col(key))
    )
