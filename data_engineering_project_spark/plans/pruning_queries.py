"""Scale-pruning primitives: Bloom-filter semi-join pruning and
class-balanced downsampling.

Beyond-reference family (SURVEY.md §2.11). Both queries attack the same
100 TB problem — shrinking what a join or a training mix has to touch —
from two directions:

- **Bloom filter**: a fixed-size bit table summarizing a key SET. At scale
  the member side may hold billions of keys, but the filter stays O(m)
  bits and broadcasts to every probe task, pruning the probe side
  map-side before any shuffle (this is exactly what Spark's runtime
  `InjectRuntimeFilter` does with its own BloomFilterAggregate — proven
  firing in tests/test_plan_quality.py; this query materializes the
  structure itself so its false-positive behavior is observable data).
  The hash functions are portable MD5 bucket hashes (the repo's
  deterministic-sampling primitive), so DuckDB builds the bit-identical
  filter and the false-positive COUNT — normally a probabilistic quantity
  — is exactly oracle-checkable.

- **Balanced downsample**: per-class keep-rates derived FROM the observed
  class counts (rate_c = min-count / count_c), i.e. `sampleBy` where the
  fractions come from a first aggregation pass instead of a config
  literal. Membership is the deterministic hash-bucket filter, so the
  sampled set is reproducible on any cluster — the property a 100 TB
  training-mix rebuild needs. Integer-only rate arithmetic keeps the
  threshold off float boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.sampling import (
    N_BUCKETS,
    hash_bucket,
)
from data_engineering_project_spark.plans.catalog import register
from data_engineering_project_spark.sources.tables import load_table

#: Bloom geometry: m bits, k hash functions. m is sized for the synthetic
#: data's ~thousands of members at a few-percent fp rate; at 100 TB you'd
#: scale m with the member cardinality estimate (the query's structure is
#: unchanged — the filter stays broadcastable for m up to ~10^9 bits).
BLOOM_M = 8192
BLOOM_K = 3


def _positions(key) -> "F.Column":
    """All k portable hash positions of ``key`` (operators/sketch.py:
    bloom_positions — the DuckDB oracle restates the MD5 bucket hash
    verbatim)."""
    from data_engineering_project_spark.operators.sketch import (
        bloom_positions,
    )

    return bloom_positions(key, m=BLOOM_M, k=BLOOM_K)


@register(
    "events_bloom_prune_witness",
    sql=f"""
    WITH members AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    probes AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ),
    seeds AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i),
    bloom AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5('bloom' || CAST(i AS VARCHAR) || ':'
                                        || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {BLOOM_M} AS pos
        FROM members, seeds
    ),
    probe_hits AS (
        SELECT p.user_id,
               count(b.pos) AS n_hits
        FROM (SELECT user_id,
                     CAST(('0x' || substr(md5('bloom' || CAST(i AS VARCHAR)
                                              || ':'
                                              || CAST(user_id AS VARCHAR)),
                                          1, 8))
                          AS BIGINT) % {BLOOM_M} AS pos
              FROM probes, seeds) p
        LEFT JOIN bloom b ON b.pos = p.pos
        GROUP BY p.user_id
    ),
    passed AS (
        SELECT user_id FROM probe_hits WHERE n_hits = {BLOOM_K}
    )
    SELECT CAST((SELECT count(*) FROM members) AS BIGINT) AS n_members,
           CAST((SELECT count(*) FROM bloom) AS BIGINT) AS n_set_bits,
           CAST((SELECT count(*) FROM probes) AS BIGINT) AS n_probes,
           CAST((SELECT count(*) FROM passed) AS BIGINT) AS n_passed,
           CAST((SELECT count(*) FROM probes p
                 WHERE p.user_id IN (SELECT user_id FROM members))
                AS BIGINT) AS n_true_members,
           CAST((SELECT count(*) FROM passed x
                 WHERE x.user_id NOT IN (SELECT user_id FROM members))
                AS BIGINT) AS n_false_positives
    """,
    doc="Bloom-filter semi-join pruning, materialized: build an m="
    f"{BLOOM_M}-bit/k={BLOOM_K}-hash filter over purchaser user_ids, probe "
    "every clicker through it, and report pass/true-member/false-positive "
    "counts. The filter is the DISTINCT set-bit table (≤ m rows regardless "
    "of member cardinality — the broadcastable summary that prunes a "
    "shuffle join map-side at 100 TB, where broadcasting the raw key set "
    "is impossible). Portable MD5 bucket hashes make the whole structure "
    "engine-reproducible: DuckDB builds the bit-identical filter, so even "
    "the false-positive count hash-matches. No false negative is possible "
    "by construction (every member sets its own bits) — the oracle "
    "verifies n_passed ≥ n_true_members implicitly via the exact counts.",
    tags=("sketch", "join", "pruning"),
)
def events_bloom_prune_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    members = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    probes = (
        ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    )
    bloom = (
        members.select(
            F.explode(
                _positions(F.col("user_id"))
            ).alias("pos")
        )
        .distinct()
    )
    probe_pos = probes.select(
        "user_id",
        F.explode(
            _positions(F.col("user_id"))
        ).alias("pos"),
    )
    # the filter is tiny by construction — broadcast it to every probe task
    hits = (
        probe_pos.join(F.broadcast(bloom), "pos", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_hits"))
    )
    passed = hits.filter(F.col("n_hits") == BLOOM_K).select("user_id")
    true_members = probes.join(members, "user_id", "left_semi")
    false_pos = passed.join(members, "user_id", "left_anti")
    counts = [
        members.agg(F.count("*").cast("bigint").alias("n_members")),
        bloom.agg(F.count("*").cast("bigint").alias("n_set_bits")),
        probes.agg(F.count("*").cast("bigint").alias("n_probes")),
        passed.agg(F.count("*").cast("bigint").alias("n_passed")),
        true_members.agg(F.count("*").cast("bigint").alias("n_true_members")),
        false_pos.agg(F.count("*").cast("bigint").alias("n_false_positives")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


@register(
    "events_balanced_downsample",
    sql=f"""
    WITH counts AS (
        SELECT event_type, count(*) AS cnt FROM events GROUP BY 1
    ),
    thresholds AS (
        SELECT event_type,
               cnt,
               LEAST({N_BUCKETS},
                     ({N_BUCKETS} * (SELECT min(cnt) FROM counts)) // cnt)
                   AS thr
        FROM counts
    ),
    kept AS (
        SELECT e.event_type, e.event_id
        FROM events e JOIN thresholds t ON t.event_type = e.event_type
        WHERE CAST(('0x' || substr(md5('balance-v1'
                                       || CAST(e.event_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % {N_BUCKETS} < t.thr
    )
    SELECT t.event_type,
           CAST(t.cnt AS BIGINT) AS n_total,
           CAST(t.thr AS BIGINT) AS keep_bucket_threshold,
           CAST(count(k.event_id) AS BIGINT) AS n_kept,
           CAST(sum(k.event_id) AS HUGEINT)::VARCHAR AS kept_id_checksum
    FROM thresholds t LEFT JOIN kept k ON k.event_type = t.event_type
    GROUP BY t.event_type, t.cnt, t.thr
    ORDER BY t.event_type
    """,
    doc="Class-balanced downsampling: derive per-type keep-rates from the "
    "observed counts (rate_c = min-count/count_c, integer bucket "
    "arithmetic — no float thresholds), then keep rows by the "
    "deterministic MD5 hash-bucket filter. This is `sampleBy` with "
    "DATA-DERIVED fractions — the 'equalize class frequencies' operator "
    "of training-mix curation — and, unlike df.sample, the kept set is "
    "bit-reproducible on any cluster/partitioning (the checksum of kept "
    "ids hash-matches DuckDB). Two passes: a map-side-combined count agg "
    "(|types| rows, broadcast back), then one filtered scan — no shuffle "
    "of the raw rows at all. The id checksum routes through DECIMAL38/"
    "HUGEINT (Σ event_id overflows 2**63 near 10^10 rows) and is emitted "
    "as a string (the driver compare is string-safe for exact integers).",
    tags=("sampling", "curation", "pruning"),
)
def events_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    # the min over |types| rows is a window on the tiny aggregate (no
    # crossJoin, no second scan of the raw table); persist the thresholds
    # frame because it feeds BOTH the broadcast keep-filter and the final
    # report join — unpersisted, each use would re-run the counting scan
    thresholds = counts.withColumn(
        "min_cnt", F.min("cnt").over(Window.partitionBy())
    ).select(
        "event_type",
        "cnt",
        # integral `div`, not `/` (which is double division in Spark):
        # exact at any count magnitude, and identical to DuckDB's `//`
        F.expr(
            f"least(CAST({N_BUCKETS} AS BIGINT), "
            f"(CAST({N_BUCKETS} AS BIGINT) * min_cnt) div cnt)"
        ).alias("thr"),
    )
    thresholds = thresholds.persist()
    kept = (
        ev.join(F.broadcast(thresholds), "event_type")
        .filter(hash_bucket(F.col("event_id"), salt="balance-v1") < F.col("thr"))
        .select("event_type", "event_id")
    )
    kept_agg = kept.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum(F.col("event_id").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("kept_id_checksum"),
    )
    return (
        thresholds.join(F.broadcast(kept_agg), "event_type", "left")
        .select(
            "event_type",
            F.col("cnt").cast("bigint").alias("n_total"),
            F.col("thr").cast("bigint").alias("keep_bucket_threshold"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.col("kept_id_checksum"),
        )
        .orderBy("event_type")
    )
