"""A/B: events_cms_heavy_hitters build-shape levers (round-12).

At the big sf0.1 -> sf0.5 denominator the CMS row read slope 7.3 with a
solid 3.8 s Spark marginal — the first time this query's weakness has been
measurable above the noise floor (two prior A/As were on sub-0.7 s
absolutes). The incumbent md5-hashes the STREAM (one digest per 4 depth
rows per event) and then rescans the table for distinct candidate keys.

- v1_weighted_preagg: exact per-key counts first (map-side-combined
  HashAggregate; shuffle = distinct-keys-per-partition), then the sketch
  is built from the WEIGHTED key table — md5 per DISTINCT key (~1.5k/sf0.1
  vs 100k stream rows) — and pass 2 probes the same key frame, removing
  the second table scan. CMS(weighted counts) == CMS(stream) exactly, so
  the estimated counts (collisions included) are bit-identical.

NOTE the architectural trade documented in operators/sketch.py: the
stream-shaped build's shuffle is sketch-sized INDEPENDENT of key
cardinality (the 100 TB long-tail story); the pre-agg variant's shuffle is
bounded by distinct keys per partition. r4b A/B-rejected pre-agg when the
hasher was xxhash64-cheap; md5 (the engine-portable hasher the oracle
restates) changed the constant structure, so re-measure.

Run:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_cms.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import sketch as K
from data_engineering_project_spark.plans.extended_queries import (
    events_cms_heavy_hitters,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab

DEPTH, WIDTH, SEED = K.DEPTH, K.WIDTH, 42
THRESH = 0.008


def v1_weighted_preagg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.groupBy("user_id").agg(F.count("*").alias("w"))
    probed = keyed.select(
        "user_id",
        "w",
        F.explode(
            K._probes(F.col("user_id"), DEPTH, WIDTH, SEED, "md5")
        ).alias("p"),
    ).select("user_id", "w", "p.row_idx", "p.bucket")
    from pyspark.storagelevel import StorageLevel

    probed = probed.persist(StorageLevel.MEMORY_AND_DISK)
    sketch = probed.groupBy("row_idx", "bucket").agg(
        F.sum("w").alias("cnt")
    )
    sketch_rows = sketch.collect()
    total = sum(r["cnt"] for r in sketch_rows if r["row_idx"] == 0)
    sketch_local = spark.createDataFrame(sketch_rows, sketch.schema)
    est = (
        probed.join(F.broadcast(sketch_local), ["row_idx", "bucket"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
    return (
        est.filter(F.col("est_count") >= THRESH * total)
        .withColumn("total_count", F.lit(total))
        .orderBy(F.col("est_count").desc(), "user_id")
    )


if __name__ == "__main__":
    run_ab(
        {
            "v0_stream_md5": events_cms_heavy_hitters,
            "v1_weighted_preagg": v1_weighted_preagg,
        }
    )
