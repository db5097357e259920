"""Stage attribution for the two CC-consumer residual marginals (r13
verdict #2): pair stage vs CC rounds vs consumer aggregation.

Times three nested prefixes of each CC consumer with the bench protocol
(untimed warmup, median of 3 noop-sink runs) in ONE fresh process per
invocation (the r13 session-degradation lesson — callers alternate
processes; the r14 checkpoint freeing bounds within-process accumulation
but fresh processes keep the numbers clean):

    edges   — _blocked_pairs(...).filter(c >= 0.35)      (Arrow pair stage)
    comp    — connected_components(edges)                 (adds the CC loop)
    full    — the registered query                        (adds manifest agg)

marginal(stage) at sf0.5 minus sf0.1 attributes each layer:
CC-rounds cost = comp − edges; consumer-agg cost = full − comp.

Usage:
    python tools/ab_cc_residual.py <query> <stage> <sf_dir>
    # e.g. for q in emb_dup_clusters docs_canonical_manifest; do
    #        for st in edges comp full; do
    #          for sf in /root/testdata/sf0.1 /root/repo/.localdata/sf0.5; do
    #            python tools/ab_cc_residual.py $q $st $sf; done; done; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

QUERY = sys.argv[1]
STAGE = sys.argv[2]
SF_DIR = sys.argv[3]


def _frame(spark):
    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators.components import (
        connected_components,
    )
    from data_engineering_project_spark.plans.extended_queries import (
        _blocked_pairs,
    )

    edges = _blocked_pairs(spark, SF_DIR).filter(F.col("c") >= 0.35)
    if STAGE == "edges":
        return edges
    comp = connected_components(
        edges.select("id_a", "id_b"), src="id_a", dst="id_b"
    )
    if STAGE == "comp":
        return comp
    import __spark_entry__ as entrymod

    return entrymod.queries()[QUERY](spark, SF_DIR)


def main() -> None:
    from data_engineering_project_spark.session import get_spark

    spark = get_spark(
        app_name="ab_cc_residual",
        master=f"local[{bench.CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(bench.CPUS) * 2, 8)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    _frame(spark).write.format("noop").mode("overwrite").save()  # warmup
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _frame(spark).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    print(
        json.dumps(
            {
                "query": QUERY,
                "stage": STAGE,
                "sf_dir": SF_DIR,
                "median": round(samples[1], 3),
                "spread": round(samples[-1] - samples[0], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
