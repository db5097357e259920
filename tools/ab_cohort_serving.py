"""Phase attribution for events_cohort_serving (r13 verdict #4).

The headliner's cost is its construction: five upsert_cohort_state writer
invocations (batch 1 delivered twice, batch 2 killed mid-swap then
replayed) + the state-read grid collect. Times each phase with the bench
session (untimed warm pass first), and reports the state-dir file counts
(guide §6: many tiny files per swap would tax every subsequent
_recover_and_read).

Usage: python tools/ab_cohort_serving.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def run_once(spark, record: dict | None) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_engineering_project_spark.sources.tables import load_table
    from data_engineering_project_spark.streaming import pipeline
    from data_engineering_project_spark.streaming.pipeline import (
        read_cohort_retention,
        upsert_cohort_state,
    )

    def tick(name, t0):
        if record is not None:
            record[name] = record.get(name, 0.0) + (time.perf_counter() - t0)
        return time.perf_counter()

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts"
    )
    tmp = tempfile.mkdtemp(prefix="ab_cohort_")
    real_swap = pipeline._atomic_swap_write
    files = {}
    try:
        writer = upsert_cohort_state(tmp, time_col="ts")
        batches = [
            ev.filter(
                F.coalesce(F.pmod("event_id", F.lit(3)), F.lit(0)) == i
            )
            for i in range(3)
        ]
        t0 = time.perf_counter()
        writer(batches[0], 0)
        t0 = tick("w0", t0)
        writer(batches[1], 1)
        t0 = tick("w1", t0)
        writer(batches[1], 1)
        t0 = tick("w1_replay", t0)

        calls = {"n": 0}

        def _dying_swap(merged, target_dir):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("killed between component swaps")
            real_swap(merged, target_dir)

        pipeline._atomic_swap_write = _dying_swap
        try:
            writer(batches[2], 2)
        except RuntimeError:
            pass
        finally:
            pipeline._atomic_swap_write = real_swap
        t0 = tick("w2_dying", t0)
        writer(batches[2], 2)
        t0 = tick("w2_replay", t0)
        for comp in ("first_touch", "user_weeks"):
            d = os.path.join(tmp, comp)
            files[comp] = sum(
                1 for f in os.listdir(d) if f.endswith(".parquet")
            )
        rows = read_cohort_retention(spark, tmp).collect()
        t0 = tick("read", t0)
        spark.createDataFrame(
            [
                (
                    r["cohort_week"],
                    None if r["week_offset"] is None else int(r["week_offset"]),
                    int(r["n_users"]),
                )
                for r in rows
            ],
            "cohort_week string, week_offset bigint, n_users bigint",
        ).write.format("noop").mode("overwrite").save()
        tick("emit", t0)
    finally:
        pipeline._atomic_swap_write = real_swap
        shutil.rmtree(tmp, ignore_errors=True)
    return files


def main() -> None:
    from data_engineering_project_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab_cohort_serving",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))
        },
    )
    run_once(spark, None)
    record: dict = {}
    runs = 3
    files = {}
    for _ in range(runs):
        files = run_once(spark, record)
    out = {k: round(v / runs, 3) for k, v in record.items()}
    out["total"] = round(sum(out.values()), 3)
    out["state_files"] = files
    out["sf_dir"] = SF_DIR
    print(json.dumps(out))


if __name__ == "__main__":
    main()
