"""Dump `.explain("formatted")` for catalog queries to plans/r<N>/.

Usage ($SPARK_GRAFT_PLANS_ROUND picks the round dir, default r14):
    python tools/dump_plans.py before q1 q2 ...   # plans/rN/<q>_before.txt
    python tools/dump_plans.py after q1 q2 ...    # plans/rN/<q>_after.txt
    python tools/dump_plans.py before --headliners

Same session shape as bench.py (get_spark, local[$SPARK_GRAFT_CPUS]); plans
are the optimizer's initial plan (AdaptiveSparkPlan isFinalPlan=false), the
artifact the optimization-round judge reads against the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


def main() -> int:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:]

    from data_engineering_project_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="dump_plans",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(CPUS) * 2, 8)),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    if names == ["--headliners"]:
        import bench

        names = list(bench.HEADLINE)

    os.makedirs(OUT_DIR, exist_ok=True)
    failed = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            failed.append(name)
            txt = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
