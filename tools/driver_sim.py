"""Full vanilla-session simulation of the external verification driver
(committed per round-4 verdict #8 — this evidence script previously lived
in /tmp and died with each sandbox).

Replicates the driver protocol end-to-end: a VANILLA SparkSession (none of
session.py's confs — that is the point; runtime-conf regressions like the
TIMESTAMP(NANOS) read hide behind get_spark()), `entry(spark)` smoke, then
every `queries()` entry against its `oracle_sql()` twin in DuckDB over the
same parquet — columns sorted by name, rows sorted, string-compared, the
same order-insensitive equality the driver hashes.

Usage:
    python tools/driver_sim.py                 # all queries at sf0.01
    python tools/driver_sim.py name1 name2     # spot-check a subset
    SPARK_GRAFT_SIM_SF=/root/testdata/sf0.001 python tools/driver_sim.py

Exit code 0 iff every query compared clean.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
LAST_FAILURES: list[str] = []
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main(only: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()  # VANILLA — no engine confs, like the driver
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    n_entry = m.entry(spark).count()
    print(f"entry rows: {n_entry}")
    assert n_entry > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t + '.parquet')}')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    unknown = [n for n in only if n not in qs]
    if unknown:
        # a typo'd spot-check must fail loudly, not report N clean
        raise SystemExit(f"unknown query names: {unknown}")
    failures: list[str] = []
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items(), 1):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[{i}] {name}: SPARK ERROR {e}")
            continue
        if name not in osql:
            print(f"[{i}] {name}: rows-only ({len(sdf)})")
            continue
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[{i}] {name}: ORACLE ERROR {e}")
            continue
        cols = sorted(sdf.columns)
        if cols != sorted(odf.columns) or len(sdf) != len(odf):
            failures.append(name)
            print(
                f"[{i}] {name}: SHAPE spark={len(sdf)}x{cols} "
                f"oracle={len(odf)}x{sorted(odf.columns)}"
            )
            continue
        # Python-level sort: pandas' multi-key sort_values ties strings at
        # an embedded NUL (numpy fixed-width unicode comparator), turning
        # identical result sets into false VALUE mismatches — found by the
        # hostile-string sweep's forensics
        s = sorted(sdf[cols].astype(str).itertuples(index=False, name=None))
        o = sorted(odf[cols].astype(str).itertuples(index=False, name=None))
        if s != o:
            failures.append(name)
            print(f"[{i}] {name}: VALUE MISMATCH")
        elif i % 25 == 0:
            print(f"[{i}] ... {round(time.time() - t0)}s elapsed, clean")
    n = len(only) if only else len(qs)
    print(
        f"checked {n} queries in {round(time.time() - t0)}s: "
        f"{n - len(failures)} clean, {len(failures)} failed "
        f"{failures if failures else ''}"
    )
    global LAST_FAILURES
    LAST_FAILURES = list(failures)  # consumed by tools/null_fuzz_sweep.py
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
