"""Determinism sweep: run every catalog query TWICE in one session and
compare value hashes.

The DuckDB parity harness proves Spark-vs-oracle agreement for one
execution; what it cannot catch proactively is an output that varies
ACROSS executions (shuffle-order-dependent float sums, unordered
collect_set folds, time-dependent expressions) — those surface later as
unreproducible driver-hash flakes. This sweep forces two full executions
per query (fresh DataFrame each time, caches cleared between runs) and
flags any query whose sorted stringified result differs.

Run: python tools/determinism_sweep.py [names...]   (default: all, sf0.001)
Exit 0 iff every query is repeatable.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.version_pin import assert_engine_versions

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.001")


def result_hash(df) -> str:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    # Python-level row sort — pandas' multi-key sort_values ties strings
    # at an embedded NUL (numpy fixed-width unicode comparator), which
    # would make the canonical order run-dependent for NUL-bearing data
    rows = sorted(pdf[cols].astype(str).itertuples(index=False, name=None))
    return hashlib.sha256(repr((cols, rows)).encode("utf-8")).hexdigest()


def main(only: list[str]) -> int:
    assert_engine_versions()
    from data_engineering_project_spark.session import get_spark
    from data_engineering_project_spark.plans.catalog import queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    names = only or list(qs)
    bad, errs = [], []
    for i, name in enumerate(names):
        try:
            h1 = result_hash(qs[name](spark, SF_DIR))
            spark.catalog.clearCache()
            h2 = result_hash(qs[name](spark, SF_DIR))
        except Exception as e:
            errs.append((name, str(e)[:120]))
            continue
        if h1 != h2:
            bad.append(name)
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(names)}] nondeterministic={len(bad)}")
    for name in bad:
        print(f"NONDETERMINISTIC {name}")
    for name, e in errs:
        print(f"ERROR {name}: {e}")
    print(f"swept {len(names)}: {len(bad)} nondeterministic, {len(errs)} errors")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
