"""Partitioning-invariance sweep: same data, radically different file
layouts — every catalog query must produce the identical result set.

Sixth standing audit axis. The determinism sweep re-executes the SAME
layout twice, so it can never catch a result that depends on HOW the
input is split into files/partitions — first()/collect_list order
leaking into output, limit ties resolved by scan order, per-partition
state folded in task order. On a 1000-executor cluster the layout is
whatever ingestion produced that day; a layout-dependent answer is a
silent correctness bug that local runs mask because the fixture layout
never changes.

Protocol: rewrite every sf table into two hostile layouts —
  k1  : ONE file per table, one row group (minimum parallelism)
  k64 : 64 tiny files per table written in SHUFFLED row order
        (maximum fragmentation; file order ≠ row order)
— then run every catalog query against both and compare sorted
stringified result sets (the determinism sweep's NUL-safe comparator).
Shuffling rows before the k64 write is the point: a query whose answer
depends on input row order (anything missing an explicit tiebreaker)
diverges here even if both layouts hash identically per-run.

Run:  python tools/partitioning_invariance_sweep.py            # full
      python tools/partitioning_invariance_sweep.py name1 ...  # subset
Exit 0 iff every query is layout-invariant.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.driver_sim as sim
from tools.version_pin import assert_engine_versions

BASE_SF = os.environ.get("SPARK_GRAFT_PARTITION_BASE", "/root/testdata/sf0.001")
OUT_ROOT = os.environ.get(
    "SPARK_GRAFT_PARTITION_DIR", "/tmp/spark_graft_partition"
)
K_FILES = 64
SHUFFLE_SEED = 0x5EED


def coprime_stride(n: int) -> int:
    """Smallest odd stride >= 7919 with gcd(stride, n) == 1, so the
    multiplicative walk (seed + i*stride) % n is a bijection on 0..n-1.
    A plain divisibility check is NOT enough: bumping 7919 -> 7921
    (= 89^2) passes ``n % stride != 0`` for n = 89*k yet shares the
    factor 89, silently duplicating/dropping rows (ADVICE r11)."""
    stride = 7919
    while math.gcd(stride, n) != 1:
        stride += 2
    return stride


def build_layouts() -> tuple[str, str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    k1_dir = os.path.join(OUT_ROOT, "k1")
    k64_dir = os.path.join(OUT_ROOT, "k64")
    for t in sim.TABLES:
        src = os.path.join(BASE_SF, f"{t}.parquet")
        table = pq.read_table(src)
        n = table.num_rows

        d1 = os.path.join(k1_dir, f"{t}.parquet")
        os.makedirs(d1, exist_ok=True)
        pq.write_table(table, os.path.join(d1, "part-0.parquet"))

        # deterministic row shuffle (no RNG APIs needed: multiplicative
        # permutation over a co-prime stride covers 0..n-1 exactly once)
        d64 = os.path.join(k64_dir, f"{t}.parquet")
        os.makedirs(d64, exist_ok=True)
        if n > 0:
            perm = [(SHUFFLE_SEED + i * coprime_stride(n)) % n
                    for i in range(n)]
            shuffled = table.take(pa.array(perm, type=pa.int64()))
        else:
            shuffled = table
        k = min(K_FILES, max(1, n))
        per = -(-max(n, 1) // k)
        for j in range(k):
            chunk = shuffled.slice(j * per, per)
            pq.write_table(chunk, os.path.join(d64, f"part-{j:05d}.parquet"))
    print(f"layouts -> {k1_dir} (1 file/table), {k64_dir} "
          f"({K_FILES} shuffled files/table)")
    return k1_dir, k64_dir


def result_hash(df) -> str:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = sorted(pdf[cols].astype(str).itertuples(index=False, name=None))
    return hashlib.sha256(repr((cols, rows)).encode("utf-8")).hexdigest()


def main(only: list[str]) -> int:
    assert_engine_versions()
    k1_dir, k64_dir = build_layouts()
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()  # VANILLA, like the driver
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()
    unknown = [n for n in only if n not in qs]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    names = only or list(qs)
    bad, errs = [], []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        try:
            h1 = result_hash(qs[name](spark, k1_dir))
            spark.catalog.clearCache()
            h64 = result_hash(qs[name](spark, k64_dir))
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            errs.append((name, f"{type(e).__name__}: {str(e)[:120]}"))
            continue
        if h1 != h64:
            bad.append(name)
            print(f"LAYOUT-DEPENDENT {name}")
        if i % 40 == 0:
            print(f"[{i}/{len(names)}] {round(time.time() - t0)}s "
                  f"layout-dependent={len(bad)}", flush=True)
    for name, e in errs:
        print(f"ERROR {name}: {e}")
    print(
        f"\nswept {len(names)} in {round(time.time() - t0)}s: "
        f"{len(bad)} layout-dependent, {len(errs)} errors"
    )
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
