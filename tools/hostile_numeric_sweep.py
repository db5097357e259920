"""Hostile-numeric parity sweep: no silent wrong answers under NaN/inf/
extreme doubles.

Third axis of the standing fuzz family. The 10x-SF sweep varies VOLUME,
the NULL-fuzz sweep varies NULL SHAPE; this one injects a sparse stripe of
hostile IEEE values — ``-0.0``, ``1e15`` (finite but large enough that
double-addition order matters), ``NaN``, ``+inf``, ``-inf`` — into every
double MEASURE column, then compares the full catalog across engines over
the SAME mutated parquet.

Contract (refuse-tolerant — deliberately weaker than the other sweeps):

- If BOTH engines answer, the answers must match bit-for-bit. A mismatch
  is a SILENT DIVERGENCE — the failure class this sweep exists to catch
  (at 100 TB it is a wrong report nobody notices).
- If EITHER engine refuses (raises), that is acceptable and reported
  informationally: the fixed-decimal devices cast through integers, so a
  NaN/inf reaching them throws LOUDLY under Spark ANSI / DuckDB CAST —
  loud-on-garbage beats silently-different, and the dq_*/quality layer is
  the documented quarantine path for such rows. One-sided refusals are
  listed separately (one engine answered garbage-in — worth eyeballing,
  not an automatic failure).

First run (round 10) found 4 silent divergences, all fixed in-round:
raw-double sums whose addition order diverges at hostile magnitude
(q18_large_orders, events_hourly_tumbling → integer-unit device), NaN
membership in the quantile rank universe (orders_price_quantiles →
finite-only universe on both sides), and non-finite rendering splits
'NaN'/'nan', '-Infinity'/'-inf' (lineitem_column_profile → canonical
renderer). KNOWN stays empty — new entries need a ROADMAP note.

Run:  python tools/hostile_numeric_sweep.py            # full catalog
      python tools/hostile_numeric_sweep.py name1 ...  # subset
Exit 0 iff no silent divergence (refusals never fail the sweep).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.driver_sim as sim
from tools.version_pin import assert_engine_versions

#: Known silent divergences, each requiring a ROADMAP backlog note with
#: its root-cause class. All 4 first-run findings were fixed in round 10.
KNOWN: dict[str, str] = {}

BASE_SF = os.environ.get("SPARK_GRAFT_HOSTILE_BASE", "/root/testdata/sf0.001")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_HOSTILE_DIR", "/tmp/spark_graft_hostile/sf0.001"
)
#: double-typed MEASURE columns per table (keys and join identity stay
#: intact — same rationale as the NULL-fuzz KEEP list)
DOUBLE_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "events": ["value"],
}
#: hostile cycle — one value per stripe slot, phase-shifted per column
HOSTILES = [-0.0, 1e15, float("nan"), float("inf"), float("-inf")]
#: embedding-vector poison cycle: every STRIPE-th vector gets ONE hostile
#: element (second-phase finding: NaN cosine / NaN projection sign ranks
#: are engine-dependent; the similarity operators exclude poisoned
#: vectors via finite_vector / _sql_finite_vec)
VEC_HOSTILES = [float("nan"), float("inf"), float("-inf"), 1e30, -0.0]
STRIPE = 20


def build_mutated_tables() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT_DIR, exist_ok=True)
    for t in sim.TABLES:
        src = os.path.join(BASE_SF, f"{t}.parquet")
        dst = os.path.join(OUT_DIR, f"{t}.parquet")
        table = pq.read_table(src)
        n = table.num_rows
        cols = {}
        for j, name in enumerate(table.column_names):
            col = table.column(name)
            if t == "embeddings" and name == "embedding" and n > 0:
                vals = col.to_pylist()
                for i in range(n):
                    if i % STRIPE == 0 and vals[i]:
                        v = list(vals[i])
                        v[i % len(v)] = VEC_HOSTILES[
                            (i // STRIPE) % len(VEC_HOSTILES)
                        ]
                        vals[i] = v
                cols[name] = pa.array(vals, type=col.type)
                continue
            if name not in DOUBLE_COLS.get(t, []) or n == 0:
                cols[name] = col
                continue
            vals = col.to_pylist()
            for i in range(n):
                if (i + 7 * j) % STRIPE == 0:
                    vals[i] = HOSTILES[
                        ((i + 7 * j) // STRIPE) % len(HOSTILES)
                    ]
            cols[name] = pa.array(vals, type=col.type)
        pq.write_table(pa.table(cols, schema=table.schema), dst)
    print(f"hostile tables ({STRIPE=}) -> {OUT_DIR}")


def main(only: list[str]) -> int:
    assert_engine_versions()
    build_mutated_tables()
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()  # VANILLA, like the driver
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    con = duckdb.connect()
    for t in sim.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(OUT_DIR, t + '.parquet')}')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    unknown = [n for n in only if n not in qs]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    silent, sym_refused, one_sided, clean, rowsonly = [], [], [], [], []
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items(), 1):
        if only and name not in only:
            continue
        s_err = o_err = None
        sdf = odf = None
        try:
            sdf = fn(spark, OUT_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            s_err = type(e).__name__
        if name not in osql:
            rowsonly.append(name)
            continue
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            o_err = type(e).__name__
        if s_err and o_err:
            sym_refused.append((name, s_err, o_err))
            continue
        if s_err or o_err:
            one_sided.append((name, s_err, o_err))
            continue
        cols = sorted(sdf.columns)
        if cols != sorted(odf.columns) or len(sdf) != len(odf):
            silent.append((name, f"shape {len(sdf)} vs {len(odf)}"))
            continue
        # Python-level sort — see hostile_string_sweep: pandas multi-key
        # sort_values ties strings at an embedded NUL
        s = sorted(sdf[cols].astype(str).itertuples(index=False, name=None))
        o = sorted(odf[cols].astype(str).itertuples(index=False, name=None))
        if s != o:
            silent.append((name, "VALUES"))
        else:
            clean.append(name)
        if i % 40 == 0:
            print(f"[{i}] {round(time.time() - t0)}s", flush=True)
    print(
        f"\nswept in {round(time.time() - t0)}s: clean={len(clean)} "
        f"rows-only={len(rowsonly)} both-refused={len(sym_refused)} "
        f"one-sided-refused={len(one_sided)}"
    )
    if one_sided:
        print("one-sided refusals (acceptable; eyeball-worthy):")
        for r in one_sided:
            print("  ", r)
    if sym_refused:
        print("both-engines refusals (symmetric; acceptable):")
        for r in sym_refused:
            print("  ", r)
    new = [(n, why) for n, why in silent if n not in KNOWN]
    if new:
        print(f"SILENT DIVERGENCE — new, not in KNOWN ({len(new)}):")
        for r in new:
            print("  ", r)
        return 1
    if silent:
        print(f"all silent divergences are KNOWN backlog ({len(silent)})")
    else:
        print("no silent divergences")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
