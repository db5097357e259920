"""Hostile-timestamp parity sweep: no silent wrong answers at temporal
extremes.

Fifth axis of the standing fuzz family (volume, NULL shape, IEEE edge
values, adversarial strings, and now TIME). Injects a sparse stripe of
hostile instants into every timestamp column — the epoch itself,
pre-1970 negative-epoch values (floor-division and week-alignment
bugs live there), a pre-Gregorian-reform date (proleptic-calendar
handling), the far future near Spark's year-9999 ceiling, and a
leap-day instant carrying the maximum microsecond fraction — then
compares the full catalog across engines over the SAME mutated parquet.

Contract: identical to the other hostile sweeps (refuse-tolerant) — a
both-engines-answer mismatch is a SILENT DIVERGENCE and fails the
sweep; either-side refusals are acceptable and reported. KNOWN entries
need a ROADMAP note.

Run:  python tools/hostile_time_sweep.py            # full catalog
      python tools/hostile_time_sweep.py name1 ...  # subset
Exit 0 iff no silent divergence (refusals never fail the sweep).
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.driver_sim as sim
from tools.version_pin import assert_engine_versions

#: Known silent divergences, each requiring a ROADMAP backlog note.
KNOWN: dict[str, str] = {}

BASE_SF = os.environ.get("SPARK_GRAFT_HOSTILE_BASE", "/root/testdata/sf0.001")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_HOSTILE_TIME_DIR", "/tmp/spark_graft_hostile_time/sf"
)
#: timestamp[us] columns per table (the synthetic schema's full set)
TIME_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}
HOSTILES = [
    dt.datetime(1970, 1, 1, 0, 0, 0),  # the epoch itself
    dt.datetime(1955, 11, 5, 6, 15, 0),  # negative epoch micros
    dt.datetime(1582, 10, 4, 12, 0, 0),  # pre-Gregorian reform (proleptic)
    dt.datetime(9999, 12, 30, 23, 59, 59),  # near the year-9999 ceiling
    dt.datetime(2024, 2, 29, 23, 59, 59, 999999),  # leap day, max micros
]
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
            if name not in TIME_COLS.get(t, []) or n == 0:
                cols[name] = col
                continue
            vals = col.to_pylist()
            for i in range(n):
                if (i + 7 * j) % STRIPE == 0:
                    vals[i] = HOSTILES[((i + 7 * j) // STRIPE) % len(HOSTILES)]
            cols[name] = pa.array(vals, type=col.type)
        pq.write_table(pa.table(cols, schema=table.schema), dst)
    print(f"hostile-time tables ({STRIPE=}) -> {OUT_DIR}")


def main(only: list[str]) -> int:
    assert_engine_versions()
    build_mutated_tables()
    import pickle

    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()  # VANILLA, like the driver
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    con = duckdb.connect()
    # Bounded oracle: hostile instants can turn a data-dependent dense
    # spine into hundreds of millions of rows on the ORACLE side too
    # (the first run had DuckDB grinding ~40 GB on the gapfill spine
    # after Spark's max_slots guard refused in a second). No disk spill
    # + a hard memory cap turns that into a prompt loud refusal, which
    # is the contract's acceptable outcome for garbage input.
    con.execute("SET temp_directory = ''")
    con.execute("SET memory_limit = '12GB'")
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
    crashed = []  # JVM-killers: worse than a refusal, fail the sweep
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items(), 1):
        if only and name not in only:
            continue
        s_err = o_err = None
        sdf = odf = None
        try:
            out = fn(spark, OUT_DIR)
            # comparison-boundary guard: pandas timestamps are ns-ranged
            # (caps at 2262-04-11), so a year-9999 SCD2/CDC sentinel that
            # BOTH engines computed correctly would die in toPandas()/
            # fetchdf() — a harness artifact, not an engine divergence.
            # Stringify timestamps engine-side on BOTH sides; Spark
            # CAST(ts AS STRING) and DuckDB CAST(ts AS VARCHAR) render
            # identically ('YYYY-MM-DD HH:MM:SS[.ffffff]').
            ts_cols = [
                f.name
                for f in out.schema.fields
                if f.dataType.typeName().startswith("timestamp")
            ]
            for c in ts_cols:
                out = out.withColumn(c, F.col(c).cast("string"))
            sdf = out.toPandas()
        except Exception as e:  # noqa: BLE001
            s_err = type(e).__name__
            try:  # is the JVM still with us? (the first run of this
                # sweep lost it to an unguarded 74M-slot gapfill spine)
                spark.sql("SELECT 1").collect()
            except Exception:  # noqa: BLE001
                crashed.append((name, s_err))
                print(f"[{i}] {name}: SESSION DIED ({s_err}) — rebuilding")
                try:
                    spark.stop()  # clear the dead global so getOrCreate
                except Exception:  # noqa: BLE001  # builds a fresh JVM
                    pass
                spark = (
                    SparkSession.builder.master(
                        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
                    )
                    .getOrCreate()
                )
                spark.sparkContext.setLogLevel("ERROR")
        if name not in osql:
            rowsonly.append(name)
            continue
        try:
            rel = con.sql(osql[name])
            exprs = ", ".join(
                f'CAST("{c}" AS VARCHAR) AS "{c}"'
                if "TIMESTAMP" in str(t).upper()
                else f'"{c}"'
                for c, t in zip(rel.columns, rel.types)
            )
            odf = rel.project(exprs).fetchdf()
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
        # Python-level sort (NUL-safe precedent from the string sweep)
        s_rows = sorted(sdf[cols].astype(str).itertuples(index=False, name=None))
        o_rows = sorted(odf[cols].astype(str).itertuples(index=False, name=None))
        if s_rows != o_rows:
            silent.append((name, "VALUES"))
            fdir = os.path.join(os.path.dirname(OUT_DIR), "forensics")
            os.makedirs(fdir, exist_ok=True)
            with open(os.path.join(fdir, f"{name}.pkl"), "wb") as fh:
                pickle.dump({"spark": s_rows, "oracle": o_rows}, fh)
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
    if crashed:
        print(f"JVM-KILLERS — a crash is never an acceptable refusal "
              f"({len(crashed)}):")
        for r in crashed:
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
    return 1 if crashed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
