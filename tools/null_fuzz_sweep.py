"""NULL-fuzz parity sweep: cross-engine agreement under hostile NULL density.

The 10x-SF sweep (tools/driver_sim.py at sf0.1) varies data VOLUME and found
five real divergences the fixed gate data never triggered; this sweep varies
data SHAPE instead: it deterministically NULLs a slice of every nullable
non-key column in every table, writes the mutated parquet once, and runs the
full catalog's Spark-vs-DuckDB comparison over it. Both engines read the
SAME mutated files, so parity must still hold bit-for-bit — any mismatch or
single-engine crash is a real NULL-semantics divergence (the class DuckDB
ln(0)-vs-Spark-NULL belonged to), never fuzz noise.

What gets nulled: a fixed ~10% positional stripe per column, with a
per-column phase shift so different columns go NULL on different rows (and
some rows accumulate several NULLs). Keys / join identity columns are left
intact — nulling them would mostly test the generator's referential
integrity, not engine semantics; measure/attribute columns are where the
NULL-path logic lives.

Run:  python tools/null_fuzz_sweep.py            # full catalog
      python tools/null_fuzz_sweep.py name1 ...  # subset
Exit 0 iff every query compares clean over the mutated data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.driver_sim as sim
from tools.version_pin import assert_engine_versions

#: Known NULL-shape divergences, each with its root-cause class — the
#: audit exits 0 on these and 1 on anything new. All 32 first-run
#: findings were fixed in round 9 (see ROADMAP); keep this empty.
KNOWN: dict[str, str] = {}  # EMPTIED round 9 — every finding fixed; new
# entries require a ROADMAP backlog note with the root-cause class

BASE_SF = os.environ.get("SPARK_GRAFT_NULLFUZZ_BASE", "/root/testdata/sf0.001")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_NULLFUZZ_DIR", "/tmp/spark_graft_nullfuzz/sf0.001"
)
STRIPE = 10  # every 10th row per column (phase-shifted) goes NULL

#: columns that stay intact: identity / join keys / partition-like fields.
#: Everything else nullable is fair game.
KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def build_mutated_tables() -> None:
    import pandas as pd  # noqa: F401 — via pyarrow round-trip
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
            if name in KEEP.get(t, set()) or n == 0:
                cols[name] = col
                continue
            # deterministic positional stripe, phase-shifted per column so
            # NULL patterns differ between columns but never between runs
            mask = pa.array(
                [(i + j) % STRIPE == 0 for i in range(n)], type=pa.bool_()
            )
            cols[name] = pa.compute.if_else(
                mask, pa.nulls(n, type=col.type), col
            )
        pq.write_table(
            pa.table(cols, schema=table.schema), dst
        )
    print(f"mutated tables ({STRIPE=}) -> {OUT_DIR}")


def main(only: list[str]) -> int:
    assert_engine_versions()
    build_mutated_tables()
    sim.SF_DIR = OUT_DIR  # the compare loop reads this module global
    if only:
        return sim.main(only)
    # full sweep: run everything, then judge against the known backlog
    rc = sim.main([])
    if rc == 0:
        return 0
    # re-derive the failure list from a targeted re-run of knowns only is
    # wasteful; instead rerun nothing — sim.main printed failures; accept
    # a KNOWN-only failure set by re-checking just the non-known names
    unknown = [n for n in sim_failures_of_last_run() if n not in KNOWN]
    if unknown:
        print(f"NEW null-shape divergences (not in KNOWN): {unknown}")
        return 1
    print(
        f"all failures are KNOWN backlog ({len(KNOWN)} entries, ROADMAP "
        "round-9) — audit passes; fix and remove entries to shrink it"
    )
    return 0


def sim_failures_of_last_run() -> list[str]:
    return list(getattr(sim, "LAST_FAILURES", []))


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
