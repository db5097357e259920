"""Hostile-string parity sweep: no silent wrong answers under adversarial
text values.

Fourth axis of the standing fuzz family. The 10x-SF sweep varies VOLUME,
the NULL-fuzz sweep varies NULL SHAPE, the hostile-numeric sweep varies
IEEE edge values; this one injects a sparse stripe of hostile STRINGS —
empty, whitespace-with-newlines, multibyte unicode + emoji, case-mapping
traps (Turkish dotted-I, sharp-s), quote/backslash soup, regex
metacharacters, a 10k-char run, numeric-looking text, an embedded NUL,
and decomposed combining characters — into every string column (all the
synthetic schema's string columns are attributes, not join keys, so
cardinality stays sane), then compares the full catalog across engines
over the SAME mutated parquet. ``events.props`` gets a dedicated cycle of
hostile JSON (truncated, duplicate keys, huge exponents, unicode keys,
bare scalars) because the JSON-path operators are the likeliest
string-divergence site (Spark ``get_json_object`` vs DuckDB's JSON
extension).

Contract: identical to the hostile-numeric sweep (refuse-tolerant) — a
both-engines-answer mismatch is a SILENT DIVERGENCE and fails the sweep;
either-side refusals are acceptable and reported informationally. KNOWN
stays empty — new entries need a ROADMAP note.

Run:  python tools/hostile_string_sweep.py            # full catalog
      python tools/hostile_string_sweep.py name1 ...  # subset
Exit 0 iff no silent divergence (refusals never fail the sweep).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.driver_sim as sim
from tools.version_pin import assert_engine_versions

#: Known silent divergences, each requiring a ROADMAP backlog note.
#: EMPTY since round 11: the round-10 backlog (10 entries in four
#: engine-primitive classes) was paid down with the staged recipes in
#: tools/r11_string_fix_recipes.py — ascii translate-lower for the
#: lower-unicode tokenizer/fingerprint family (now the shared
#: operators/text.py:ascii_lower / normalized_tokens primitives),
#: byte-true md5-of-hex oracles for the multimodal byte-vs-char family,
#: ASCII-projection levenshtein for lev-bytes, and the from_json
#: whitespace mirror for json-parse. New entries need a ROADMAP note.
KNOWN: dict[str, str] = {}

BASE_SF = os.environ.get("SPARK_GRAFT_HOSTILE_BASE", "/root/testdata/sf0.001")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_HOSTILE_STR_DIR", "/tmp/spark_graft_hostile_str/sf0.001"
)
#: string columns per table (the synthetic schema has no string JOIN
#: keys, so every string column is fair game; numeric/key identity is
#: untouched)
STRING_COLS = {
    "region": ["r_name"],
    "nation": ["n_name"],
    "customer": ["c_name", "c_mktsegment"],
    "supplier": ["s_name"],
    "part": ["p_name", "p_brand", "p_type"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus"],
    "events": ["event_type"],  # props handled by the JSON cycle below
    "documents": ["text", "lang", "source"],
}
HOSTILES = [
    "",  # empty
    "  \t\n ",  # whitespace incl. newline/tab (trim/split/render paths)
    "naïve café — 文字列 🚀",  # multibyte + emoji (length/tokenise)
    "İstanbul ß ẞ",  # case-mapping traps (JVM vs ICU upper/lower)
    "O'Reilly \"quoted\" \\back\\slash",  # quote/escape soup
    ".*[a-z]+(?:$){",  # regex metacharacters as DATA
    "x" * 10_000,  # long run (shingles, substrings, BPE)
    " 123e4 ",  # numeric-looking (implicit-cast paths)
    "a\x00b",  # embedded NUL (render/compare)
    "éclair é",  # decomposed combining chars
]
JSON_HOSTILES = [
    "",  # empty string is not JSON
    "{not json",  # truncated
    "null",  # bare scalar
    "[]",  # wrong container
    '{"value": 1e999}',  # overflowing exponent
    '{"dup": 1, "dup": 2}',  # duplicate keys
    '{"ключ": "значение", "文": "字"}',  # unicode keys
    '{"value": "12", "nested": {"deep": [1, {"x": null}]}}',
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
            if t == "events" and name == "props" and n > 0:
                vals = col.to_pylist()
                for i in range(n):
                    if i % STRIPE == 0:
                        vals[i] = JSON_HOSTILES[
                            (i // STRIPE) % len(JSON_HOSTILES)
                        ]
                cols[name] = pa.array(vals, type=col.type)
                continue
            if name not in STRING_COLS.get(t, []) or n == 0:
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
    print(f"hostile-string tables ({STRIPE=}) -> {OUT_DIR}")


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
        # Python-level row sort, NOT pandas sort_values: the multi-key
        # pandas path coerces object strings to numpy fixed-width unicode
        # whose comparator treats an embedded NUL as a terminator — the
        # 'a\x00b>…' journeys all tie, the stable sort preserves each
        # engine's own group-output order, and identical result SETS get
        # flagged as VALUES mismatches (this sweep's first false
        # positive; forensics pinned it to the comparator, not the
        # engines). Python str compares bytes-exactly.
        s_rows = sorted(sdf[cols].astype(str).itertuples(index=False, name=None))
        o_rows = sorted(odf[cols].astype(str).itertuples(index=False, name=None))
        if s_rows != o_rows:
            silent.append((name, "VALUES"))
            # forensics: persist both sides so a flaky or
            # history-dependent mismatch can be diffed after the run
            import pickle

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
