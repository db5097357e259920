"""Deterministic local upscale of the driver testdata (round-11 verdict #1).

The slope instrument (bench.py ``slope_ratio_spark_over_duckdb``) divides the
Spark sf0.01->sf0.1 wall-time delta by DuckDB's — but at 17 MB of data the
DuckDB denominator is milliseconds, so a handful of queries flip in and out
of the >2x weak set on pure scheduling noise (``suppliers_cooccurrence``
10.9 -> out -> 12.3 across three rounds, each costing an A/A session). This
tool manufactures a LARGER deterministic scale point locally so the marginal
per-row comparison gets a denominator far above the noise floor.

Discipline (mirrors the driver generator per TESTDATA.md — dense 0-based
keys, fixed dims, same value distributions):

- replicate every fact/entity table K times; replica k adds ``k * N_parent``
  to every primary and foreign key, where ``N_parent`` is the parent table's
  base row count — so keys stay DENSE 0..K*N-1 and every FK lands on the
  replica-local parent, exactly as if the generator had been run at K times
  the scale factor;
- ``region``/``nation`` are fixed dimensions at every SF (TPC-H discipline):
  copied unchanged, nationkey/regionkey FKs untouched;
- key-derived names (``Customer#%09d``, ``Supplier#%09d``) are re-derived
  from the offset key so name<->key stays bijective;
- ``documents.text``: replica k>0 appends ``str(k)`` to every 4th word and
  ``n_chars`` is recomputed. Verbatim replication (or a mere suffix) would
  leave cross-replica docs sharing ~all their n-grams — every span/minhash/
  jaccard pair query would blow up quadratically in K, which no real bigger
  corpus does. Tagging every 4th word zeroes cross-replica n>=4-gram overlap
  and pushes cross-replica token-Jaccard below dedup thresholds, while
  intra-replica duplicate structure (the native dup rate) is preserved
  exactly (identical docs stay identical within a replica);
- ``embeddings.embedding``: replica k>0 rotates each vector by k positions.
  Rotation is orthogonal, so ALL intra-replica norms/cosines are preserved
  bit-for-bit, while cross-replica cosine between a vector and its rotation
  is ~0 for these near-random vectors — no artificial near-dup pairs;
- ``events.ts`` / order dates are NOT shifted: bigger TPC-H SFs keep the
  same date range at higher density, and the engine's window/gapfill guards
  (max_slots) key off the range, not the row count.

Output is parquet one file per table, same schema as the source (pyarrow
roundtrip — no engine in the middle to rewrite physical types).

Usage:
    python tools/make_sf.py [--src /root/testdata/sf0.1] [--k 5]
                            [--out /root/repo/.localdata/sf0.5]

Everything is derived from the source data itself (row counts, key spans
asserted dense); no RNG anywhere, so two runs are byte-identical.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# fixed dimensions: copied unchanged at every SF (TPC-H discipline)
FIXED = {"region", "nation"}

# primary key per replicated table (asserted dense 0..N-1 in the source)
PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# key column -> parent table whose base-row-count is the offset stride.
# ``None`` parent means "self" (the column is this table's own pk); the
# events user space has no table — its stride is max(user_id)+1.
FK = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}

NAME_FMT = {"customer": ("c_name", "Customer#"), "supplier": ("s_name", "Supplier#")}


def _replace(table: pa.Table, col: str, arr: pa.Array) -> pa.Table:
    i = table.schema.get_field_index(col)
    return table.set_column(i, table.schema.field(i), arr.cast(table.schema.field(i).type))


def _offset_int(table: pa.Table, col: str, delta: int) -> pa.Table:
    return _replace(table, col, pc.add(table[col].combine_chunks(), delta))


def _rederive_name(table: pa.Table, key_col: str, name_col: str, prefix: str) -> pa.Table:
    keys = table[key_col].to_numpy(zero_copy_only=False)
    names = pa.array([f"{prefix}{k:09d}" for k in keys], type=pa.string())
    return _replace(table, name_col, names)


def _tag_text(text: str, tag: str) -> str:
    words = text.split(" ")
    return " ".join(
        w + tag if i % 4 == 0 else w for i, w in enumerate(words)
    )


def _perturb_docs(table: pa.Table, k: int) -> pa.Table:
    tag = str(k)
    texts = [
        t if t is None else _tag_text(t, tag)
        for t in table["text"].to_pylist()
    ]
    table = _replace(table, "text", pa.array(texts, type=pa.string()))
    n_chars = pa.array(
        [None if t is None else len(t) for t in texts], type=pa.int64()
    )
    return _replace(table, "n_chars", n_chars)


def _perturb_embeddings(table: pa.Table, k: int) -> pa.Table:
    col = table["embedding"].combine_chunks()
    # NULL embeddings would need the validity bitmap threaded through
    # from_arrays below — fail loudly instead of tripping the length
    # assert with a confusing message / silently turning NULLs into []
    assert col.null_count == 0, (
        f"{col.null_count} NULL embeddings — _perturb_embeddings assumes "
        "a dense list column (thread the validity bitmap if this changes)"
    )
    offsets = col.offsets
    values = col.values.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets.to_numpy(zero_copy_only=False))
    assert (lens == lens[0]).all(), "variable-length embeddings"
    dim = int(lens[0])
    # roll is modular in dim: replica k and k+dim would share a rotation,
    # i.e. verbatim cross-replica duplicate vectors, breaking the
    # documented no-artificial-near-dup invariant
    assert k < dim, (
        f"replica {k} >= embedding dim {dim}: np.roll repeats, creating "
        "verbatim duplicate vectors across replicas"
    )
    mat = np.roll(values.reshape(-1, dim), k, axis=1)
    arr = pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), type=pa.float32()))
    return _replace(table, "embedding", arr)


def upscale(src: str, out: str, k_reps: int) -> None:
    os.makedirs(out, exist_ok=True)
    base = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in TABLES}

    # strides: parent base row counts; assert pks dense so offset keys stay dense
    n_of: dict[str, int] = {}
    for t, pk in PK.items():
        n = base[t].num_rows
        mx = pc.max(base[t][pk]).as_py()
        mn = pc.min(base[t][pk]).as_py()
        assert (mn, mx) == (0, n - 1), f"{t}.{pk} not dense 0..N-1: [{mn},{mx}] n={n}"
        n_of[t] = n
    n_users = pc.max(base["events"]["user_id"]).as_py() + 1

    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if t in FIXED:
            pq.write_table(base[t], dst)
            print(f"{t}: copied ({base[t].num_rows} rows)")
            continue
        reps = []
        for k in range(k_reps):
            rep = base[t]
            if k > 0:
                if t in PK:
                    rep = _offset_int(rep, PK[t], k * n_of[t])
                for col, parent in FK.get(t, {}).items():
                    rep = _offset_int(rep, col, k * n_of[parent])
                if t == "events":
                    rep = _offset_int(rep, "user_id", k * n_users)
                if t in NAME_FMT:
                    name_col, prefix = NAME_FMT[t]
                    rep = _rederive_name(rep, PK[t], name_col, prefix)
                if t == "documents":
                    rep = _perturb_docs(rep, k)
                if t == "embeddings":
                    rep = _perturb_embeddings(rep, k)
            reps.append(rep)
        combined = pa.concat_tables(reps).combine_chunks()
        pq.write_table(combined, dst)
        print(f"{t}: {base[t].num_rows} -> {combined.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument(
        "--out",
        default=None,
        help="default: /root/repo/.localdata/sf<src_sf*k> (gitignored)",
    )
    args = ap.parse_args()
    out = args.out
    if out is None:
        basename = os.path.basename(os.path.normpath(args.src))
        sf = float(basename[2:]) * args.k if basename.startswith("sf") else args.k
        out = f"/root/repo/.localdata/sf{sf:g}"
    upscale(args.src, out, args.k)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
