"""Local replica of the driver's DuckDB-oracle comparison.

Runs each `queries()[name](spark, sf_dir)` and the matching `oracle_sql()`
through DuckDB over the same parquet files, then compares: row count, column
names, and values (columns sorted by name, rows sorted by all columns —
order-insensitive, like the driver's value-hash). Floats must match exactly
after both sides' ROUND(); any drift is reported with max abs diff so we can
tighten the query instead of shipping a hash mismatch.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = 0
    oracle_rows: int = 0
    mismatched_cells: int = 0
    max_float_diff: float = 0.0
    notes: list[str] = field(default_factory=list)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    if len(out):
        # Python-keyed row order, not pandas sort_values: the multi-key
        # pandas sort ties strings at an embedded NUL (numpy fixed-width
        # unicode comparator), which would leave engine-output order in
        # the canonical frame for NUL-bearing data
        keys = [
            tuple(map(str, r))
            for r in out.itertuples(index=False, name=None)
        ]
        order = sorted(range(len(out)), key=keys.__getitem__)
        out = out.iloc[order].reset_index(drop=True)
    return out


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name=name, ok=True, spark_rows=len(sdf), oracle_rows=len(odf))
    if sorted(sdf.columns) != sorted(odf.columns):
        res.ok = False
        res.detail = f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        return res
    if len(sdf) != len(odf):
        res.ok = False
        res.detail = f"row count differs: spark={len(sdf)} oracle={len(odf)}"
        return res
    s, o = _canon(sdf), _canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv_f = pd.to_numeric(sv, errors="coerce")
            ov_f = pd.to_numeric(ov, errors="coerce")
            both_nan = sv_f.isna() & ov_f.isna()
            diff = (sv_f - ov_f).abs()
            bad = (~both_nan) & ~(diff == 0)
            if bad.any():
                res.ok = False
                res.mismatched_cells += int(bad.sum())
                res.max_float_diff = max(
                    res.max_float_diff, float(diff[bad].max() or 0)
                )
                res.notes.append(
                    f"col {c}: {int(bad.sum())} float cells differ, max |diff|="
                    f"{float(diff[bad].max()):.3e}"
                )
        else:
            sv_s, ov_s = sv.astype(str), ov.astype(str)
            bad = sv_s != ov_s
            if bad.any():
                res.ok = False
                res.mismatched_cells += int(bad.sum())
                ex_i = bad.idxmax()
                res.notes.append(
                    f"col {c}: {int(bad.sum())} cells differ, e.g. row {ex_i}: "
                    f"spark={sv_s[ex_i]!r} oracle={ov_s[ex_i]!r}"
                )
    if not res.ok and not res.detail:
        res.detail = "; ".join(res.notes[:4])
    return res


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[CompareResult]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_conn(sf_dir)
    results: list[CompareResult] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, f"SPARK ERROR: {e}"))
            continue
        if name not in oracles:
            ok = True  # rows-only check: just confirm it ran
            results.append(
                CompareResult(name, ok, "rows-only (no oracle)", len(sdf), -1)
            )
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, f"ORACLE ERROR: {e}"))
            continue
        results.append(compare_frames(name, sdf, odf))
    return results
