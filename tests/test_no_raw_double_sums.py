"""Static audit: no raw double-column sums anywhere in the catalog.

The round-10 hostile-numeric sweep demonstrated the failure mode: a raw
``sum(double)`` is addition-order-dependent, so Spark (shuffle order) and
any other engine (its own order) can silently return DIFFERENT totals once
value magnitudes mix — the only fuzz class whose symptom is a wrong number
rather than a crash. The repo-wide invariant (ROADMAP "Known-good
invariants") is to snap fixed-decimal measures to integer units BEFORE
summing (``decimal_units``/``exact_decimal_sum`` and their SQL twins).

This test greps the plan sources for the raw patterns on the known double
measure columns, on both the DataFrame surface (``F.sum("value")``,
``F.sum(F.col("value"))``) and the oracle/SQL surface (``sum(value)`` with
the bare column). Computed unit expressions (``sum(CAST(ROUND(...)``) do
not match. A hit means a new query re-introduced the class — route it
through the devices instead.
"""

from __future__ import annotations

import glob
import os
import re

_DOUBLE_MEASURES = (
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "o_totalprice",
    "c_acctbal",
    "s_acctbal",
    "p_retailprice",
    "value",
)

_PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_engineering_project_spark",
    "plans",
    "*.py",
)

_COLS = "|".join(_DOUBLE_MEASURES)
#: F.sum("value") / F.sum(F.col("value")) — the DataFrame-side raw form
_DF_RAW = re.compile(
    rf'F\.sum\(\s*(?:F\.col\(\s*)?"({_COLS})"\s*\)?\s*\)'
)
#: sum(value) with the bare column — the SQL-side raw form. Unit devices
#: read sum(CAST(ROUND(col * scale ...) and never match.
_SQL_RAW = re.compile(rf"\bsum\(\s*({_COLS})\s*\)", re.IGNORECASE)


def test_no_raw_double_sums_in_plan_sources():
    hits: list[str] = []
    for path in sorted(glob.glob(_PLANS)):
        with open(path) as fh:
            for lineno, line in enumerate(fh, 1):
                for pat in (_DF_RAW, _SQL_RAW):
                    m = pat.search(line)
                    if m:
                        hits.append(
                            f"{os.path.basename(path)}:{lineno}: "
                            f"raw sum over double column "
                            f"{m.group(1)!r}: {line.strip()}"
                        )
    assert not hits, (
        "raw double sums are addition-order-dependent across engines "
        "(round-10 hostile-numeric sweep) — snap to integer units first "
        "(decimal_units / exact_decimal_sum + SQL twins):\n"
        + "\n".join(hits)
    )
