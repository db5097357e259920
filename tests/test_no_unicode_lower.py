"""Static audit: no Unicode ``lower()`` on text-processing paths.

The round-10 hostile-string sweep's `lower-unicode` class: JVM
``lower('İ')`` emits ``'i' + U+0307`` where DuckDB's utf8proc emits
``'i'``, silently splitting vocabularies, fingerprints, and vowel counts
between engines on non-ASCII corpora. Round 11 retired the class by
migrating every tokenizer/fingerprint site to the shared ASCII fold
(``operators/text.py:ascii_lower`` / ``normalized_tokens`` and the
``translate(x, 'A-Z', 'a-z')`` SQL twin). This test pins the migration
statically on BOTH surfaces so a future query cannot reintroduce it:

- DataFrame surface: no ``F.lower(`` anywhere under ``plans/`` (plans
  must route through the shared primitives);
- oracle surface: no ``lower(`` call in any REGISTERED oracle SQL text
  (``list_sort``/``ascii_lower``-style identifiers do not match).

Legitimate Unicode lowering outside the cross-engine query surface
(e.g. ``functions/scalars.py:guid_hex`` lowering pure hex digits) lives
outside ``plans/`` and is not constrained.
"""

from __future__ import annotations

import glob
import os
import re

_PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_engineering_project_spark",
    "plans",
)

#: call sites of SQL lower( — identifier chars before the name must not
#: match (list_sort(, ascii_lower( stay legal)
_SQL_LOWER = re.compile(r"(?<![_0-9A-Za-z])lower\s*\(", re.IGNORECASE)


def test_no_f_lower_in_plan_sources():
    hits = []
    for path in glob.glob(os.path.join(_PLANS_DIR, "*.py")):
        for lineno, line in enumerate(open(path, encoding="utf-8"), 1):
            if "F.lower(" in line:
                hits.append(f"{os.path.basename(path)}:{lineno}: {line.strip()}")
    assert not hits, (
        "F.lower() on a plan surface — use operators/text.py:ascii_lower "
        "or normalized_tokens (lower-unicode class, ROADMAP r11):\n"
        + "\n".join(hits)
    )


def test_no_unicode_lower_in_registered_oracles():
    from data_engineering_project_spark.plans.catalog import oracle_sql

    hits = [
        f"{name}: ...{sql[max(0, m.start() - 40): m.end() + 20]}..."
        for name, sql in oracle_sql().items()
        for m in [_SQL_LOWER.search(sql)]
        if m
    ]
    assert not hits, (
        "lower() in an oracle SQL — restate with "
        "translate(x, 'A-Z', 'a-z') (operators/text.py:sql_ascii_lower):\n"
        + "\n".join(hits)
    )
