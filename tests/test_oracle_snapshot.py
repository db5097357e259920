"""Byte-for-byte freeze of every registered oracle's SQL text.

The exact-sum / integer-div / half-up-ratio determinism devices are
f-string-interpolated into oracle SQL at registration, so editing one
device silently rewrites the oracle text of every query using it — each
rewrite moves that query's fingerprint and costs one of the external
driver's 50 re-hash slots for the round (the r8/r9 refactors invalidated
30+ at once; round-9 VERDICT next-round #2 mandates this freeze).

A failure here is not necessarily a bug: it means oracle text changed.
If the change is intentional, re-run ``python tools/update_oracle_snapshot.py``
and commit the regenerated snapshot — the diff is the re-hash bill.
"""

from __future__ import annotations

import json
import os

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "oracle_sql_snapshot.json"
)


def test_registered_oracle_sql_matches_snapshot():
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.update_oracle_snapshot import current

    with open(FIXTURE) as fh:
        snap = json.load(fh)
    now = current()

    added = sorted(now.keys() - snap.keys())
    removed = sorted(snap.keys() - now.keys())
    changed = sorted(
        n for n in now.keys() & snap.keys() if now[n] != snap[n]
    )
    assert not (added or removed or changed), (
        "oracle SQL text drifted from the committed snapshot — each entry "
        "below is one driver re-hash slot. If intentional, run "
        "`python tools/update_oracle_snapshot.py` and commit it. "
        f"added={added} removed={removed} changed={changed}"
    )
