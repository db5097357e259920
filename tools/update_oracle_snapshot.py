"""Regenerate the oracle-SQL text snapshot (a DELIBERATE act).

Round-9 showed the failure mode this snapshot exists to price in: the
exact-sum / integer-div / half-up-ratio devices are f-string-interpolated
into oracle SQL, so one device edit rewrites the registered oracle text of
30+ queries at once — each a fingerprint move the external driver must
re-hash from its 50-slot-per-round sample (round-9 VERDICT next-round #2).
`tests/test_oracle_snapshot.py` pins every registered oracle byte-for-byte
against this file; a device refactor now fails the suite until the author
re-runs this script and sees exactly how many re-hash slots the edit costs.

Usage:  python tools/update_oracle_snapshot.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "oracle_sql_snapshot.json",
)


def current() -> dict[str, str | None]:
    from data_engineering_project_spark.plans import catalog

    catalog._ensure_loaded()
    return {
        name: (
            hashlib.sha256(q.sql.encode()).hexdigest() if q.sql else None
        )
        for name, q in sorted(catalog.QUERIES.items())
    }


def main() -> None:
    snap = current()
    old: dict[str, str | None] = {}
    if os.path.exists(SNAPSHOT):
        with open(SNAPSHOT) as fh:
            old = json.load(fh)
    changed = sorted(
        n for n in snap.keys() & old.keys() if snap[n] != old[n]
    )
    added = sorted(snap.keys() - old.keys())
    removed = sorted(old.keys() - snap.keys())
    with open(SNAPSHOT, "w") as fh:
        json.dump(snap, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"snapshot {len(snap)} oracles -> {os.path.relpath(SNAPSHOT)}; "
        f"changed {len(changed)} {changed or ''} added {len(added)} "
        f"removed {len(removed)}"
    )


if __name__ == "__main__":
    main()
