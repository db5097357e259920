"""Round-start fingerprint refresh (run BEFORE editing any plan code).

At round start the working tree is byte-identical to what the previous
round's driver executed, so the current source of every query green in the
newest ``CORRECTNESS_r*.json`` is exactly the code that produced the green
hash. Record its fingerprint + round; leave every other entry untouched.

Usage:  python tools/update_fingerprints.py [--seed] [--stale NAME ...]

``--stale NAME ...``: force-mark queries as changed (``fp: null``) so the
rotation fronts them — use when an OPERATOR a query calls through was
rewritten (the fingerprint hashes only the registered fn's own source plus
its oracle SQL, so transitive plan changes need this manual nudge).

``--seed`` (one-time, round 6): also record current fingerprints for names
green only in OLDER rounds, EXCEPT the four queries the round-5 judge named
as rewritten after their last hash — those are forced stale (``fp: null``)
so the rotation fronts them until the driver re-hashes the shipped plans.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_project_spark.plans import catalog
from data_engineering_project_spark.plans.fingerprints import (
    compute_fingerprint,
    load_snapshot,
    save_snapshot,
)

# Last green hash predates a plan rewrite (round-5 VERDICT "What's wrong" #1).
FORCED_STALE_SEED = {
    "suppliers_cooccurrence",
    "lineitem_weighted_median_price",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
}


def correctness_rounds(root: str) -> list[tuple[int, dict]]:
    out = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                out.append((int(m.group(1)), json.load(fh)))
        except (OSError, ValueError):
            continue
    return sorted(out)


def main() -> None:
    seed = "--seed" in sys.argv
    stale_names: list[str] = []
    if "--stale" in sys.argv:
        stale_names = [
            a for a in sys.argv[sys.argv.index("--stale") + 1 :]
            if not a.startswith("--")
        ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    catalog._ensure_loaded()
    queries = catalog.QUERIES
    snapshot = load_snapshot()
    rounds = correctness_rounds(root)
    if not rounds:
        print("no CORRECTNESS_r*.json found; nothing to do")
        return

    newest_round, newest_rows = rounds[-1]
    updated = 0
    for name, row in newest_rows.items():
        if name in queries and isinstance(row, dict) and row.get("hash_match") is True:
            snapshot[name] = {
                "fp": compute_fingerprint(queries[name].fn, queries[name].sql),
                "round": newest_round,
            }
            updated += 1

    seeded = forced = 0
    if seed:
        latest_green: dict[str, int] = {}
        for rnd, rows in rounds:
            for name, row in rows.items():
                if isinstance(row, dict) and row.get("hash_match") is True:
                    latest_green[name] = max(latest_green.get(name, 0), rnd)
        for name, rnd in latest_green.items():
            if name not in queries or name in snapshot:
                continue
            if name in FORCED_STALE_SEED:
                snapshot[name] = {"fp": None, "round": rnd}
                forced += 1
            else:
                snapshot[name] = {
                    "fp": compute_fingerprint(queries[name].fn, queries[name].sql),
                    "round": rnd,
                }
                seeded += 1

    for name in stale_names:
        if name not in queries:
            raise SystemExit(f"--stale: unknown query {name!r}")
        rec = snapshot.get(name, {"round": 0})
        snapshot[name] = {"fp": None, "round": rec.get("round", 0)}
        forced += 1

    save_snapshot(snapshot)
    print(
        f"round {newest_round}: refreshed {updated}; seeded {seeded}; "
        f"forced-stale {forced}; snapshot {len(snapshot)}/{len(queries)}"
    )


if __name__ == "__main__":
    main()
