"""Plan fingerprints: detect catalog queries whose code changed after their
last green driver hash.

The driver samples a bounded number of catalog queries per round and records
row/schema/value-hash matches in ``CORRECTNESS_r{N}.json``. Once every query
has been hashed at least once, "never checked first" stops being a useful
ordering — the fresh risk is a query whose *plan was rewritten after* its most
recent green hash (round-5 verdict item #1). We therefore keep a committed
snapshot ``plans/fingerprints.json``::

    {"query_name": {"fp": "<sha256 of fn source + oracle sql>", "round": 5}}

recording, for each query, the fingerprint of its implementation at the time
of its most recent green driver row and which round that was. ``fp`` may be
``null`` to force a query into the changed bucket (used to seed the four
queries the round-5 judge identified as rewritten after their last hash).

Protocol (``tools/update_fingerprints.py``): at the START of each round,
before editing any plan code — when the working tree is byte-identical to
what the previous round's driver executed — refresh the snapshot from the
newest ``CORRECTNESS_r*.json``. Names green in that file get the current
fingerprint; all other entries are left untouched, so a query rewritten in a
round where it was not sampled keeps the fingerprint of its last-hashed code
and correctly reads as "changed".
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

_FP_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fingerprints.json")


def compute_fingerprint(fn, sql: str | None) -> str:
    """sha256 over the query function's source plus its oracle SQL.

    ``inspect.getsource`` is whitespace-stable for committed files, so the
    fingerprint only moves when the plan (or its oracle) actually changes.
    """
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # built/exec'd fn — treat body as opaque
        src = repr(fn)
    h = hashlib.sha256()
    h.update(src.encode("utf-8"))
    h.update(b"\x00")
    h.update((sql or "").encode("utf-8"))
    return h.hexdigest()


def load_snapshot() -> dict[str, dict]:
    try:
        with open(_FP_PATH) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def save_snapshot(snapshot: dict[str, dict]) -> None:
    tmp = _FP_PATH + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(snapshot, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, _FP_PATH)


def staleness_order(queries: dict) -> list[str]:
    """Order catalog names for the driver sample: changed-since-last-hash
    first (includes never-hashed and forced-stale entries), then oldest green
    round first, then name for determinism.

    ``queries`` maps name -> Query (with ``.fn`` / ``.sql`` attributes).
    """
    snapshot = load_snapshot()

    def key(name: str):
        rec = snapshot.get(name)
        if rec is None or rec.get("fp") is None:
            return (0, 0, name)  # never hashed / forced stale
        current = compute_fingerprint(queries[name].fn, queries[name].sql)
        if current != rec["fp"]:
            return (0, 1, name)  # rewritten after last green hash
        return (1, rec.get("round", 0), name)  # fresh: oldest hash first

    return sorted(queries, key=key)
