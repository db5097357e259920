"""Sentinel-normalized bench comparison — the round-over-round drift
adjudicator (round-7 verdict #1 follow-through).

Compares two bench records (BENCH_r{N}.json driver artifacts, with their
``parsed`` payload, or BENCH_DETAIL.json files) and prints per-query and
total deltas BOTH raw and normalized by each run's fixed-work sentinel.
Interpretation contract:

- raw moved, normalized flat  -> environment drift (the sentinel moved
  with the workload); NOT chargeable to code. No forensics item.
- normalized moved            -> real change; bisect.
- no sentinel in the older record (pre-r8): raw-only comparison, with the
  r7-documented +/-40% cross-session spread as the noise bar.

Run:  python tools/bench_compare.py BENCH_r07.json BENCH_r08.json
      python tools/bench_compare.py BENCH_r08.json BENCH_DETAIL.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        raw = json.load(fh)
    rec = raw.get("parsed") if isinstance(raw.get("parsed"), dict) else raw
    if "queries" not in rec:
        raise SystemExit(f"{path}: no per-query record (degraded line?)")
    sent = rec.get("sentinel_sec")
    if sent is None and isinstance(rec.get("sentinel"), dict):
        sent = rec["sentinel"].get("total_sec")
    return {"queries": rec["queries"], "total": rec["value"], "sentinel": sent}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    shared = sorted(
        q
        for q in set(a["queries"]) & set(b["queries"])
        # a degraded driver line replaces the per-query map with
        # {"detail": "see BENCH_DETAIL.json"} — not a timing
        if isinstance(a["queries"][q], (int, float))
        and isinstance(b["queries"][q], (int, float))
    )
    if not shared:
        print("no shared per-query timings (degraded record?); totals only:")
        print(f"  {a['total']}s -> {b['total']}s")
        return 0
    ta = sum(a["queries"][q] for q in shared)
    tb = sum(b["queries"][q] for q in shared)
    print(f"shared headliners: {len(shared)}")
    print(f"raw total: {ta:.2f}s -> {tb:.2f}s ({tb / ta:.3f}x)")
    if a["sentinel"] and b["sentinel"]:
        sa, sb = a["sentinel"], b["sentinel"]
        print(f"sentinel:  {sa:.3f}s -> {sb:.3f}s ({sb / sa:.3f}x)")
        na, nb = ta / sa, tb / sb
        print(f"normalized total: {na:.2f} -> {nb:.2f} ({nb / na:.3f}x)")
        env = (tb / ta) / (nb / na)
        print(f"-> of the raw {tb / ta:.3f}x, {env:.3f}x is environment")
        rows = sorted(
            shared,
            key=lambda q: (b["queries"][q] / sb) / max(a["queries"][q] / sa, 1e-9),
            reverse=True,
        )
        print("largest NORMALIZED movers (q: norm_a -> norm_b):")
        for q in rows[:8]:
            qa, qb = a["queries"][q] / sa, b["queries"][q] / sb
            print(f"  {q}: {qa:.2f} -> {qb:.2f} ({qb / max(qa, 1e-9):.2f}x)")
    else:
        print("(no sentinel in at least one record: raw-only; noise bar is "
              "the documented +/-40% cross-session spread)")
        rows = sorted(
            shared,
            key=lambda q: b["queries"][q] / max(a["queries"][q], 1e-9),
            reverse=True,
        )
        for q in rows[:8]:
            print(f"  {q}: {a['queries'][q]:.2f} -> {b['queries'][q]:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
