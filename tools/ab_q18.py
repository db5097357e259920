"""Same-session A/A probe for q18_large_orders (round-7 verdict item #2).

The driver artifact showed slope 3.7 -> 8.9 and wall 0.58 -> 1.06 s across
rounds 6 -> 7 with ZERO code change since round 4 — the largest untouched
regression in BENCH_r07. Protocol is the one that settled the r6
`distinct_supplier_counts` scare: three independent median-of-N passes of
the SAME query inside ONE session (plus the /10 sibling marginals). If the
three passes spread as much as the cross-round delta, the artifact move is
session noise; if they're tight and high, something real drifted.

Run:  python tools/ab_q18.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_harness import run_ab  # noqa: E402


def main() -> None:
    from data_engineering_project_spark.plans.catalog import queries

    fn = queries()["q18_large_orders"]
    # three A/A passes of the identical callable: any spread between them
    # is pure same-session measurement noise
    run_ab(
        {"pass1": fn, "pass2": fn, "pass3": fn},
        equivalence_check=False,  # identical fn; nothing to compare
    )


if __name__ == "__main__":
    main()
