"""Same-session A/A probe for docs_bigram_lm_score (round-9 verdict #3).

The driver artifact showed slope 4.4 -> 6.1 and raw 0.87 -> 1.32 s across
rounds 8 -> 9 with ZERO Spark-side code change — the only stable riser
with a material absolute move in BENCH_r09. Same protocol that settled
the q18 and distinct_supplier_counts scares: three independent median-of-N
passes of the SAME callable inside ONE session, with the /10-sibling
marginal. If the passes spread as much as the cross-round delta, the move
is session noise; if they sit tight at the new high, something real
drifted and the plan needs reading.

Run:  python tools/ab_bigram_lm.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_harness import run_ab  # noqa: E402


def main() -> None:
    from data_engineering_project_spark.plans.catalog import queries

    fn = queries()["docs_bigram_lm_score"]
    run_ab(
        {"pass1": fn, "pass2": fn, "pass3": fn},
        equivalence_check=False,  # identical fn; nothing to compare
    )


if __name__ == "__main__":
    main()
