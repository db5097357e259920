"""Same-session A/A probes for the three r9-only slope flickers the
round-9 verdict listed alongside the stable weak set: docs_bm25_search
(2.7), events_balanced_downsample (2.7), docs_collocations_pmi (2.3) —
each >2x vs the DuckDB twin in BENCH_DETAIL for the FIRST time in r9,
with zero Spark-side code change that round.

Protocol: the bigram-LM / q18 disposition pattern — three independent
median-of-N passes of the same callable in one session, with the
/10-sibling marginal. Passes spreading as much as the cross-round delta
= session noise; passes sitting tight at the high reading = real drift,
read the plan.

Run:  python tools/ab_r9_flickers.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_harness import run_ab  # noqa: E402

FLICKERS = [
    "docs_bm25_search",
    "events_balanced_downsample",
    "docs_collocations_pmi",
]


def main(only: list[str]) -> None:
    from data_engineering_project_spark.plans.catalog import queries

    qs = queries()
    for name in only or FLICKERS:
        print(f"\n=== {name} ===", flush=True)
        fn = qs[name]
        run_ab(
            {"pass1": fn, "pass2": fn, "pass3": fn},
            equivalence_check=False,  # identical fn; nothing to compare
        )


if __name__ == "__main__":
    main(sys.argv[1:])
