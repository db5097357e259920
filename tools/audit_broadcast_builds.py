"""Catalog-wide scale-killer audit: fact-table scans on broadcast build sides.

The round-6 q5 find generalizes: a declined/omitted dim hint can make the
planner hash a FACT table into a broadcast relation (fine at local SF,
fatal at 100 TB). This sweep plans every catalog query at $SPARK_GRAFT_SF_DIR
and flags any BroadcastExchange whose subtree reaches a fact-table FileScan
(lineitem/orders/events/documents/embeddings) WITHOUT an aggregate in
between (an aggregated subframe has bounded output and may broadcast).

Plan-only — nothing executes. Run: python tools/audit_broadcast_builds.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = ("lineitem", "orders", "events", "documents", "embeddings")
AGG_MARKERS = ("HashAggregate", "ObjectHashAggregate", "SortAggregate")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def broadcast_fact_builds(plan: str, *, ignore_point_lookups: bool = False) -> list[str]:
    """Return descriptions of BroadcastExchange subtrees that reach a fact
    scan with no aggregate between. Subtree walk by indentation depth.

    ``ignore_point_lookups`` skips scans whose pushed filters include an
    equality (``EqualTo``) — the broadcast-one-row query-vector pattern,
    bounded at any corpus size."""
    lines = plan.splitlines()
    hits = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        depth = len(ln) - len(ln.lstrip())
        agg_seen = False
        for nxt in lines[i + 1 :]:
            nd = len(nxt) - len(nxt.lstrip())
            if nxt.strip() and nd <= depth:
                break  # left the subtree
            if any(m in nxt for m in AGG_MARKERS):
                agg_seen = True
            if "FileScan" in nxt and any(f"/{f}.parquet" in nxt or f"[{f}" in nxt or f"{f}.parquet" in nxt for f in FACTS):
                if not agg_seen and not (
                    ignore_point_lookups and "EqualTo(" in nxt
                ):
                    hits.append(nxt.strip()[:120])
                break
    return hits


def main() -> None:
    from data_engineering_project_spark.session import get_spark
    from data_engineering_project_spark.plans.catalog import queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def sweep() -> tuple[dict, dict]:
        bad, errs = {}, {}
        for name, fn in qs.items():
            try:
                plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            except Exception as e:  # planning-time failure is its own finding
                errs[name] = str(e)[:120]
                continue
            hits = broadcast_fact_builds(plan, ignore_point_lookups=True)
            if hits:
                bad[name] = hits
        return bad, errs

    # phase 1: default threshold — flags size-gated AND hard broadcasts
    flagged, errs = sweep()
    print(f"audited {len(qs)} queries at {SF_DIR}: {len(flagged)} flagged, {len(errs)} plan errors")
    # phase 2: threshold=-1 simulates "fact outgrew the threshold" — a flag
    # that PERSISTS is a hard hint, i.e. a genuine 100 TB scale killer;
    # one that disappears was the size gate working as intended.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    hard = {n: h for n, h in ((n, broadcast_fact_builds(
        qs[n](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString(),
        ignore_point_lookups=True,
    )) for n in flagged) if h}
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    for name, hits in hard.items():
        print(f"HARD FACT-BROADCAST {name}")
        for h in hits:
            print("   ", h)
    for name, e in errs.items():
        print(f"PLAN-ERROR {name}: {e}")
    if not hard and not errs:
        print("clean: no hard fact-table broadcast build side survives threshold=-1")


if __name__ == "__main__":
    main()
