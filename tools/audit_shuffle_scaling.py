"""Catalog-wide shuffle-SCALING audit: measure, don't guess, the 100 TB story.

Plan audits (tools/audit_broadcast_builds.py, tools/audit_scan_pruning.py)
prove shape; this sweep proves the NUMBERS behind it: it executes every
catalog query at two scale factors (default sf0.01 and sf0.1 — a 10x data
step), captures per-query shuffle-write bytes and spill from the UI REST
API (the same metric source bench.py records as per_run_mb), and computes
the scaling exponent

    k = log10(bytes_hi / bytes_lo)        # 10x data -> 10^k shuffle

- k ~ 1.0: shuffle grows linearly with data — the expected slope for
  groupBy/join pipelines; survives any scale-up that adds executors.
- k < 1 or tiny absolute bytes: bounded/sublinear state (sketches,
  broadcast-only, argmax collects) — better than linear.
- k > SUPERLINEAR_K with material absolute bytes: the shuffle grows
  FASTER than the data. At 1000x that exponent is the job that dies —
  flagged, with the known-quadratic-output pair generators whitelisted
  (their OUTPUT is pair-shaped by spec; the algorithms bound candidates
  by banding/blocking, but candidate count still grows superlinearly on
  a corpus whose dup rate is constant).

Any nonzero spill at either SF is flagged unconditionally (the bench
holds a zero-spill line across headliners; this extends the check to the
full catalog).

Run:  python tools/audit_shuffle_scaling.py            # full catalog
      python tools/audit_shuffle_scaling.py name1 ...  # subset
Writes tools/shuffle_scaling.json and prints a summary; exit 1 on
unexplained superlinear growth or spill.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_LO = os.environ.get("SPARK_GRAFT_AUDIT_SF_LO", "/root/testdata/sf0.01")
SF_HI = os.environ.get("SPARK_GRAFT_AUDIT_SF_HI", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# shuffle below this at the HIGH sf is scheduling noise, not a scale signal
MIN_MB = 1.0
SUPERLINEAR_K = 1.15

# Pair generators whose candidate set legitimately outpaces corpus growth:
# output rows are (near-)dup PAIRS, so a corpus with a constant dup RATE
# yields superlinear pair counts. Each bounds candidates by banding /
# blocking / bucket caps (see operator docstrings); the exponent is a
# property of the PROBLEM, not a missing optimization.
PAIR_WHITELIST = {
    "docs_minhash_pairs",
    "docs_simhash_hamming_pairs",
    "docs_jaccard_near_pairs",
    "docs_edit_distance_pairs",
    "docs_winnowing_pairs",
    "emb_lsh_near_pairs",
    "emb_blocked_near_pairs",
    "docs_canonical_manifest",
    "docs_substring_canonical_manifest",
    "suppliers_cooccurrence",
    "parts_association_rules",
    "parts_triangle_affinity",
    "graph_clustering_coeff",
    "graph_adamic_adar",
    # Iterative graph queries shuffle O(E) per round — linear in the GRAPH.
    # The superlinearity enters through edge GENERATION: the co-purchase /
    # co-supplier edge sets are pair-shaped (measured on this corpus:
    # distinct co-supplier edges 4,950 at sf0.01 -> 453,588 at sf0.1, x92
    # over x10 data, because the small supplier pool densifies toward the
    # complete graph). Same disposition as the pair generators above.
    "graph_pagerank_trade",
    "graph_bfs_hops_trade",
    "graph_kcore_trade",
    "graph_lpa_communities",
}


def _stage_totals(spark) -> dict[str, int] | None:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as resp:
            stages = json.load(resp)
    except Exception:
        return None
    tot = {"shuffle_write": 0, "spill": 0}
    for s in stages:
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["spill"] += s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
    return tot


def sweep(spark, qs, sf_dir: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name, fn in qs.items():
        before = _stage_totals(spark)
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            err = None
        except Exception as e:
            err = str(e)[:160]
        wall = time.perf_counter() - t0
        after = _stage_totals(spark)
        rec = {"wall_s": round(wall, 2), "err": err}
        if before is not None and after is not None:
            rec["shuffle_mb"] = round((after["shuffle_write"] - before["shuffle_write"]) / 1e6, 3)
            rec["spill_mb"] = round((after["spill"] - before["spill"]) / 1e6, 3)
        out[name] = rec
    return out


def main(only: list[str]) -> int:
    from data_engineering_project_spark.session import get_spark
    from data_engineering_project_spark.plans.catalog import queries

    spark = get_spark(
        app_name="shuffle-scaling-audit",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(CPUS) * 2, 8)),
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    lo = sweep(spark, qs, SF_LO)
    spark.catalog.clearCache()
    hi = sweep(spark, qs, SF_HI)

    report: dict[str, dict] = {}
    flags: list[str] = []
    for name in qs:
        lmb, hmb = lo[name].get("shuffle_mb"), hi[name].get("shuffle_mb")
        rec: dict = {
            "lo_mb": lmb,
            "hi_mb": hmb,
            "lo_spill_mb": lo[name].get("spill_mb"),
            "hi_spill_mb": hi[name].get("spill_mb"),
            "err": lo[name]["err"] or hi[name]["err"],
        }
        if rec["err"]:
            flags.append(f"{name}: ERROR {rec['err']}")
        elif lmb is not None and hmb is not None:
            if hmb >= MIN_MB and lmb > 0:
                rec["exponent"] = round(math.log10(hmb / lmb), 2)
                if rec["exponent"] > SUPERLINEAR_K and name not in PAIR_WHITELIST:
                    flags.append(
                        f"{name}: shuffle x{hmb / lmb:.1f} over 10x data "
                        f"(k={rec['exponent']}, {lmb}->{hmb} MB)"
                    )
            else:
                rec["exponent"] = None  # bounded state / below noise floor
            if (rec["hi_spill_mb"] or 0) > 0 or (rec["lo_spill_mb"] or 0) > 0:
                flags.append(f"{name}: SPILL {rec['lo_spill_mb']}/{rec['hi_spill_mb']} MB")
        report[name] = rec

    # subset spot-checks must not clobber the canonical full-catalog artifact
    fname = "shuffle_scaling.json" if not only else "shuffle_scaling_subset.json"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), fname)
    with open(out_path, "w") as f:
        json.dump({"sf_lo": SF_LO, "sf_hi": SF_HI, "queries": report}, f, indent=1, sort_keys=True)

    measured = [r["exponent"] for r in report.values() if r.get("exponent") is not None]
    print(
        f"audited {len(qs)} queries ({SF_LO} -> {SF_HI}): "
        f"{len(measured)} above noise floor, "
        f"median exponent {sorted(measured)[len(measured) // 2] if measured else 'n/a'}, "
        f"{len(flags)} flags -> {out_path}"
    )
    for fl in flags:
        print("  FLAG", fl)
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
