"""Benchmark the engine's headline queries, with a DuckDB twin denominator.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], forcing full materialization through the noop
sink (no driver-side collect cost), and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, ...}

The reference publishes no benchmark numbers (BASELINE.md — its committed
workload is 54 rows), so the honest denominator is the same query's oracle
SQL in DuckDB over the same parquet ("duckdb" / "ratio_spark_over_duckdb"
keys; rows-only queries have no SQL twin → null). Two caveats baked into the
output rather than hand-waved:

- Raw wall ratios at laptop SF mostly measure Spark's fixed job-scheduling
  constant (~0.3-0.5 s/query) against DuckDB's ~ms embedded dispatch; that
  constant amortizes to zero on a cluster.
- "slope_ratio_spark_over_duckdb" therefore estimates the MARGINAL per-row
  cost ratio: (t(sf) - t(sf/10)) / (t_duck(sf) - t_duck(sf/10)) — the
  scheduling constants cancel in the subtraction, leaving the per-row
  throughput comparison that actually predicts 100 TB behavior.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# every catalog query participates; these are the headline subset reported
# individually (scan-heavy, join-heavy, window, text, vector — one per class).
# The set is CAPPED: the driver parses a bounded ~2000-byte tail of stdout,
# and per-query timings cost ~30 bytes each, so unbounded growth would trip
# the degrade path below and replace the per-query record with a pointer.
# tests/test_layout.py asserts both the cap and the worst-case line size;
# to add a headliner past the cap, retire one (rotate classes, don't grow).
# raised 46 → 48 in r13: the optimization-round driver contract forbids
# REMOVING queries (adding is fine), so the r13 rotation's two outgoing
# rows were restored alongside the two incoming weak-set rows; worst-case
# line = 1675 B < the 1900 B tail guard (test_bench_contract.py)
MAX_HEADLINERS = 48
HEADLINE = (
    "hourly_report_dense",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "top_customers_by_revenue",
    "running_revenue_window",
    "top3_orders_per_customer",
    "distinct_supplier_counts",
    # docs_fingerprint_dedup retired r9 (a plain digest groupBy — the
    # least informative text headliner); replaced by the round-9
    # duplicated-span profile, whose span-key shuffle is the class's
    # real scale surface (measured exponent 1.0, shuffle ∝ corpus)
    "docs_duplicate_ngram_spans",
    # docs_quality_scores stays (0.39 s constant-bound, slope 1.84 cleared)
    # — the r13 rotation briefly retired it, but the optimization-round
    # contract keeps every prior queries{} entry; the Gopher repetition
    # profile ADDS alongside it — the r12 sweep's worst entry (slope
    # 9.24), rewritten map-side r13, needs a trend line
    "docs_quality_scores",
    "docs_repetition_profile",
    # docs_jaccard_vs_query + emb_cosine_topk retired r12 (sub-0.5 s
    # constant-bound; pair-dedup and vector ranking stay covered by
    # minhash/simhash and ivf/ivfpq rows); slots go to the round-11
    # dedup threshold-tuning curve and the exact-re-rank serving path
    "emb_dup_threshold_curve",
    "emb_ivfpq_rerank_topk",
    "emb_lsh_bucket_profile",
    # second wave: join/window/pivot/skew/UDF classes
    "events_asof_purchase_click",
    "purchase_click_attribution_1h",
    "events_daily_type_pivot",
    "events_salted_type_stats",
    "q18_large_orders",
    "docs_frame_sampling",
    "emb_ivf_topk",
    # docs_bpe_token_stats retired r12 (BPE class keeps docs_bpe_merges,
    # the expensive half); slot goes to the round-11 leakage-safe split
    "docs_leakage_safe_split",
    # third wave: pure-pushdown scan and sketch classes
    "q6_forecast_revenue",
    "events_cms_heavy_hitters",
    # fourth wave: iterative graph; events_ohlc_daily retired r12
    # (timeseries agg stays covered by events_daily_anomalies); slot goes
    # to the round-11 torn-state streaming cohort serving row
    "graph_pagerank_trade",
    "events_cohort_serving",
    # fifth wave: behavioral analytics (stacked windows, wedge join)
    "events_funnel_conversion",
    "parts_triangle_affinity",
    # sixth wave (round 3): explode-free BM25 ranking, integer-moment
    # anomaly windows
    "docs_bm25_search",
    "events_daily_anomalies",
    # seventh wave (round 4): per-user sequence windows (Markov matrix),
    # explode + broadcast-stats two-pass (feature standardization)
    "events_markov_transitions",
    "emb_dim_standardize",
    # eighth wave (round 4b): broadcast-model LM scoring, join-free
    # bipartite projection, pruned skyline, union+LOCF PIT lookup
    "docs_bigram_lm_score",
    "suppliers_cooccurrence",
    # parts_pareto_frontier stays (0.30 s constant-bound, slope 0.0 —
    # outright beats the oracle; briefly retired by the r13 rotation,
    # restored under the optimization-round never-remove contract); the
    # association-rules miner ADDS alongside it — the r12 sweep's second
    # un-dispositioned weak entry (slope 4.39), 4-variant A/B
    # floor-ratified r13, the trend line watches it
    "parts_pareto_frontier",
    "parts_association_rules",
    # events_pit_enrichment retired r12 (sub-0.4 s constant-bound; the
    # as-of/PIT class stays covered by events_asof_purchase_click); slot
    # goes to the suffix-automaton-free substring canonical manifest —
    # the heaviest un-benched catalog row
    "docs_substring_canonical_manifest",
    # ninth wave (round 4): shrinking-iteration graph peel, broadcast
    # membership sketch, two-pass data-derived sampling, truncated-vs-full
    # vector ranking
    "graph_kcore_trade",
    "events_bloom_prune_witness",
    "events_balanced_downsample",
    # emb_matryoshka_overlap retired r7 (vector class held 5 of 46 slots);
    # replaced by the round-6 BPE-training flagship, which had correctness
    # rows but zero committed wall-time evidence
    "docs_bpe_merges",
    # tenth wave (round 4): the flagship text-dedup pipeline, after the
    # codegen-cliff fix (expression-form signatures evaluated interpreted)
    "docs_minhash_pairs",
    # eleventh wave (round 4c): survival curve (single-scan + cached
    # per-user agg), postings-join link prediction, integer-ppm
    # credit-splitting over a 24h range join
    "events_kaplan_meier",
    "graph_adamic_adar",
    "events_time_decay_attribution",
    # twelfth wave (round 4d): word-count-shaped collocation mining and
    # the grouped-frequency KS drift statistic
    "docs_collocations_pmi",
    "events_ks_two_sample",
    # thirteenth wave (round 4d cont.): banded hamming dedup (first
    # headliner to beat the DuckDB twin outright) and the weighted
    # median's grouped-cumulative shape
    "docs_simhash_hamming_pairs",
    "lineitem_weighted_median_price",
)


# Fixed-work calibration sentinel (round-7 verdict #1). Totals rose
# 27.6 -> 31.0 -> 38.2 s across rounds 5-7 on mostly-untouched code; with no
# instrument, "cross-session spread" and "real regression" were
# indistinguishable. The sentinel is a constant synthetic workload — no I/O,
# no catalog dependence, no parquet, fixed row counts — timed the same way as
# the headliners (warmup + median of `runs`). If the sentinel moves with the
# headline total, the drift is environment (JVM/JIT/CPU clock/container
# noise); if the sentinel stays flat while queries rise, the regression is
# real and bisectable. Two phases so CPU drift and shuffle-machinery drift
# are separable:
#   cpu     — sum(xxhash64) over range(400M): pure whole-stage-codegen
#             compute, zero exchange
#   shuffle — groupBy(id % 64Ki) over range(2^24) then re-hash: one
#             fixed-size exchange (~64Ki groups) through the shuffle service
SENTINEL_CPU_ROWS = 400_000_000
SENTINEL_SHUFFLE_ROWS = 1 << 24
SENTINEL_SHUFFLE_KEYS = 1 << 16


def _calibration_sentinel(spark, runs: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    # bit_xor, not sum: summing 64-bit hashes overflows a long under the
    # ANSI-mode default, and the sentinel must never depend on session conf
    def cpu() -> None:
        spark.range(SENTINEL_CPU_ROWS, numPartitions=int(CPUS) * 2).select(
            F.bit_xor(F.xxhash64("id")).alias("h")
        ).collect()

    def shuffle() -> None:
        spark.range(
            SENTINEL_SHUFFLE_ROWS, numPartitions=int(CPUS) * 2
        ).groupBy((F.col("id") % SENTINEL_SHUFFLE_KEYS).alias("k")).agg(
            F.bit_xor(F.xxhash64("id")).alias("s")
        ).select(F.bit_xor(F.xxhash64("k", "s")).alias("h")).collect()

    out: dict[str, float] = {}
    for name, fn in (("cpu", cpu), ("shuffle", shuffle)):
        fn()  # warmup: codegen JIT, same protocol as the headliners
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[f"{name}_sec"] = round(samples[len(samples) // 2], 3)
        out[f"{name}_spread"] = round(samples[-1] - samples[0], 3)
    out["total_sec"] = round(out["cpu_sec"] + out["shuffle_sec"], 3)
    return out


# Local (interleaved) calibration: bench runs headliners in FIXED order, so
# a decaying-load box systematically inflates the same early queries while
# the single run-start sentinel under-reads the load they actually saw
# (round-11 driver bench: the three flagged "risers" were all early-order
# queries on a box whose sentinel decayed 2.635 -> 1.615 s across the run;
# all three judge-re-timed into band). A mini-sentinel every N queries makes
# per-query normalization LOCAL: each query divides by the average of the
# probes bracketing its block, so a load transient shows up as a moved
# denominator instead of a phantom regression.
MINI_SENTINEL_EVERY = 8
MINI_CPU_ROWS = 50_000_000
MINI_SHUFFLE_ROWS = 1 << 21
MINI_SHUFFLE_KEYS = 1 << 12


def _mini_sentinel(spark) -> float:
    """One timed pass of a small fixed workload (~0.3 s): cpu hash fold +
    one tiny exchange. Single-shot on purpose — it probes the box state AT
    THIS MOMENT; a median over retries would smooth away exactly the
    transient it exists to catch."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(MINI_CPU_ROWS, numPartitions=int(CPUS)).select(
        F.bit_xor(F.xxhash64("id")).alias("h")
    ).collect()
    spark.range(MINI_SHUFFLE_ROWS, numPartitions=int(CPUS)).groupBy(
        (F.col("id") % MINI_SHUFFLE_KEYS).alias("k")
    ).agg(F.bit_xor(F.xxhash64("id")).alias("s")).select(
        F.bit_xor(F.xxhash64("k", "s")).alias("h")
    ).collect()
    return time.perf_counter() - t0


def _stage_totals(spark) -> dict[str, int] | None:
    """Cumulative shuffle/spill bytes across all completed stages, from the
    UI REST API (the stable public surface for executor metrics). Shuffle
    bytes are the number that predicts 100 TB behavior — wall time at bench
    SF is mostly scheduling constant; bytes-through-the-shuffle scales
    linearly with data. Returns None when the UI is unreachable."""
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
    tot = {"shuffle_read": 0, "shuffle_write": 0, "spill": 0}
    for s in stages:
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["spill"] += s.get("memoryBytesSpilled", 0) + s.get(
            "diskBytesSpilled", 0
        )
    return tot


def _serving_index_latency(spark) -> dict:
    """Build-once/query-many serving path (operators/ann_index.py): the
    persisted IVF and codes-only IVF-PQ indexes are built UNTIMED over the
    embeddings table, then each query path's per-query latency is the
    median over a small query sample — the number a serving user would
    latency-test, which the per-query catalog fits deliberately don't
    measure (they re-fit per run). Goes to BENCH_DETAIL.json only; the
    driver line stays catalog-queries-only."""
    import shutil
    import tempfile

    try:
        from data_engineering_project_spark.operators import ann_index as ai
        from data_engineering_project_spark.sources.tables import load_table

        emb = load_table(spark, SF_DIR, "embeddings")
        # orderBy pins the evaluation sample: limit without ordering is
        # nondeterministic in Spark, which would put each run's latency
        # median over a different query set (round-7 advice)
        qvs = [
            [float(v) for v in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(8).collect()
        ]
        tmp = tempfile.mkdtemp(prefix="bench_serving_")
        out: dict = {"n_queries": len(qvs), "k": 10, "nprobe": 2}
        try:
            for kind, build, query in (
                ("ivf", ai.build_ivf_index, ai.query_ivf_index),
                ("ivfpq", ai.build_ivfpq_index, ai.query_ivfpq_index),
            ):
                path = os.path.join(tmp, kind)
                t0 = time.perf_counter()
                if kind == "ivf":
                    build(emb, path, k=16)
                else:
                    build(emb, path, k_cells=16)
                out[f"{kind}_build_sec"] = round(time.perf_counter() - t0, 3)
                query(spark, path, qvs[0], k=10, nprobe=2).collect()  # warmup
                samples = []
                for q in qvs:
                    t0 = time.perf_counter()
                    query(spark, path, q, k=10, nprobe=2).collect()
                    samples.append(time.perf_counter() - t0)
                samples.sort()
                out[f"{kind}_query_sec_median"] = round(
                    samples[len(samples) // 2], 4
                )
            return out
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as exc:  # never let the serving probe kill the bench
        return {"err": str(exc)[:200]}


def _cohort_serving_read_latency(spark, runs: int) -> dict:
    """events_cohort_serving's headline wall is dominated by its streaming
    protocol theater (three micro-batch upserts, a forced redelivery, a
    torn-state kill+replay) — in-run spread 6.4 s made the r12 number
    uninformative (r12 verdict #8). Split the two phases: build the state
    ONCE untimed from clean batches, then time only read_cohort_retention
    — the per-query path a serving user pays. Goes to BENCH_DETAIL.json;
    the driver line keeps the full protocol row."""
    import shutil
    import tempfile

    try:
        from pyspark.sql import functions as F

        from data_engineering_project_spark.sources.tables import load_table
        from data_engineering_project_spark.streaming.pipeline import (
            read_cohort_retention,
            upsert_cohort_state,
        )

        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "ts"
        )
        tmp = tempfile.mkdtemp(prefix="bench_cohort_read_")
        try:
            t0 = time.perf_counter()
            writer = upsert_cohort_state(tmp, time_col="ts")
            for i in range(3):
                writer(
                    ev.filter(
                        F.coalesce(F.pmod("event_id", F.lit(3)), F.lit(0))
                        == i
                    ),
                    i,
                )
            build = time.perf_counter() - t0
            read_cohort_retention(spark, tmp).collect()  # warmup
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                read_cohort_retention(spark, tmp).collect()
                samples.append(time.perf_counter() - t0)
            samples.sort()
            return {
                "state_build_sec": round(build, 3),
                "read_sec_median": round(samples[len(samples) // 2], 4),
                "n_batches": 3,
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as exc:  # never let the probe kill the bench
        return {"err": str(exc)[:200]}


def _duckdb_conn(sf_dir: str):
    import duckdb

    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    con = duckdb.connect()
    con.execute(f"SET threads TO {int(CPUS)}")
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _time_duckdb(con, sql: str, runs: int) -> float:
    con.execute(sql).fetchall()  # warmup (I/O cache, plan)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def _time_spark(fn, spark, sf_dir: str, runs: int) -> float:
    # untimed warmup run: planning + codegen JIT dominate at bench SF and
    # amortize to zero at production scale; report steady-state execution
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def _smaller_sf_dir(path: str) -> str | None:
    """The sf/10 sibling directory for the marginal-cost slope, if present."""
    base = os.path.basename(os.path.normpath(path))
    if not base.startswith("sf"):
        return None
    try:
        smaller = float(base[2:]) / 10
    except ValueError:
        return None
    sib = os.path.join(os.path.dirname(os.path.normpath(path)), f"sf{smaller:g}")
    return sib if os.path.isdir(sib) else None


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(os.path.normpath(path))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> None:
    from data_engineering_project_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(CPUS) * 2, 8)),
            # UI on an ephemeral port: its REST API is the metrics source
            # for per-query shuffle/spill bytes; retain enough stages that
            # the cumulative totals never lose history mid-bench
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # calibration BEFORE the headline loops: same session, same JVM state
    # the queries are about to run in
    sentinel = _calibration_sentinel(spark, runs)
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    shuffle_mb: dict[str, dict[str, float] | None] = {}
    minis: list[float] = []
    for qi, name in enumerate(HEADLINE):
        if qi % MINI_SENTINEL_EVERY == 0:
            minis.append(round(_mini_sentinel(spark), 3))
        fn = qs[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        before = _stage_totals(spark)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)  # median
        spreads[name] = round(samples[-1] - samples[0], 3)
        after = _stage_totals(spark)
        if before is not None and after is not None:
            # delta across the timed runs, per run
            shuffle_mb[name] = {
                k: round((after[k] - before[k]) / runs / 1e6, 2) for k in after
            }
        else:
            shuffle_mb[name] = None
    minis.append(round(_mini_sentinel(spark), 3))  # closing bracket probe

    # per-query LOCAL normalization: divide by the average of the probes
    # bracketing the query's block (mini i sits before block i)
    def _local_norm(qi: int, wall: float) -> float:
        i = qi // MINI_SENTINEL_EVERY
        local = (minis[i] + minis[min(i + 1, len(minis) - 1)]) / 2
        return round(wall / max(local, 1e-3), 3)

    queries_per_local_sentinel = {
        name: _local_norm(qi, timings[name])
        for qi, name in enumerate(HEADLINE)
    }

    # DuckDB twin: the same query's oracle SQL on the same parquet
    duck: dict[str, float | None] = {}
    ratio: dict[str, float | None] = {}
    con = _duckdb_conn(SF_DIR)
    for name in HEADLINE:
        if name in oracles:
            duck[name] = round(_time_duckdb(con, oracles[name], runs), 3)
            ratio[name] = round(timings[name] / max(duck[name], 1e-4), 1)
        else:
            duck[name] = None  # rows-only query: no SQL twin
            ratio[name] = None

    # marginal per-row cost ratio: scheduling constants cancel in t(sf)-t(sf/10).
    # Suppressed (null) when the DuckDB sf-delta denominator is under the
    # ~50 ms noise floor — a 6 ms delta divided into a Spark delta reads as a
    # huge "slope" that is pure measurement noise, not a scale defect.
    SLOPE_NOISE_FLOOR_SEC = 0.05
    slope: dict[str, float | None] = {}
    small_dir = _smaller_sf_dir(SF_DIR)
    if small_dir and os.environ.get("SPARK_GRAFT_BENCH_SLOPE", "1") == "1":
        con_small = _duckdb_conn(small_dir)
        for name in HEADLINE:
            if name not in oracles:
                slope[name] = None
                continue
            d_spark = timings[name] - _time_spark(qs[name], spark, small_dir, runs)
            d_duck = (duck[name] or 0) - _time_duckdb(
                con_small, oracles[name], runs
            )
            slope[name] = (
                round(d_spark / d_duck, 1)
                if d_spark > 0 and d_duck >= SLOPE_NOISE_FLOOR_SEC
                else None
            )

    total = round(sum(timings.values()), 3)
    # Driver-facing line: compact on purpose. The driver captures a bounded
    # tail of stdout (round 2's verbose line overflowed it → parsed:null), so
    # only the contract keys plus per-query duckdb/ratio go on the line;
    # everything else goes to BENCH_DETAIL.json next to this script.
    line = {
        "metric": "headline_query_wall_time_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "duckdb": duck,
        "ratio_spark_over_duckdb": ratio,
    }
    # second sentinel pass AFTER the timed loops: if within-run drift (warm
    # JVM heats up, GC pressure accumulates) is significant, the before/after
    # delta shows it — one run per phase, cheap
    sentinel_after = _calibration_sentinel(spark, 1)
    detail = dict(
        line,
        sentinel=sentinel,
        sentinel_after=sentinel_after,
        # per-query wall divided by the sentinel total: the unit-free number
        # to compare across rounds. If sentinel_sec moved between rounds, raw
        # per-query deltas at the same normalized value are environment, not
        # regression.
        queries_per_sentinel={
            k: round(v / max(sentinel["total_sec"], 1e-3), 3)
            for k, v in timings.items()
        },
        # interleaved probes + the LOCAL normalization (round-11 verdict
        # #5): if mini_sentinel_sec decays/spikes across the run, trust
        # queries_per_local_sentinel over raw walls for per-query deltas
        mini_sentinel_sec=minis,
        mini_sentinel_every=MINI_SENTINEL_EVERY,
        queries_per_local_sentinel=queries_per_local_sentinel,
        serving_index=_serving_index_latency(spark),
        cohort_serving_read=_cohort_serving_read_latency(spark, runs),
        spread_max_minus_min=spreads,
        per_run_mb=shuffle_mb,
        runs_per_query=runs,
        slope_ratio_spark_over_duckdb=slope,
        slope_noise_floor_sec=SLOPE_NOISE_FLOOR_SEC,
        ratio_note=(
            "raw ratios at laptop SF are dominated by Spark's fixed "
            "~0.3-0.5s/query scheduling constant vs DuckDB's ~ms "
            "embedded dispatch; the slope ratio cancels the constants "
            "(marginal per-row cost, the 100TB-relevant number); slope is "
            "null when the DuckDB sf-delta denominator is below the noise "
            "floor"
        ),
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    # The driver captures only a bounded (~2000-byte) TAIL of stdout and
    # parses the last JSON line it finds. Rounds 2 and 3 both lost their
    # official bench record to an overlong line (r3's guard asserted <4000
    # against a 2000-byte window). So: keep ONLY the contract keys on the
    # line, degrade by dropping optional keys instead of dying, round the
    # per-query values to shave bytes, and print the line LAST with nothing
    # after it. Full payload (duckdb/ratio/slope/spread) stays in
    # BENCH_DETAIL.json.
    DRIVER_TAIL_BYTES = 1900
    line = {
        "metric": "headline_query_wall_time_total",
        "value": total,
        "unit": "sec",
        "sf": _sf_from_dir(SF_DIR),
        # fixed-work calibration on the line so every round's driver artifact
        # carries its own environment denominator: value_norm = value /
        # sentinel_sec is the cross-round comparable number
        "sentinel_sec": sentinel["total_sec"],
        "value_norm": round(total / max(sentinel["total_sec"], 1e-3), 2),
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    out = json.dumps(line, separators=(",", ":"))
    if len(out) >= DRIVER_TAIL_BYTES:
        line["queries"] = {"detail": "see BENCH_DETAIL.json"}
        out = json.dumps(line, separators=(",", ":"))
    print(out, flush=True)


if __name__ == "__main__":
    main()
