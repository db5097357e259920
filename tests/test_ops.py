"""Ops surface: schedule evaluation, verify-setup, healthcheck.

Mirrors the reference's deployment scaffolding (``verify_setup.py``,
``docker/entrypoint.sh``, ``docker/cron/schedules.py``) — checks are
pure control-plane, so these tests run without a SparkSession except the
one explicit probe test.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import pytest

from data_engineering_project_spark import ops


# --- cron parsing / next-fire ------------------------------------------------


def test_production_schedule_fires_every_six_hours():
    # reference schedules.py:20: 00:00, 06:00, 12:00, 18:00
    t = datetime(2022, 5, 26, 10, 15)
    fires = []
    for _ in range(4):
        t = ops.cron_next(ops.PRODUCTION_SCHEDULE, t)
        fires.append((t.hour, t.minute))
    assert fires == [(12, 0), (18, 0), (0, 0), (6, 0)]


def test_testing_schedule_fires_every_minute():
    t = ops.cron_next(ops.TESTING_SCHEDULE, datetime(2022, 5, 26, 10, 15, 30))
    assert t == datetime(2022, 5, 26, 10, 16)


def test_development_schedule_rounds_to_five_minutes():
    t = ops.cron_next(ops.DEVELOPMENT_SCHEDULE, datetime(2022, 5, 26, 10, 1))
    assert t == datetime(2022, 5, 26, 10, 5)


def test_weekly_monday_schedule():
    # Thu 2022-05-26 → next Monday 2022-05-30 00:00
    t = ops.cron_next("0 0 * * 1", datetime(2022, 5, 26, 10, 0))
    assert t == datetime(2022, 5, 30, 0, 0)


def test_dow_seven_is_sunday():
    assert ops.cron_next("0 0 * * 7", datetime(2022, 5, 26)) == datetime(
        2022, 5, 29
    )


def test_vixie_dom_dow_or_semantics():
    # both restricted → fire when EITHER matches: the 1st (Wed) or Monday
    sched = ops.CronSchedule.parse("0 0 1 * 1")
    assert sched.matches(datetime(2022, 6, 1, 0, 0))  # dom hit, a Wednesday
    assert sched.matches(datetime(2022, 6, 6, 0, 0))  # Monday, dom=6
    assert not sched.matches(datetime(2022, 6, 2, 0, 0))


def test_get_schedule_parity_with_reference():
    # exact strings from reference docker/cron/schedules.py:16-23
    assert ops.get_schedule("testing") == "* * * * *"
    assert ops.get_schedule("development") == "*/5 * * * *"
    assert ops.get_schedule("production") == "0 */6 * * *"
    assert ops.get_schedule("nonsense") == "* * * * *"  # fallback :40


def test_bad_expressions_rejected():
    with pytest.raises(ValueError):
        ops.cron_next("* * * *", datetime(2022, 1, 1))
    with pytest.raises(ValueError):
        ops.cron_next("61 * * * *", datetime(2022, 1, 1))


# --- scheduler loop ----------------------------------------------------------


def test_run_on_schedule_fake_clock_runs_at_fire_times():
    clock = {"now": datetime(2022, 5, 26, 10, 2)}
    ticks: list[datetime] = []

    def sleep(seconds: float) -> None:
        clock["now"] += timedelta(seconds=seconds)

    ran = ops.run_on_schedule(
        ticks.append,
        ops.DEVELOPMENT_SCHEDULE,
        max_ticks=3,
        now_fn=lambda: clock["now"],
        sleep_fn=sleep,
    )
    # entrypoint.sh:60-66 lifecycle: immediate run, then the cadence
    assert ran == 3
    assert ticks[0] == datetime(2022, 5, 26, 10, 2)
    assert ticks[1:] == [datetime(2022, 5, 26, 10, 5), datetime(2022, 5, 26, 10, 10)]


def test_run_on_schedule_survives_failing_tick():
    clock = {"now": datetime(2022, 5, 26, 10, 2)}
    errors: list[str] = []

    def tick(at: datetime) -> None:
        raise RuntimeError("boom")

    ran = ops.run_on_schedule(
        tick,
        ops.TESTING_SCHEDULE,
        max_ticks=2,
        now_fn=lambda: clock["now"],
        sleep_fn=lambda s: clock.__setitem__(
            "now", clock["now"] + timedelta(seconds=s)
        ),
        on_error=lambda at, e: errors.append(str(e)),
    )
    assert ran == 2
    assert errors == ["boom", "boom"]


# --- verify-setup ------------------------------------------------------------


def test_verify_setup_green_in_this_environment(tmp_path):
    db = str(tmp_path / "wh.duckdb")
    rep = ops.verify_setup(
        required_dirs=[str(tmp_path / "landing"), str(tmp_path / "out")],
        warehouse_db=db,
    )
    assert rep.ok, rep.as_dict()
    # missing dirs are created, not failed (reference verify_setup.py:49-55)
    assert os.path.isdir(tmp_path / "landing")
    names = [c.name for c in rep.checks]
    assert names == ["java", "python", "packages", "structure", "warehouse"]


def test_verify_setup_reports_missing_dirs_when_not_creating(tmp_path):
    rep = ops.verify_setup(
        required_dirs=[str(tmp_path / "nope")], create_missing=False
    )
    assert not rep.ok
    bad = {c.name: c for c in rep.checks}["structure"]
    assert "nope" in bad.detail


def test_verify_setup_spark_probe(spark):
    rep = ops.verify_setup(spark=spark)
    assert {c.name: c.ok for c in rep.checks}["spark"]


# --- healthcheck -------------------------------------------------------------


def test_healthcheck_checkpoint_freshness(tmp_path):
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    rep = ops.healthcheck(checkpoint_dir=str(ckpt))
    assert not rep.ok  # no committed batch yet

    commit = ckpt / "commits" / "0"
    commit.write_text("v1")
    rep = ops.healthcheck(checkpoint_dir=str(ckpt), max_age_seconds=60)
    assert rep.ok

    # a stalled drain ages out
    rep = ops.healthcheck(
        checkpoint_dir=str(ckpt),
        max_age_seconds=60,
        now_fn=lambda: os.path.getmtime(commit) + 3600,
    )
    assert not rep.ok


def test_healthcheck_output_and_warehouse(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    rep = ops.healthcheck(output_dir=str(out))
    assert not rep.ok
    (out / "task1_output_2022-05-26.csv").write_text("date,hour\n2022-05-26,0\n")

    import duckdb

    db = str(tmp_path / "wh.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE client_report (datetime TIMESTAMP)")
    con.close()
    rep = ops.healthcheck(output_dir=str(out), warehouse_db=db)
    assert rep.ok
    assert "rows=0" in {c.name: c for c in rep.checks}["warehouse"].detail


# --- CLI wiring --------------------------------------------------------------


def test_cli_schedule_subcommand(capsys):
    from data_engineering_project_spark.cli import main

    assert main(["schedule", "--environment", "production", "--next", "3"]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["cron"] == "0 */6 * * *"
    assert len(payload["next"]) == 3


def test_cli_healthcheck_exit_codes(tmp_path, capsys):
    from data_engineering_project_spark.cli import main

    out = tmp_path / "out"
    out.mkdir()
    assert main(["healthcheck", "--output-dir", str(out)]) == 1
    (out / "task1_output_2022-05-26.csv").write_text("date,hour\n2022-05-26,0\n")
    assert main(["healthcheck", "--output-dir", str(out)]) == 0


def test_cli_query_list_and_unknown(capsys):
    from data_engineering_project_spark.cli import main

    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) > 150

    assert main(["query", "no_such_query", "--sf-dir", "/tmp"]) == 2


def test_cli_sql_and_query_over_tables(spark, sf_dir, capsys):
    """The ad-hoc SQL surface and the named-catalog runner both execute
    against the registered temp-view catalog (the reference's only SQL
    usage is a smoke round-trip, verify_setup.py:288-289 — here SQL is a
    first-class entry point)."""
    from data_engineering_project_spark.cli import main

    rc = main(
        [
            "sql",
            "SELECT count(*) AS n FROM nation",
            "--sf-dir",
            sf_dir,
        ]
    )
    assert rc == 0
    assert "25" in capsys.readouterr().out

    rc = main(["query", "event_type_counts", "--sf-dir", sf_dir, "--limit", "3"])
    assert rc == 0
    assert "event_type" in capsys.readouterr().out


def test_cli_query_save_to_snapshot_table(spark, sf_dir, tmp_path, capsys):
    from data_engineering_project_spark.cli import main
    from data_engineering_project_spark.sinks import snapshot_table as st

    table = str(tmp_path / "qtbl")
    rc = main(["query", "event_type_counts", "--sf-dir", sf_dir, "--save", table])
    assert rc == 0
    assert "v0" in capsys.readouterr().out
    df = st.read_table(spark, table)
    assert df.count() > 0 and "event_type" in df.columns
    # a second save commits a NEW version (append semantics)
    assert main(["query", "event_type_counts", "--sf-dir", sf_dir, "--save", table]) == 0
    assert st.current_version(table) == 1


def test_cli_tag_requires_an_action(tmp_path, capsys):
    """`tag <table>` with no action flags must error, not silently
    succeed — and --version/--replace are modifiers of --create only."""
    from data_engineering_project_spark.cli import main

    assert main(["tag", str(tmp_path)]) == 2
    assert "required" in capsys.readouterr().err
    assert main(["tag", str(tmp_path), "--replace"]) == 2
    assert "--create" in capsys.readouterr().err
    assert main(["tag", str(tmp_path), "--version", "3"]) == 2


def test_cli_dedup_materializes_corpus_and_manifest(spark, sf_dir, tmp_path, capsys):
    """`dedup` subcommand: the deduplicated corpus + removal manifest land
    as snapshot tables and compose (kept + removed == corpus; removed ids
    match the manifest exactly)."""
    from data_engineering_project_spark.cli import main
    from data_engineering_project_spark.sinks import snapshot_table as st
    from data_engineering_project_spark.sources.tables import load_table

    out = str(tmp_path / "deduped")
    man = str(tmp_path / "manifest")
    rc = main(
        [
            "dedup", "--sf-dir", sf_dir, "--flavor", "substring",
            "--out", out, "--manifest-out", man, "--master", "local[4]",
        ]
    )
    assert rc in (0, None)
    kept = {r["doc_id"] for r in st.read_table(spark, out).select("doc_id").collect()}
    removed = {r["doc_id"] for r in st.read_table(spark, man).select("doc_id").collect()}
    all_ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    assert kept | removed == all_ids
    assert kept & removed == set()
    assert removed  # the fixture corpus has real shared substrings

    # re-running with the same targets must REPLACE the snapshots, not
    # append a second full copy of every row (ADVICE r6)
    rc = main(
        [
            "dedup", "--sf-dir", sf_dir, "--flavor", "substring",
            "--out", out, "--manifest-out", man, "--master", "local[4]",
        ]
    )
    assert rc in (0, None)
    kept2 = [r["doc_id"] for r in st.read_table(spark, out).select("doc_id").collect()]
    removed2 = [
        r["doc_id"] for r in st.read_table(spark, man).select("doc_id").collect()
    ]
    assert sorted(kept2) == sorted(kept)  # no duplicated rows
    assert sorted(removed2) == sorted(removed)


def test_cli_index_lifecycle_with_optimize(spark, sf_dir, tmp_path, capsys):
    """`index` subcommand ops loop: build → append (new vectors absorbed
    without refit) → optimize (re-cluster commit) → optimize again (no
    churn) → query still serves."""
    from data_engineering_project_spark.cli import main
    from data_engineering_project_spark.sinks import snapshot_table as st

    table = str(tmp_path / "ivf")
    common = ["--sf-dir", sf_dir, "--master", "local[4]"]
    # incremental-ingest shape: build on one slice, append the DISJOINT
    # rest — an append of brand-new vec_ids lands as new files on top of
    # the build's cell-partitioned layout, which is what optimize then
    # re-clusters. (Re-appending the same ids is a full-table upsert that
    # rewrites into an already-compact file — nothing to optimize.)
    assert main(
        ["index", "build", table, *common, "--k-cells", "4",
         "--where", "vec_id < 400"]
    ) in (0, None)
    assert main(
        ["index", "append", table, *common, "--where", "vec_id >= 400"]
    ) in (0, None)
    v_before = st.current_version(table)
    assert main(["index", "optimize", table, *common]) in (0, None)
    assert st.current_version(table) == v_before + 1
    assert st.read_manifest(table).operation == "optimize"
    out1 = capsys.readouterr().out
    assert "files)" in out1
    assert main(["index", "optimize", table, *common]) in (0, None)
    assert st.current_version(table) == v_before + 1  # idempotent
    assert "already compact" in capsys.readouterr().out
    assert main(["index", "query", table, *common, "--query-id", "3"]) in (0, None)
    assert "vec_id" in capsys.readouterr().out
