"""Model-based test of the snapshot table (hypothesis): a random sequence
of merge_upsert / replace-scope serve / delete_where commits is replayed
against a plain in-memory dict model, asserting after EVERY commit that

  - the latest table state equals the model exactly, and
  - every PRIOR version still reads back as its own historical model
    (time travel is checked at the end against the full version history),
then closes with the maintenance invariants on the same random history:
read_changes satisfies model_from + inserts - deletes == model_to for
every consecutive pair (and the full span), optimize preserves content
while committing a new version, and vacuum(keep_versions=1) keeps the
newest and any TAGGED version readable while expiring the rest.

The unit suite pins hand-built scenarios (shrunken re-serve, pruning
under scoping, schema evolution); this closes the space BETWEEN them —
interleavings like delete-then-replace-scope-then-upsert on overlapping
keys are exactly where a file-pruning MERGE implementation can silently
duplicate or drop rows, and the dict model is too simple to be wrong.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_project_spark.sinks.snapshot_table import (
    create_tag,
    current_version,
    delete_where,
    merge_upsert,
    optimize,
    read_changes,
    read_manifest,
    read_table,
    vacuum,
)

# keys: (k1, k2) with tiny domains so commits overlap files; v is the
# payload that upserts overwrite
_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda r: (r[0], r[1]),
)

_OP = st.one_of(
    st.tuples(st.just("upsert"), _ROWS),
    st.tuples(st.just("replace_scope"), _ROWS),
    st.tuples(
        st.just("delete_k1"), st.integers(min_value=0, max_value=3)
    ),
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k1 int, k2 int, v long")


def _table_state(spark, table, version=None):
    return {
        (r["k1"], r["k2"]): r["v"]
        for r in read_table(spark, table, version=version).collect()
    }


def _assert_empty_state(spark, table, version=None):
    """An all-deleted table legitimately reads back EITHER as an empty
    frame (a zero-row part file kept the version readable) OR as the loud
    holds-no-files refusal (the delete dropped every manifest entry) —
    both mean 'no rows'; fabricating rows is the only wrong answer."""
    try:
        state = _table_state(spark, table, version=version)
    except ValueError as exc:
        assert "holds no files" in str(exc)
    else:
        assert state == {}


@given(ops=st.lists(_OP, min_size=1, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_commit_sequences_match_the_dict_model(
    spark, tmp_path_factory, ops
):
    table = str(tmp_path_factory.mktemp("snap") / "t")
    model: dict = {}
    history: list[tuple[int, dict]] = []  # (version, model at that version)

    for op, arg in ops:
        if op == "upsert":
            m = merge_upsert(
                spark, table, _df(spark, arg), ["k1", "k2"],
                stats_cols=["k1"],
            )
            for k1, k2, v in arg:
                model[(k1, k2)] = v
        elif op == "replace_scope":
            m = merge_upsert(
                spark, table, _df(spark, arg), ["k1", "k2"],
                stats_cols=["k1"], replace_scope=["k1"],
            )
            scopes = {k1 for k1, _, _ in arg}
            model = {k: v for k, v in model.items() if k[0] not in scopes}
            for k1, k2, v in arg:
                model[(k1, k2)] = v
        else:  # delete_k1
            if not history:
                continue  # delete_where on an uncommitted table raises
            # deleting from an already-empty table is a no-op returning
            # the existing manifest; deleting the LAST rows must leave an
            # empty-but-readable table that accepts later upserts (the
            # model sweep's first run found merge_upsert crashing on
            # exactly that fileless-manifest state)
            m = delete_where(
                spark, table, F.col("k1") == arg, stats_cols=["k1"]
            )
            model = {k: v for k, v in model.items() if k[0] != arg}

        if model:
            assert _table_state(spark, table) == model, f"after {op}"
        else:
            _assert_empty_state(spark, table)
        history.append((m.version, dict(model)))

    # time travel: every retained version reads back as its own model
    for version, snap in history:
        if snap:
            assert _table_state(spark, table, version=version) == snap
        else:
            _assert_empty_state(spark, table, version=version)

    # CDC invariant over every consecutive pair plus the (first, last)
    # span: model_from + inserts - deletes == model_to, row-exact
    pairs = list(zip(history, history[1:]))
    if len(history) > 2:
        pairs.append((history[0], history[-1]))
    for (v_from, snap_from), (v_to, snap_to) in pairs:
        if not snap_from or not snap_to:
            continue  # empty snapshots hold no files to diff
        changes = read_changes(spark, table, v_from, v_to).collect()
        ins = {(r["k1"], r["k2"], r["v"]) for r in changes
               if r["_change"] == "insert"}
        dels = {(r["k1"], r["k2"], r["v"]) for r in changes
                if r["_change"] == "delete"}
        rows_from = {(k1, k2, v) for (k1, k2), v in snap_from.items()}
        rows_to = {(k1, k2, v) for (k1, k2), v in snap_to.items()}
        assert ins == rows_to - rows_from, f"inserts {v_from}->{v_to}"
        assert dels == rows_from - rows_to, f"deletes {v_from}->{v_to}"

    if not model or not history:
        return
    # optimize preserves content and history; vacuum keeps the newest
    # version and any TAGGED old version, and expires the rest
    n_before = len(read_manifest(table, None).files)
    m_opt = optimize(spark, table, stats_cols=["k1"])
    assert _table_state(spark, table) == model
    if n_before >= 2:
        assert m_opt is not None and m_opt.version > history[-1][0]

    tag_version, tag_snap = history[0]
    if tag_snap:
        create_tag(table, "pin", version=tag_version)
    removed = vacuum(table, keep_versions=1, lease_timeout_seconds=0.0)
    assert _table_state(spark, table) == model
    if tag_snap:
        assert _table_state(spark, table, version=tag_version) == tag_snap
    newest = current_version(table)
    for version, snap in history:
        if version >= newest or (tag_snap and version == tag_version):
            continue
        with pytest.raises((FileNotFoundError, ValueError)):
            _table_state(spark, table, version=version)
    assert isinstance(removed, list)


@given(
    ops=st.lists(_OP, min_size=2, max_size=5),
    lo=st.integers(min_value=-1, max_value=4),
    width=st.integers(min_value=0, max_value=3),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_stats_pruned_read_is_exactly_the_filtered_full_scan(
    spark, tmp_path_factory, ops, lo, width
):
    """read_pruned is a SUPERSET read (files whose [min,max] intersect the
    range) — so pruned-then-exact-filter must equal full-scan-then-filter
    on any commit history and any range, including empty and
    everything-pruned ranges. A pruned read missing rows is the silent
    wrong answer this table format must never produce at scale."""
    from data_engineering_project_spark.sinks.snapshot_table import (
        read_pruned,
    )

    table = str(tmp_path_factory.mktemp("snapp") / "t")
    wrote = False
    for op, arg in ops:
        if op == "delete_k1":
            continue  # range behavior is covered by the model test above
        merge_upsert(
            spark, table, _df(spark, arg), ["k1", "k2"],
            stats_cols=["k1"],
            replace_scope=["k1"] if op == "replace_scope" else None,
        )
        wrote = True
    if not wrote:
        return
    hi = lo + width
    pred = (F.col("k1") >= lo) & (F.col("k1") <= hi)
    pruned = sorted(
        tuple(r)
        for r in read_pruned(spark, table, "k1", lo, hi).filter(pred).collect()
    )
    full = sorted(
        tuple(r) for r in read_table(spark, table).filter(pred).collect()
    )
    assert pruned == full
