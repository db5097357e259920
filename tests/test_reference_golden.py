"""Byte-for-byte golden reproduction on the reference's REAL committed data.

The reference ships 11 nested AdTech parquet files (45-field impressions
schema, struct-encoded decimals/GUIDs, nanosecond timestamps —
``/root/reference/raw_data/``) and the golden per-date CSVs its pipeline
produced from them (``/root/reference/output/task1_output_2022-05-2{6,7}.csv``).
``tests/test_pipeline_e2e.py`` proves the logic on synthesized twins; THIS
test points the engine at the actual files with the UA filter from the
reference CLI default (``main.py:253``) and asserts the output bytes are
identical — the full nested-schema read path (SURVEY.md §1.2: struct
``device_settings.user_agent``, binary enum columns, ``{lo,hi,signScale}``
decimal structs all present in the scan) exercised on the real thing.
"""

from __future__ import annotations

import os

import pytest

from data_engineering_project_spark.pipeline import run_daily_report

RAW = "/root/reference/raw_data"
GOLDEN_DIR = "/root/reference/output"
GOLDEN_FILES = ("task1_output_2022-05-26.csv", "task1_output_2022-05-27.csv")
UA = "some user agent"  # reference main.py:253 --user-agent default

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RAW), reason="reference raw_data not present"
)


@pytest.fixture(scope="module")
def golden_run(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("golden_output")
    res = run_daily_report(spark, RAW, str(out), user_agent=UA)
    return res, str(out)


def test_golden_csvs_byte_identical(golden_run):
    res, out = golden_run
    assert sorted(os.path.basename(p) for p in res.csv_paths) == list(GOLDEN_FILES)
    for name in GOLDEN_FILES:
        with open(os.path.join(out, name), "rb") as f:
            mine = f.read()
        with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
            ref = f.read()
        assert mine == ref, name


def test_real_nested_schema_filter_counts(golden_run):
    """The UA filter ran against the real nested struct column: golden
    non-zero cells (26th: h11=4, h19=10 impressions; 27th: h11=10 clicks,
    h12=10/20) sum to 54 matched events."""
    res, _ = golden_run
    total = sum(
        r["impression_count"] + r["click_count"] for r in res.report.collect()
    )
    assert total == 54
    assert res.observation.get["n_dates"] == 2
