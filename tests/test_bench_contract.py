"""Bench driver-line contract: the external driver parses the LAST JSON
line from a bounded ~2000-byte tail of stdout. Rounds 2 and 3 both lost
their official bench record to an overlong line; round 4's fix added a
degrade path that drops per-query timings — these tests keep the headline
set capped so the degrade path never fires and the per-query record stays
in the official artifact."""

from __future__ import annotations

import json


def test_headline_set_is_capped():
    import bench

    assert len(bench.HEADLINE) <= bench.MAX_HEADLINERS
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dupes


def test_worst_case_driver_line_fits_the_tail_window():
    """Serialize the driver line with worst-plausible values (four-digit
    total, three-digit per-query seconds) over the ACTUAL headline names:
    it must clear the 1900-byte guard with margin, so real timings can
    never trip the degrade path that replaces per-query detail with a
    pointer."""
    import bench

    line = {
        "metric": "headline_query_wall_time_total",
        "value": 9999.999,
        "unit": "sec",
        "sf": 0.1,
        "sentinel_sec": 999.999,
        "value_norm": 9999.99,
        "queries": {k: 999.99 for k in bench.HEADLINE},
    }
    out = json.dumps(line, separators=(",", ":"))
    assert len(out) < 1900, len(out)


def test_every_headliner_is_a_catalog_query():
    import bench

    from data_engineering_project_spark.plans.catalog import queries

    missing = [n for n in bench.HEADLINE if n not in queries()]
    assert not missing, missing
