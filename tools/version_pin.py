"""Engine-version pin for the standing sweep battery (round-11 verdict #7).

Two of the closed divergence classes encode EMPIRICALLY PROBED
version-specific engine behavior: the ascii-fold tokenizer fix assumes
Spark's locale-dependent ``lower('İ')`` and the quality-score hardening
assumes the exact ANSI ``try_divide`` semantics of the pinned builds. A
sandbox image bump could silently re-open either class while every sweep
still reports green *against the new behavior*. So: the battery certifies
results only for the pinned engine versions; on drift it refuses loudly
and tells the operator to re-ratify.

Pinned manifest: ``tools/engine_versions.json`` (committed). After a
deliberate engine upgrade, re-run the FULL battery (driver sim at sf0.01 +
sf0.1, all standing axes) and then update the manifest in the same commit.
Override for a one-off exploratory run: ``SPARK_GRAFT_ALLOW_VERSION_DRIFT=1``
(the sweep banner records the drift so the run can't masquerade as a
certification).
"""

from __future__ import annotations

import json
import os
import sys

PIN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "engine_versions.json")


def current_versions() -> dict[str, str]:
    import duckdb
    import pyarrow
    import pyspark

    return {
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "pyarrow": pyarrow.__version__,
        "python": f"{sys.version_info[0]}.{sys.version_info[1]}",
    }


def assert_engine_versions() -> None:
    """Call at sweep start. Exits nonzero on drift unless explicitly
    overridden; prints the drift either way."""
    with open(PIN_PATH) as fh:
        pinned = json.load(fh)
    actual = current_versions()
    drift = {
        k: (pinned[k], actual.get(k))
        for k in pinned
        if actual.get(k) != pinned[k]
    }
    if not drift:
        return
    lines = ", ".join(f"{k}: pinned {p} != actual {a}" for k, (p, a) in drift.items())
    if os.environ.get("SPARK_GRAFT_ALLOW_VERSION_DRIFT") == "1":
        print(f"WARNING engine-version drift (override active): {lines}")
        return
    raise SystemExit(
        f"engine-version drift: {lines}\n"
        "The sweep battery certifies results only for the pinned engines "
        "(closed divergence classes encode version-probed behavior: "
        "lower('İ') fold, try_divide). Re-run the full battery on the new "
        "image and update tools/engine_versions.json in the same commit, "
        "or set SPARK_GRAFT_ALLOW_VERSION_DRIFT=1 for an exploratory run."
    )
