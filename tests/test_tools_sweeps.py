"""Unit guards for the standing-sweep tooling itself (ADVICE r11).

The partitioning-invariance sweep's deterministic row shuffle relies on a
multiplicative walk (seed + i*stride) % n being a bijection on 0..n-1 —
which holds iff gcd(stride, n) == 1, NOT merely n % stride != 0.
"""

from __future__ import annotations

import math

from tools.partitioning_invariance_sweep import SHUFFLE_SEED, coprime_stride


def test_coprime_stride_is_coprime_for_hostile_n():
    # the ADVICE counterexample: n divisible by both 7919 (forces the
    # bump to 7921 = 89^2) and 89 (shares a factor with the bump)
    hostile = 7919 * 89
    for n in (hostile, hostile * 2, 7919, 89, 7921, 1, 2, 3, 64, 7919 * 3):
        s = coprime_stride(n)
        assert math.gcd(s, n) == 1, (n, s)


def test_shuffle_permutation_is_bijection_on_hostile_n():
    # cover several n including multiples of 89 after a 7919 bump, plus
    # small and even sizes; the walk must visit every index exactly once
    for n in (89 * 7919 // 89, 89 * 5, 7919, 64, 1000, 267):
        stride = coprime_stride(n)
        perm = [(SHUFFLE_SEED + i * stride) % n for i in range(n)]
        assert sorted(perm) == list(range(n)), n


def test_engine_version_pin_matches_and_catches_drift(tmp_path, monkeypatch):
    """Seventh standing axis (r11 verdict #7): the battery certifies only
    the pinned engines; drift must refuse loudly (unless overridden)."""
    import json

    import pytest

    import tools.version_pin as vp

    vp.assert_engine_versions()  # the committed pin matches this image

    fake = dict(json.load(open(vp.PIN_PATH)))
    fake["pyspark"] = "0.0.0"
    p = tmp_path / "pin.json"
    p.write_text(json.dumps(fake))
    monkeypatch.setattr(vp, "PIN_PATH", str(p))
    monkeypatch.delenv("SPARK_GRAFT_ALLOW_VERSION_DRIFT", raising=False)
    with pytest.raises(SystemExit, match="engine-version drift"):
        vp.assert_engine_versions()
    monkeypatch.setenv("SPARK_GRAFT_ALLOW_VERSION_DRIFT", "1")
    vp.assert_engine_versions()  # exploratory override
