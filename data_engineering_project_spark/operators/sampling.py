"""Deterministic, reproducible sampling — the mixing primitive of a
training-data pipeline.

``df.sample()`` draws per-partition randoms, so the selected set changes
with partitioning, session, and cluster size — unacceptable when a 100 TB
corpus must be re-derivable bit-for-bit (data lineage audits, ablations,
resumable jobs). Hash-based sampling replaces randomness with a pure
function of a stable key: a row is in the p% sample iff
``bucket(md5(salt || key)) < p``. Properties:

- identical membership on any cluster, any partitioning, any engine
  (MD5 is everywhere; the DuckDB oracles restate it exactly)
- monotone: the 10% sample is a subset of the 20% sample (same salt)
- independent samples come from changing the salt, not the seed
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket resolution: fractions are exact multiples of 1/10000
N_BUCKETS = 10_000


def hash_bucket(key: Column, *, salt: str = "") -> Column:
    """Stable bucket in [0, N_BUCKETS): first 8 MD5 hex digits of
    ``salt || key`` as an integer, mod N_BUCKETS. Engine-portable
    (DuckDB: ``CAST('0x' || substr(md5(..),1,8) AS BIGINT) % N``)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10
    )
    return h.cast("long") % N_BUCKETS


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    *,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff its key hashes under ``fraction`` — a reproducible
    Bernoulli-style sample that is a pure filter (pushes past joins,
    no shuffle, no state)."""
    return df.filter(
        hash_bucket(F.col(key_col), salt=salt) < int(fraction * N_BUCKETS)
    )


def stratified_deterministic_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep-rates (the mixture-weights operator: downsample
    over-represented sources, keep the rest) — ``sampleBy`` semantics but
    reproducible. Strata absent from ``fractions`` get
    ``default_fraction``."""
    threshold = F.lit(int(default_fraction * N_BUCKETS))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * N_BUCKETS))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), salt=salt) < threshold)
