"""Skew-resilient aggregation: salting as a first-class operator.

A hash aggregate over a hot key sends that key's entire volume to one
reducer — at 100 TB a single skewed key (one event type, one null-ish user)
stalls the stage. AQE's skew-join handling covers joins, but skewed
*aggregations* still need salting: scatter each key across ``n_salt``
sub-keys, partially aggregate, then merge the partials in a second (now
tiny) aggregate.

Both stages are declarative DataFrame plans; correctness is independent of
the salt assignment, so any row→salt mapping works — we use a uniform
random salt (cheap, no extra column reads). The supported aggregate
functions are exactly the decomposable ones (count/sum/min/max and avg via
sum+count); non-decomposable aggregates (median, exact distinct) cannot be
salted this way and need different machinery (sketches or repartitioning).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial aggregate, merge aggregate) per supported function
_DECOMPOSITIONS = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    *,
    n_salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage skew-proof ``groupBy(keys).agg(...)``.

    ``aggs`` is a list of ``(func, column, alias)`` with ``func`` in
    {count, sum, min, max, avg}. The first shuffle keys on
    ``keys + salt`` (volume per reducer capped at ~1/n_salt of the hottest
    key); the second aggregates ``n_salt`` partial rows per key — negligible.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for i, (func, col, alias) in enumerate(aggs):
        p = f"_p{i}"
        if func == "avg":
            partials.append(F.sum(col).alias(f"{p}_s"))
            partials.append(F.count(col).alias(f"{p}_c"))
            finals.append(
                (F.sum(f"{p}_s") / F.sum(f"{p}_c")).alias(alias)
            )
            continue
        if func not in _DECOMPOSITIONS:
            raise ValueError(
                f"{func!r} is not salt-decomposable; supported: "
                f"{sorted(_DECOMPOSITIONS)} + avg"
            )
        part_fn, merge_fn = _DECOMPOSITIONS[func]
        partials.append(part_fn(col).alias(p))
        finals.append(merge_fn(p).alias(alias))

    salt = F.floor(F.rand(seed) * n_salt).alias("_salt")
    stage1 = df.groupBy(*keys, salt).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    how: str = "inner",
    n_salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Skew-proof equi-join: scatter the (large, skewed) left side across
    ``n_salt`` sub-keys and replicate the right side once per sub-key, so a
    hot join key's rows spread over ``n_salt`` reducers instead of
    hammering one.

    AQE's skew-join splitting usually makes this unnecessary — it detects
    oversized partitions at runtime and splits them — but AQE only splits
    *sort-merge* joins; a skewed key inside a shuffled hash join, or a skew
    known ahead of time, still wants explicit salting. Replication cost:
    right side × n_salt, so keep the replicated side the smaller one.

    Result is identical to ``left.join(right, on, how)`` for inner/left
    joins (tested property).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_l = F.floor(F.rand(seed) * n_salt).cast("int")
    lhs = left.withColumn("_salt", salt_l)
    rhs = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = lhs.join(rhs, on=[on, "_salt"], how=how)
    return out.drop("_salt")
