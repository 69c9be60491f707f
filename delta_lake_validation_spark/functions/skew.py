"""Skew-mitigation primitives: salting for hot keys.

AQE's skew-join splitting (on in our session factory) handles most cases at
runtime; these explicit forms are for the two places AQE can't help — hot
keys in aggregations (a single reducer owns the hot key's partition) and
broadcast-infeasible skewed joins — and they make the technique testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby(
    df: DataFrame, keys: list[str], aggs: dict[str, str], n_salts: int = 16
) -> DataFrame:
    """Two-stage aggregation: partial per (keys, salt), final per keys.

    The salt spreads each hot key over ``n_salts`` reducers in stage 1; the
    stage-2 input is at most n_salts rows per key.  Only algebraic
    aggregates (sum/count/min/max) decompose this way; avg = sum/count at
    the call site.  Results are identical to a plain groupBy (exact
    integer/min/max algebra; for float sums the usual order caveat applies
    — combine with functions.aggregates.dsum for determinism).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partials = []
    finals = []
    for col, how in aggs.items():
        if how not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {how!r}; supported: {sorted(_ALGEBRAIC)}")
        p_fn, f_fn = _ALGEBRAIC[how]
        partials.append(p_fn(col).alias(f"__p_{col}_{how}"))
        finals.append(f_fn(f"__p_{col}_{how}").alias(f"{col}_{how}"))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


_SALT_SAFE_JOINS = (
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
)

#: joins where the REPLICATED small side can emit unmatched rows — legal
#: since the null-stream fix below keeps exactly one replica of each
_OUTER_SMALL_JOINS = (
    "right", "right_outer", "rightouter",
    "full", "outer", "full_outer", "fullouter",
)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions and the small side replicated n_salts×.

    Use when the small side is too large to broadcast but small enough to
    replicate n_salts times; result equals ``big.join(small, on, how)``
    for EVERY equi-join type.  Big-side-preserving joins (inner/left/semi/
    anti) need no correction.  right/full outer (VERDICT r3 task 7) use
    the null-stream-side decomposition: the matched stream is the salted
    big-preserving join (inner for right, left for full), and the
    null-stream — small rows with NO match anywhere in big — comes from an
    anti join against big's DISTINCT keys (hot keys collapse to one row,
    so the anti join itself cannot skew), padded with typed nulls for the
    big side.  Their union is exactly the outer join: matched
    multiplicities untouched, each unmatched small row exactly once."""
    if how in _OUTER_SMALL_JOINS:
        base = (
            "inner" if how in ("right", "right_outer", "rightouter") else "left"
        )
        matched = salted_join(big, small, on, n_salts, base)
        unmatched = small.join(big.select(*on).distinct(), on, "left_anti")
        big_types = {f.name: f.dataType for f in big.schema.fields}
        padded = unmatched.select(
            *on,
            *[
                F.lit(None).cast(big_types[c]).alias(c)
                for c in big.columns
                if c not in on
            ],
            *[c for c in small.columns if c not in on],
        )
        return matched.unionByName(padded)
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports equi-join types "
            f"{_SALT_SAFE_JOINS + _OUTER_SMALL_JOINS}; got {how!r}"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated, on + ["__salt"], how)
    return out.drop("__salt")
