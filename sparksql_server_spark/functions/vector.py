"""Portable vector math over array<float> embedding columns.

Both dialects accumulate the dot product left-to-right in DOUBLE over
float32 element products — bit-identical across engines (verified:
same IEEE ops in the same order), so cosine similarities hash-match
after a round(…, 6).

Spark-first note: these are JVM higher-order functions (no Python in
the row path). For the 100 TB path the same expressions vectorize per
partition; a Pandas-UDF BLAS variant is a drop-in swap where net win
is proven (see operators/similarity.py docstring).
"""

from __future__ import annotations


def spark_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        f"(acc, v) -> acc + v)"
    )


def spark_norm(a: str) -> str:
    return f"sqrt({spark_dot(a, a)})"


def duck_norm(a: str) -> str:
    return f"sqrt({duck_dot(a, a)})"


def exact_numpy_dots(a32, b32):
    """Row-wise dot product over the LAST axis that reproduces both
    engines' SQL folds BIT-FOR-BIT: float32 element products (IEEE
    multiply, the same single op everywhere) accumulated left-to-right
    in float64 by ``np.add.accumulate`` — sequential by definition,
    unlike ``np.sum``'s pairwise order — seeded with +0.0 exactly like
    the folds' ``0D`` init (so a leading -0.0 product folds to +0.0
    identically). Verified bitwise against the DuckDB fold over 40k
    pair dots and all norms (round 11). Shared by the Arrow-batched
    hot paths in operators/dedup.py (semdedup assignment + pairwise,
    embedding-cosine pairwise); inputs must be float32 arrays with the
    dot along the last axis."""
    import numpy as np

    p = (a32 * b32).astype(np.float64)
    seeded = np.concatenate([np.zeros(p.shape[:-1] + (1,)), p], axis=-1)
    return np.add.accumulate(seeded, axis=-1)[..., -1]


# Negative result (round 11, measured): unrolling the fold into a flat
# 64-term arithmetic chain (element_at(a,1)*element_at(b,1) + …) is
# bit-identical on both engines but 5× SLOWER in practice — the hot
# consumers evaluate the dot inside BroadcastNestedLoopJoin projections
# (cross joins never enter whole-stage codegen), where 128 interpreted
# element_at Expression.eval calls lose to the HOF fold's tight lambda
# loop. The scale levers that worked are structural (one-pass fold
# assignment, spill-once, salted pairwise join — see
# operators/dedup.py::dedup_semdedup_cells), not expression rewrites.
