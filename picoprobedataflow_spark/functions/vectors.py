"""Vector functions over ``array<float>`` embedding columns.

Everything is built from ``F.zip_with`` / ``F.aggregate`` — JVM-side
higher-order functions, no Python UDF, so similarity search stays in
whole-stage codegen. Accumulation is an ordered left fold in double
precision, which the DuckDB oracle reproduces with an ordered unnest
sum (rounding to 6 decimals absorbs any residual ulp drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def euclidean(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v * v))


def scale(a: Column, s: Column | float) -> Column:
    sc = F.lit(s) if isinstance(s, (int, float)) else s
    return F.transform(a, lambda x: x.cast("double") * sc)


def l2_normalize(a: Column) -> Column:
    return scale(a, F.lit(1.0) / norm(a))
