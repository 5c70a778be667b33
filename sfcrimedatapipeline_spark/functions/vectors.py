"""Vector math over array<float> embedding columns — built-in
higher-order functions only (zip_with + aggregate), computed in DOUBLE.

Float32 inputs are cast element-wise to double before any arithmetic:
float→double widening is exact, and sequential double accumulation in
index order is bit-identical to DuckDB's list_sum over the same cast —
which keeps cosine scores oracle-checkable without tolerance hacks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
