"""Vector math over array<float> embedding columns, computed in DOUBLE.

Float32 inputs are cast element-wise to double before any arithmetic:
float→double widening is exact, and sequential double accumulation in
index order is bit-identical to DuckDB's list_sum over the same cast —
which keeps cosine scores oracle-checkable without tolerance hacks.

Two tiers:

- ``*_fixed`` (known dimension): the loop is unrolled into a flat
  arithmetic expression — stays inside whole-stage codegen, no
  per-element boxing. This is the hot path: a higher-order-function
  formulation is interpreted per element and ~an order of magnitude
  slower inside an all-pairs join.
- HOF fallbacks (``dot``/``norm``/``cosine_similarity``) for columns
  whose dimension isn't statically known.

Both tiers produce bit-identical sums (left fold from 0.0 == sequential
addition of the unrolled terms).
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


def _sum_terms(terms: list[Column]) -> Column:
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return expr


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Unrolled dot product for a statically known dimension."""
    return _sum_terms(
        [a.getItem(i).cast("double") * b.getItem(i).cast("double") for i in range(dim)]
    )


def norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(
        _sum_terms(
            [a.getItem(i).cast("double") * a.getItem(i).cast("double") for i in range(dim)]
        )
    )


def cosine_fixed(a: Column, b: Column, dim: int, na: Column, nb: Column) -> Column:
    """Cosine from an unrolled dot and PRE-COMPUTED per-vector norms.

    Inside an all-pairs or bucketed join, norms must be computed once
    per vector on each input side, not once per pair — that alone halves
    the pair-time arithmetic.
    """
    return dot_fixed(a, b, dim) / (na * nb)
