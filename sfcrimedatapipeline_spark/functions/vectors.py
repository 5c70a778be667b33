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


def _q(name: str) -> str:
    return f"`{name}`"


def _dot_sql(a: str, b: str, dim: int) -> str:
    # left-associative + chain == the sequential fold; parse once.
    return " + ".join(
        f"CAST({_q(a)}[{i}] AS DOUBLE) * CAST({_q(b)}[{i}] AS DOUBLE)"
        for i in range(dim)
    )


def dot_fixed(a: str, b: str, dim: int) -> Column:
    """Unrolled dot product for a statically known dimension.

    ``a``/``b`` are column NAMES: the unrolled tree is composed as ONE
    SQL string and parsed JVM-side in a single call. Building it from
    Python ``Column`` operators costs ~6 py4j round-trips per element
    (measured 1–2 s of driver time per 64-dim expression — dominating
    the small-scale wall time of every ANN query); ``F.expr`` of the
    identical text is ~4 ms. The parsed tree is operation-for-operation
    the same (same casts, same multiply, same left-assoc addition), so
    results stay bit-identical.
    """
    return F.expr(_dot_sql(a, b, dim))


def norm_fixed(a: str, dim: int) -> Column:
    return F.expr(f"sqrt({_dot_sql(a, a, dim)})")


def cosine_fixed(a: str, b: str, dim: int, na: str, nb: str) -> Column:
    """Cosine from an unrolled dot and PRE-COMPUTED per-vector norms.

    Inside an all-pairs or bucketed join, norms must be computed once
    per vector on each input side, not once per pair — that alone halves
    the pair-time arithmetic. All five arguments are column names.
    """
    return F.expr(f"({_dot_sql(a, b, dim)}) / ({_q(na)} * {_q(nb)})")
