"""Deterministic transcendental math — identical bits in Spark and DuckDB.

The obvious route — Spark ``ln`` vs DuckDB ``ln`` — is NOT gate-safe:
measured on this host, the JVM's log and the system libm's log disagree
in the last ulp for ~1% of arguments (e.g. ``ln(3.0)``,
``ln(308.0)``), and 2-arg ``log(base, x)`` and ``%`` on doubles diverge
too. A hash gate built on raw ``ln`` is a coin flip that happens to
land green at small scale (the fixed-point quantization masks most
last-ulp flips) and fails unpredictably as term counts grow.

This module instead builds ``ln`` from operations IEEE 754 requires to
be correctly rounded — ``+ - * /`` and ``sqrt`` — so both engines
compute the same double at every step BY CONSTRUCTION:

    ln(x) = 2^16 · ln(x^(1/2^16))            (16 exact sqrts)
          ≈ 2^16 · 2u·(1 + u²/3 + u⁴/5)      u = (y−1)/(y+1)

After 16 square roots, ``y`` is within 2^-16·|ln x| of 1, so the
3-term atanh series is exact to ~1e-22; the dominant error is sqrt
rounding accumulation. Measured accuracy: |ln_det(x) − log(x)| ≤
1.4e-11 over x ∈ [1e-9, 1e9] (tests/test_infotheory.py), and ZERO
cross-engine bit mismatches over 200k sampled arguments. Consumers
(plans/infotheory.py) pair it with the Q40 fixed-point summation in
functions/fixedpoint.py.

Cost: 16 sqrts + ~15 arithmetic ops per evaluation, all inside
whole-stage codegen / DuckDB's vectorized executor. Consumers bind
each ln as a COLUMN at the coarsest grain that has its argument
(vocab, source, state-pair) so the chain runs once per bounded row,
never per raw data row.
"""

from __future__ import annotations

#: number of exact square roots in the range reduction
LN_SQRT_DEPTH = 16

#: 2 · 2^LN_SQRT_DEPTH — the series prefactor (power of two, exact)
_LN_PREFACTOR = 2.0 * float(1 << LN_SQRT_DEPTH)


def sql_ln_det(arg: str) -> str:
    """Engine-portable deterministic natural log of a POSITIVE SQL
    expression. Valid verbatim in Spark SQL (via ``F.expr``) and
    DuckDB. The argument text is inlined several times — bind it to a
    simple column name first when it is a long expression."""
    y = f"({arg})"
    for _ in range(LN_SQRT_DEPTH):
        y = f"sqrt({y})"
    u = f"((({y}) - 1.0) / (({y}) + 1.0))"
    return (
        f"({_LN_PREFACTOR!r} * {u} * (1.0 + ({u} * {u}) / 3.0"
        f" + ({u} * {u} * {u} * {u}) / 5.0))"
    )


def ln_det_py(x: float) -> float:
    """Python twin of :func:`sql_ln_det` — same operation sequence, for
    parity tests and driver-side constants."""
    import math

    y = x
    for _ in range(LN_SQRT_DEPTH):
        y = math.sqrt(y)
    u = (y - 1.0) / (y + 1.0)
    return _LN_PREFACTOR * u * (1.0 + (u * u) / 3.0 + (u * u * u * u) / 5.0)


# ---------------------------------------------------------------------------
# deterministic exp — squaring chain
# ---------------------------------------------------------------------------

#: number of exact squarings in the range reconstruction
EXP_SQUARINGS = 16

#: 2^EXP_SQUARINGS — the argument pre-scale (power of two, exact divide)
_EXP_SCALE = float(1 << EXP_SQUARINGS)


def _exp_taylor(t: str) -> str:
    """5-term Horner Taylor of exp on the tiny pre-scaled argument."""
    return (
        f"(1.0 + ({t}) * (1.0 + ({t}) * (0.5 + ({t})"
        f" * (0.16666666666666666 + ({t}) * 0.041666666666666664))))"
    )


def with_exp_det(df, arg_col: str, out_col: str):
    """Spark side: bind ``exp_det(arg_col)`` as ``out_col`` via a
    withColumn chain (the 16 squarings MUST be bound stages — inlining
    them would blow the expression tree up 2^16-fold).

    exp(x) = (T₅(x/2^16))^(2^16): the prescale divide is exact (power
    of two), the Taylor series on |t| ≤ x/65536 and the squarings are
    correctly-rounded IEEE ops — bit-identical across engines like
    :func:`sql_ln_det`. Measured accuracy: relative error ≤ 1.4e-11
    over x ∈ [−30, 30] (tests/test_infotheory.py)."""
    from pyspark.sql import functions as F

    df = df.withColumn(
        out_col, F.expr(_exp_taylor(f"({arg_col}) / {_EXP_SCALE!r}"))
    )
    for _ in range(EXP_SQUARINGS):
        df = df.withColumn(out_col, F.col(out_col) * F.col(out_col))
    return df


def sql_exp_det_wrap(inner_sql: str, arg_expr: str, out_col: str) -> str:
    """DuckDB side of :func:`with_exp_det`: wrap a SELECT in the bound
    Taylor stage + 16 ``SELECT * REPLACE (out*out AS out)`` squaring
    stages (binding per stage, same reason as the Spark chain)."""
    q = (
        f"SELECT *, {_exp_taylor(f'({arg_expr}) / {_EXP_SCALE!r}')}"
        f" AS {out_col} FROM ({inner_sql})"
    )
    for _ in range(EXP_SQUARINGS):
        q = f"SELECT * REPLACE ({out_col} * {out_col} AS {out_col}) FROM ({q})"
    return q


def exp_det_py(x: float) -> float:
    """Python twin of the exp_det chain — same operation sequence."""
    t = x / _EXP_SCALE
    b = 1.0 + t * (1.0 + t * (0.5 + t * (0.16666666666666666 + t * 0.041666666666666664)))
    for _ in range(EXP_SQUARINGS):
        b = b * b
    return b
