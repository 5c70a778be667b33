"""frequent_items_mg: Misra-Gries candidate generation + exact
recount — exactness and the survival guarantee under skew."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_mg_matches_exact_on_small_domain(spark):
    from sfcrimedatapipeline_spark.operators.profile import (
        frequent_items,
        frequent_items_mg,
    )

    df = spark.createDataFrame(
        [(v, w) for v in ["a", "a", "a", "b", "b", "c", None] for w in [1, 2]],
        "x string, y int",
    ).repartition(4)
    exact = [tuple(r) for r in frequent_items(df, ["x", "y"], k=3).collect()]
    mg = [tuple(r) for r in frequent_items_mg(df, ["x", "y"], k=3).collect()]
    assert sorted(mg) == sorted(exact)
    # NULL is profiled as the literal string
    assert any(r[1] == "NULL" for r in mg)


def test_mg_heavy_hitter_survives_high_cardinality_tail(spark):
    """10k distinct tail values + one value at 8% frequency: with
    capacity 64 (> 1/0.08) the hitter MUST survive candidate
    generation and report its EXACT count, even though the tail
    overflows every partition's counter budget."""
    from sfcrimedatapipeline_spark.operators.profile import frequent_items_mg

    n_tail, n_heavy = 10_000, 900
    rows = [(f"tail_{i}",) for i in range(n_tail)] + [("HOT",)] * n_heavy
    df = spark.createDataFrame(rows, "k string").repartition(8)
    out = frequent_items_mg(df, ["k"], k=1, capacity=64).collect()
    assert len(out) == 1
    assert out[0].value == "HOT"
    assert out[0].n == n_heavy  # recount is exact, not the MG estimate
    assert out[0].rank == 1
