"""The BLAS-tile near-dup variant must be BIT-identical to the unrolled
JVM-expression version — same pairs, same rounded cosines — because both
claim the same DuckDB oracle. Any drift here means the dim-sequential
accumulation or the Decimal HALF_UP rounding stopped mirroring Spark.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_blas_matches_jvm_exactly(spark):
    from sfcrimedatapipeline_spark.plans import llmops

    jvm = {
        (r.id_a, r.id_b): r.cosine
        for r in llmops.QUERIES["emb_near_duplicates"](spark, SF_DIR).collect()
    }
    blas = {
        (r.id_a, r.id_b): r.cosine
        for r in llmops.QUERIES["emb_near_duplicates_blas"](spark, SF_DIR).collect()
    }
    assert jvm.keys() == blas.keys()
    assert jvm, "fixture produced no near-dup pairs — test is vacuous"
    for pair, cos in jvm.items():
        assert blas[pair] == cos, f"cosine drift at {pair}"
