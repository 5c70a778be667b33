"""The grid-BLAS near-dup path must be BIT-identical to the unrolled
JVM-expression verify primitive — same pairs, same rounded cosines —
because both claim the same DuckDB oracle. Any drift here means the
dim-sequential accumulation or the Decimal HALF_UP rounding stopped
mirroring Spark. The LSH-bucketed path must be an exact-cosine SUBSET
of the exact pairs (bucketing only prunes candidates, never rescores).
"""

from __future__ import annotations

import pytest

from sfcrimedatapipeline_spark.plans.llmops import EMB_NEAR_DUP_THRESHOLD

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact_pairs(spark):
    from sfcrimedatapipeline_spark.operators import dedup
    from sfcrimedatapipeline_spark.plans.llmops import _read_parallel

    emb = _read_parallel(spark, SF_DIR, "embeddings")
    return {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_near_duplicates(
            emb, threshold=EMB_NEAR_DUP_THRESHOLD
        ).collect()
    }


def test_grid_blas_matches_jvm_exactly(spark, exact_pairs):
    from sfcrimedatapipeline_spark.operators import dedup
    from sfcrimedatapipeline_spark.plans.llmops import _read_parallel

    emb = _read_parallel(spark, SF_DIR, "embeddings")
    # grid=3 forces same-block AND cross-block tiles at fixture size
    blas = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_near_duplicates_blas(
            emb, threshold=EMB_NEAR_DUP_THRESHOLD, grid=3
        ).collect()
    }
    assert exact_pairs, "fixture produced no near-dup pairs — test is vacuous"
    assert blas.keys() == exact_pairs.keys()
    for pair, cos in exact_pairs.items():
        assert blas[pair] == cos, f"cosine drift at {pair}"


def test_lsh_is_exact_subset(spark, exact_pairs):
    from sfcrimedatapipeline_spark.operators import dedup
    from sfcrimedatapipeline_spark.plans.llmops import _read_parallel

    emb = _read_parallel(spark, SF_DIR, "embeddings")
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_near_duplicates_lsh(
            emb, threshold=EMB_NEAR_DUP_THRESHOLD, n_bands=2, planes_per_band=3
        ).collect()
    }
    assert lsh, "LSH found no pairs — bucketing or scoring is broken"
    assert set(lsh) <= set(exact_pairs)
    for pair, cos in lsh.items():
        assert exact_pairs[pair] == cos, f"cosine drift at {pair}"
