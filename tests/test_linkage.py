"""Entity resolution (operators/linkage.py): blocking completeness,
scoring exactness, threshold behavior, cluster transitivity, and the
no-cartesian plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators import linkage


@pytest.fixture(scope="module")
def people(spark):
    # two true entities (1: Ann Smith variants, 2: Bob Jones variants),
    # one decoy sharing entity 1's block, one singleton in another block
    rows = [
        (1, "Ann Smith 00123", 7),
        (2, "ann  smith 00123", 7),     # case/whitespace variant of 1
        (3, "Ann Smyth 00123", 7),      # typo variant of 1
        (4, "Zzz Qqq 99123", 7),        # decoy: same last-3, no name overlap
        (5, "Bob Jones 00456", 7),
        (6, "bob jones 00456", 7),
        (7, "Carol White 00789", 3),    # singleton, own block
    ]
    return spark.createDataFrame(rows, "rec_id long, name string, nation int")


def test_trigrams_short_string_guard(spark):
    df = spark.createDataFrame([("ab",), ("abc",), ("",)], "s string")
    out = df.select(
        linkage.char_trigrams(F.col("s")).alias("tg")
    ).collect()
    assert out[0].tg == []
    assert out[1].tg == ["abc"]
    assert out[2].tg == []


def test_blocking_never_crosses_blocks(spark, people):
    recs = linkage.prepare_records(people, block_cols=["nation"])
    pairs = linkage.candidate_pairs(recs, block_cols=["nation"])
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # block (7, "123"): {1,2,3,4}; block (7, "456"): {5,6}; (3, "789"): {7}
    assert got == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6)}


def test_scores_and_threshold(spark, people):
    matched = linkage.link_records(
        people, block_cols=["nation"], threshold=0.6
    )
    rows = {(r.id_a, r.id_b): r for r in matched.collect()}
    # same-digit true variants match; the decoy never does
    assert set(rows) == {(1, 2), (1, 3), (2, 3), (5, 6)}
    r12 = rows[(1, 2)]
    # exact evidence: score is the documented rational
    assert r12.score == 0.5 * r12.n_inter / r12.n_union + 0.5
    assert r12.same_digits == 1
    # case-only variant: identical normalized trigram sets
    assert rows[(5, 6)].n_inter == rows[(5, 6)].n_union


def test_clusters_are_transitive(spark, people):
    matched = linkage.link_records(people, block_cols=["nation"], threshold=0.6)
    ents = {
        r.rec_id: r.canonical_id
        for r in linkage.resolve_entities(matched).collect()
    }
    # 1~2, 1~3, 2~3 -> one entity rooted at 1; 5~6 rooted at 5;
    # decoy 4 and singleton 7 matched nothing -> absent from the map
    assert ents == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_pair_plan_has_no_cartesian(spark, people):
    recs = linkage.prepare_records(people, block_cols=["nation"])
    plan = linkage.candidate_pairs(recs, block_cols=["nation"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
