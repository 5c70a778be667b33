"""MERGE-upsert and SCD2 semantics on small deterministic fixtures,
plus the plan contract (delta broadcasts; base never shuffles)."""

from __future__ import annotations

import datetime as dt

from sfcrimedatapipeline_spark.operators.merge import merge_upsert, scd2_from_changelog


def test_merge_update_insert_and_untouched(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),  # untouched
        2: ("B", 99.0),  # whole-row update wins
        3: ("c", 30.0),  # untouched
        4: ("d", 40.0),  # inserted
    }


def test_merge_duplicate_delta_keys_do_not_multiply_base(spark):
    # two delta rows for one key: the base row is removed once, both
    # delta rows land (caller-resolved dedup, SQL MERGE would reject) —
    # the distinct() on delta keys is what protects the anti-join.
    base = spark.createDataFrame([(1, "a")], "k long, s string")
    updates = spark.createDataFrame([(1, "x"), (1, "y")], "k long, s string")
    out = merge_upsert(base, updates, ["k"]).collect()
    assert sorted(r["s"] for r in out) == ["x", "y"]


def test_merge_broadcasts_delta_keys(spark):
    base = spark.createDataFrame([(1, "a")], "k long, s string")
    updates = spark.createDataFrame([(2, "b")], "k long, s string")
    df = merge_upsert(base, updates, ["k"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan  # the base side must not shuffle


def test_scd2_versions_chain_and_tiebreak(spark):
    d = dt.date
    log = spark.createDataFrame(
        [
            (1, d(2020, 1, 1), "new", 100),
            (1, d(2020, 3, 1), "gold", 101),
            # simultaneous changes: higher tiebreak becomes the later version
            (2, d(2021, 1, 1), "first", 200),
            (2, d(2021, 1, 1), "second", 201),
        ],
        "k long, ts date, status string, seq long",
    )
    hist = scd2_from_changelog(log, key="k", change_ts="ts", tiebreak="seq")
    rows = {(r["k"], r["version"]): r for r in hist.collect()}
    assert rows[(1, 1)]["valid_to"] == d(2020, 3, 1) and not rows[(1, 1)]["is_current"]
    assert rows[(1, 2)]["valid_to"] is None and rows[(1, 2)]["is_current"]
    # zero-duration version from the simultaneous change, deterministic order
    assert rows[(2, 1)]["status"] == "first" and rows[(2, 1)]["valid_to"] == d(2021, 1, 1)
    assert rows[(2, 2)]["status"] == "second" and rows[(2, 2)]["is_current"]


def test_incremental_agg_merge_equals_full_recompute(spark):
    """state ⊕ delta == groupBy over the union, including keys present
    on only one side and a NULL key."""
    from sfcrimedatapipeline_spark.operators.merge import (
        build_agg_state,
        incremental_agg_merge,
    )

    base = spark.createDataFrame(
        [("a", 1.25), ("a", 2.50), ("b", -3.75), (None, 10.0)],
        "k string, value double",
    )
    delta = spark.createDataFrame(
        [("a", 0.25), ("c", 7.00), (None, -1.0)], "k string, value double"
    )
    merged = incremental_agg_merge(build_agg_state(base, ["k"]), delta, ["k"])
    full = build_agg_state(base.union(delta), ["k"])
    key = lambda r: (r.k or "", r.n_rows, str(r.sum_value), r.min_value, r.max_value)
    assert sorted(map(key, merged.collect())) == sorted(map(key, full.collect()))


def test_apply_cdc_latest_wins_and_deletes(spark):
    from sfcrimedatapipeline_spark.operators.merge import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    log = spark.createDataFrame(
        [
            (1, "a2", "u", 1),   # upsert...
            (1, None, "d", 2),   # ...then delete: latest wins → gone
            (2, "b2", "u", 5),
            (2, "b1", "u", 3),   # older upsert loses to seq 5
            (9, "new", "u", 1),  # fresh key → insert
            (7, None, "d", 1),   # delete of a key not in base → no-op
        ],
        "k long, v string, op string, seq long",
    )
    out = {r.k: r.v for r in apply_cdc(base, log, keys=["k"]).collect()}
    assert out == {2: "b2", 3: "c", 9: "new"}


def test_stale_partitions_statuses(spark):
    from pyspark.sql import functions as F

    from sfcrimedatapipeline_spark.operators.merge import (
        partition_fingerprints,
        stale_partitions,
    )

    old = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z"), ("c", 4, "w")],
        "p string, id long, v string",
    )
    # a: one value flipped (same row count); b: vanished; d: new
    new = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "Y"), ("c", 4, "w"), ("d", 5, "q")],
        "p string, id long, v string",
    )
    m = partition_fingerprints(old, F.col("p"), "p")
    c = partition_fingerprints(new, F.col("p"), "p")
    out = {r.p: r.status for r in stale_partitions(m, c, "p").collect()}
    assert out == {"a": "changed", "b": "vanished", "d": "new"}  # c unchanged → absent
    # order-insensitivity: permuted rows fingerprint identically
    perm = spark.createDataFrame(
        [("a", 2, "y"), ("a", 1, "x"), ("c", 4, "w"), ("b", 3, "z")],
        "p string, id long, v string",
    )
    assert stale_partitions(m, partition_fingerprints(perm, F.col("p"), "p"), "p").count() == 0


def test_apply_cdc_equal_seq_ties_resolve_deterministically(spark):
    # two changes share (key, seq): winner must be stable across runs
    # and partitionings — op 'd' sorts before 'u', so delete wins here
    from sfcrimedatapipeline_spark.operators.merge import apply_cdc

    base = spark.createDataFrame([(1, "old")], "k int, v string")
    chg = spark.createDataFrame(
        [(1, "new", "u", 5), (1, None, "d", 5)],
        "k int, v string, op string, seq int",
    )
    for n in (1, 7):
        out = apply_cdc(base, chg.repartition(n), ["k"]).collect()
        assert out == []
