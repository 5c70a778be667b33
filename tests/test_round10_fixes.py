"""Round-10 regression tests: the five r9 ADVICE items plus the
bench_diff environment-canary correction (VERDICT r9 #2/#3)."""

from __future__ import annotations

import importlib.util

import pytest


def _load_module(name: str, rel_path: str):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(repo, rel_path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------ ADVICE r9: hits()
def test_hits_rejects_zero_iters(spark):
    from sfcrimedatapipeline_spark.operators.graph import hits

    df = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="iters >= 1"):
        hits(df, iters=0)


def test_hits_output_survives_repeated_actions(spark):
    """ADVICE r9: hits() used to unpersist edges/nodes BEFORE the
    returned lazy frame was actioned, so every downstream action
    re-derived the distinct mirrored edge list from source. The fix
    ties the caches to the returned frame (unpersist_when_released):
    holding the result, two successive actions must agree and the
    edge/node inputs must still be cached (storageLevel.useMemory)."""
    from sfcrimedatapipeline_spark.operators.graph import hits

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 1)], "doc_a long, doc_b long"
    )
    out = hits(df, iters=2)
    first = {r.doc_id: (r.hub, r.authority) for r in out.collect()}
    second = {r.doc_id: (r.hub, r.authority) for r in out.collect()}
    assert first == second and len(first) == 4
    # at least one persisted RDD is still alive while `out` is held
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() > 0
    del out  # finalizer releases the edge/node caches


# ------------------------------------------- ADVICE r9: periodogram oracle
def test_periodogram_oracle_hod_is_sign_safe():
    """DuckDB % follows the dividend's sign; the oracle must bucket
    pre-epoch hour indexes into [0, 24) exactly like Spark's pmod."""
    import duckdb

    from sfcrimedatapipeline_spark.plans.timeseries import (
        _periodogram_oracle_sql,
    )

    sql = _periodogram_oracle_sql()
    assert "((h % 24) + 24) % 24" in sql
    # the exact expression, evaluated by the oracle engine on a
    # negative hour index, lands in [0, 24)
    got = duckdb.sql("SELECT ((-5 % 24) + 24) % 24").fetchone()[0]
    assert got == 19


# --------------------------------------------- ADVICE r9: _KMEANS_MEMO fp
def test_parquet_fingerprint_shapes():
    from sfcrimedatapipeline_spark.plans.llmops import _parquet_fingerprint

    fp = _parquet_fingerprint("/root/testdata/sf0.001", "embeddings")
    assert fp and fp != ("unstattable",)
    for rel, size, mtime_ns in fp:
        assert isinstance(rel, str) and size > 0 and mtime_ns > 0
    missing = _parquet_fingerprint("/root/testdata/sf0.001", "nope")
    assert missing == ()  # empty walk, distinct from any real table


# ------------------------------------ VERDICT r9 #2: env-canary correction
def test_bench_diff_canary_correction_absorbs_uniform_shift(tmp_path):
    """A synthetic 1.3x uniform environment shift across every query
    (canaries included) must produce ZERO regression flags once
    bench_diff normalizes by the canary median ratio; a genuine 3x
    single-query regression on top of the same shift must still flag."""
    import json
    import subprocess
    import sys

    bd = _load_module("bench_diff_r10", "tools/bench_diff.py")
    base = {c: 0.5 for c in bd.CANARIES}
    base.update({"real_query_a": 2.0, "real_query_b": 4.0})
    shifted = {q: v * 1.3 for q, v in base.items()}
    old_p, new_p = tmp_path / "old.json", tmp_path / "new.json"
    old_p.write_text(json.dumps({"queries": base}))
    new_p.write_text(json.dumps({"queries": shifted}))
    repo_root = bd.__file__.rsplit("/tools/", 1)[0]
    r = subprocess.run(
        [sys.executable, bd.__file__, str(old_p), str(new_p)],
        capture_output=True, text=True, cwd=repo_root,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "REGRESSION" not in r.stdout
    assert "environment factor" in r.stdout

    shifted["real_query_b"] = 4.0 * 3.9  # real regression atop the shift
    new_p.write_text(json.dumps({"queries": shifted}))
    r2 = subprocess.run(
        [sys.executable, bd.__file__, str(old_p), str(new_p)],
        capture_output=True, text=True, cwd=repo_root,
    )
    assert r2.returncode == 1
    assert "REGRESSION real_query_b" in r2.stdout
    assert "REGRESSION real_query_a" not in r2.stdout


def test_bench_diff_canaries_are_gated_trivial_scans():
    """The canary set must be real, cheap, pure-scan queries that every
    bench run includes: declared in queries(), not deferred, not
    bench-skipped."""
    import __spark_entry__ as e

    bd = _load_module("bench_diff_r10b", "tools/bench_diff.py")
    bench = _load_module("bench_r10", "bench.py")
    qs = e.queries()
    assert len(bd.CANARIES) >= 3
    for c in bd.CANARIES:
        assert c in qs
        assert c not in bench.BENCH_SKIP


# ------------------------------------- VERDICT r9 #8: unseen-first rotation
def test_rotation_puts_never_driver_seen_queries_first():
    """The rotating middle must sort queries absent from every
    published per-round driver artifact BEFORE already-verified ones,
    so the driver's ~50-query budget maximizes fresh cumulative
    coverage (VERDICT r9 #8 asks >=15 fresh in round 10's record)."""
    import __spark_entry__ as e

    qs = list(e.queries())
    seen = e._driver_seen()
    assert len(seen) >= 100  # r6-r9 cumulative record is present
    first50 = qs[:50]
    fresh = [q for q in first50 if q not in seen]
    # reference-first block (21) is always included and mostly seen;
    # the remaining ~29 rotation slots must all be unseen while any
    # unseen queries remain in the middle
    assert len(fresh) >= 15, fresh
    # round 11 added a _PIN_FIRST block between the reference series
    # and the rotating middle (VERDICT r10 #1/#7 driver-prove pins);
    # the unseen-first ordering invariant applies to the middle only
    pinned = [q for q in getattr(e, "_PIN_FIRST", []) if q in qs]
    n_head = len([q for q in e._REFERENCE_FIRST if q in qs]) + len(pinned)
    n_tail = len(
        [q for q in e._DEFERRED if q in qs and q not in pinned]
    )
    middle = qs[n_head : len(qs) - n_tail]
    unseen_flags = [q in seen for q in middle]
    # once a seen query appears, no unseen query may follow it
    if True in unseen_flags:
        assert all(unseen_flags[unseen_flags.index(True):])


# ------------------------------- VERDICT r9 #5: incremental ANN maintenance
def test_ivfpq_index_append_never_rewrites_base_files(spark, tmp_path):
    """The delta append must be pure file ADDITION inside the existing
    list_id partition directories: every pre-append data file survives
    byte-identical (name, size, mtime), so at 100 TB a daily increment
    costs only the new codes' write, never a base rewrite."""
    import os

    from sfcrimedatapipeline_spark.operators import similarity
    from sfcrimedatapipeline_spark.sources.tables import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.filter("vec_id % 10 != 0")
    delta = emb.filter("vec_id % 10 = 0")
    d = str(tmp_path / "idx")
    similarity.ivfpq_index_write(base, d, n_centroids=8)

    def snapshot():
        out = {}
        codes = os.path.join(d, "codes")
        for dirpath, _dirs, files in os.walk(codes):
            for name in files:
                if name.startswith("part-"):
                    p = os.path.join(dirpath, name)
                    st = os.stat(p)
                    out[os.path.relpath(p, codes)] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot()
    assert before  # base build produced data files
    similarity.ivfpq_index_append(d, delta)
    after = snapshot()
    # strict superset: every base file untouched, new files added
    assert set(before) < set(after)
    for rel, sig in before.items():
        assert after[rel] == sig, f"base file rewritten: {rel}"


def test_ivfpq_delta_query_search_is_partition_pruned(spark):
    """The gated incremental-index query's scan must carry a
    PartitionFilters predicate on list_id (probed lists only)."""
    from sfcrimedatapipeline_spark.plans import llmops

    df = llmops.ann_ivfpq_index_delta(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "list_id" in plan


# ---------------------------- VERDICT r9 #6: perceptual contamination
def test_perceptual_contamination_finds_planted_reencoded_twin(spark):
    """A re-encoded eval copy (first byte changed — different raw
    bytes, so exact byte dedup misses it; same metadata plane) must be
    attributed to its train source within hamming <= 3, and an
    unrelated eval image must not match."""
    from pyspark.sql import functions as F

    from sfcrimedatapipeline_spark.operators import multimodal as mm

    text0 = "the quick brown fox jumps over the lazy dog " * 4
    text1 = "zzzz completely different content qqqq " * 5
    docs = spark.createDataFrame(
        [(0, text0), (3, text1)], "doc_id long, text string"
    )
    train = mm.synthesize_media(docs)  # both are images (doc_id % 3 == 0)
    # re-encode twin of doc 0: one leading-byte artifact, source w/h
    twin_docs = spark.createDataFrame(
        [(0, "x" + text0[1:])], "doc_id long, text string"
    )
    eval_media = mm.synthesize_media(twin_docs).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        "media_type",
        "payload",
        "meta",
    )
    got = mm.perceptual_contamination(
        eval_media, train, method="bytes", algorithm="dhash", max_hamming=3
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.eval_id, r.best_train_id) == (1000, 0)
    assert r.best_hamming <= 3 and r.n_train_matches == 1
    # and the twin's raw bytes differ from the source's (md5-exact
    # dedup would NOT have caught this pair)
    payloads = {row.doc_id: bytes(row.payload) for row in train.collect()}
    twin_payload = bytes(eval_media.collect()[0].payload)
    assert twin_payload != payloads[0]


def test_media_contamination_query_attributes_sources(spark):
    """The gated report at sf0.001: every planted eval twin of an
    ASCII-leading source is contaminated, and best_train_id recovers
    the source doc (or a hamming-tied earlier twin of it)."""
    from sfcrimedatapipeline_spark.plans import media as media_plans

    rows = media_plans.media_contamination_perceptual(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) >= 10
    by_eval = {r.eval_id: r for r in rows}
    for eval_id, r in by_eval.items():
        src = eval_id - media_plans.MEDIA_EVAL_OFFSET
        assert src % media_plans.MEDIA_EVAL_MOD == 0
        assert r.best_hamming <= 3 and r.n_train_matches >= 1


# ------------------------- VERDICT r9 #9: kcore fixed-round margin
def test_kcore_rounds_dominate_measured_peel_depth(spark):
    """The graph_kcore_dup gate unrolls KCORE_ROUNDS oracle rounds and
    relies on fixed-round == run-to-convergence (idempotent peel).
    That contract holds iff KCORE_ROUNDS >= the dup graph's actual
    peel depth WITH MARGIN. Measure the depth at both gate SFs via
    k_core_peel_depth (which raises if 50 rounds don't converge) and
    assert a >= 2-round margin under KCORE_ROUNDS."""
    from sfcrimedatapipeline_spark.operators.graph import k_core_peel_depth
    from sfcrimedatapipeline_spark.plans import corpus_queries as cq

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        pairs = cq._dup_pairs(spark, sf)
        depth = k_core_peel_depth(pairs, k=cq.KCORE_K, max_iters=50)
        assert depth + 2 <= cq.KCORE_ROUNDS, (
            f"{sf}: measured peel depth {depth} leaves <2 rounds of "
            f"margin under KCORE_ROUNDS={cq.KCORE_ROUNDS} — raise the "
            f"constant (and the oracle unroll) before data grows"
        )


# ---------------------- round-10 self-review: wrapper lifetime chaining
def test_keep_alive_until_released_chains_cache_lifetime(spark):
    """A derived frame built on an unpersist_when_released result
    references the PLAN, not the wrapper — keep_alive_until_released
    must hold the wrapper (and so the caches) until the derived frame
    itself is released (the graph_hits_dup .orderBy chain)."""
    import gc

    from sfcrimedatapipeline_spark.functions.caching import (
        keep_alive_until_released,
        unpersist_when_released,
    )

    cached = spark.range(100).persist()
    cached.count()
    assert cached.storageLevel.useMemory
    wrapper = unpersist_when_released(cached.filter("id >= 0"), cached)
    derived = keep_alive_until_released(wrapper.orderBy("id"), wrapper)
    del wrapper
    gc.collect()
    # the wrapper is held by the derived frame's finalizer closure, so
    # the cache must still be alive and usable
    assert cached.storageLevel.useMemory
    assert derived.count() == 100
    del derived
    gc.collect()
    assert not cached.storageLevel.useMemory  # released with the chain
