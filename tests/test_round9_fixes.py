"""Round-9 regression tests: the five r8 ADVICE defects (VERDICT r8
What's-wrong #1 — each fix gets a pinning test here), the r9 ADVICE
items (bench_diff swing reclassification, versioned total-scan bound,
jsonl journal recovery, _DUP_MEMO eviction, var=0 correlation guard),
the small-corpus LSH cardinality guard (VERDICT r8 #4), and the
watermarked streaming-DAU eviction semantics (VERDICT r8 #3)."""

from __future__ import annotations

import builtins
import importlib.util
import json
import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(name: str, rel_path: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, rel_path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- r8 (c)
def test_current_round_tolerates_non_dict_progress_lines(monkeypatch, tmp_path):
    """__spark_entry__._current_round: a parseable non-dict line (bare
    number / string / array) in PROGRESS.jsonl must be skipped, never
    raise AttributeError — queries() must not fail on an I/O edge."""
    entry = _load_module("entry_under_test", "__spark_entry__.py")
    fake = tmp_path / "PROGRESS.jsonl"
    fake.write_text('42\n"a string"\n[1, 2]\nnull\n{"round": 7}\ntrue\n')
    real_open = builtins.open

    def redirect(path, *a, **k):
        if isinstance(path, str) and path.endswith("PROGRESS.jsonl"):
            return real_open(str(fake), *a, **k)
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", redirect)
    monkeypatch.setattr(entry, "_ROUND_SNAPSHOT", None)
    # the last parseable DICT line wins; the trailing `true` is skipped
    assert entry._current_round() == 7


# ---------------------------------------------------------------- r8 (a)
def test_assoc_rules_oracles_interpolate_min_support():
    """Every basket-support HAVING clause in sql_surface.py must be
    interpolated from BASKET_MIN_SUPPORT, never a literal — a constant
    change that diverges Spark from the oracle is a gate time bomb."""
    import inspect
    import re

    from sfcrimedatapipeline_spark.plans import sql_surface

    src = inspect.getsource(sql_surface)
    for m in re.finditer(r"HAVING count\(\*\) >= ([^\s]+)", src):
        assert "BASKET_MIN_SUPPORT" in m.group(1), (
            f"hardcoded basket support in oracle SQL: {m.group(0)!r}"
        )
    # and the rendered oracle carries the current constant
    assert (
        f">= {sql_surface.BASKET_MIN_SUPPORT}"
        in sql_surface.ORACLE_SQL["orders_assoc_rules"]
    )


# ---------------------------------------------------------------- r8 (d)
def test_auto_lsh_clamp_warns_with_achieved_recall():
    """auto_lsh_config / bands_for_planes: when max_bands binds, the
    recall target is NOT met and a UserWarning must say so (the
    no-silent-caps discipline) — silent clamping hid it pre-r8."""
    from sfcrimedatapipeline_spark.operators.dedup import (
        auto_lsh_config,
        bands_for_planes,
    )

    # θ=0.5 needs exponentially many bands at p=8: the clamp binds
    with pytest.warns(UserWarning, match="achieved recall"):
        bands = bands_for_planes(8, threshold=0.5, recall_target=0.95, max_bands=4)
    assert bands == 4
    with pytest.warns(UserWarning, match="max_bands"):
        auto_lsh_config(10_000_000, threshold=0.5, max_bands=8)
    # the dedup-grade regime stays unclamped and quiet
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        b, p = auto_lsh_config(100_000, threshold=0.98)
    assert b >= 1 and p >= 1


# ------------------------------------------------------------ VERDICT #4
def test_smallcorpus_lsh_guard_fires_above_bound(spark):
    """embedding_near_duplicates_lsh (the fixed-config SMALL-CORPUS
    variant) is n²/B within buckets: pointing it at a corpus above
    max_corpus_rows must raise, naming the auto entry point; below the
    bound (and with the explicit None opt-out) it runs unchanged."""
    from sfcrimedatapipeline_spark.operators import dedup

    rows = [(i, [float((i * 7 + d) % 5) for d in range(4)]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="lsh_auto"):
        dedup.embedding_near_duplicates_lsh(
            emb, dim=4, max_corpus_rows=3
        )
    # below the bound: runs; explicit opt-out: runs without counting
    dedup.embedding_near_duplicates_lsh(emb, dim=4, max_corpus_rows=10).count()
    dedup.embedding_near_duplicates_lsh(emb, dim=4, max_corpus_rows=None).count()


# ---------------------------------------------------------------- r8 (b)
def test_versioned_replay_skips_despite_many_other_writers(spark, tmp_path, monkeypatch):
    """Exactly-once across other-writer floods: after the sink commits
    batch 0, MORE manifests than the fallback scan will ever read land
    from other writers; a fresh-checkpoint replay of batch 0 must still
    be skipped — the per-query sidecar index resolves it in O(1)."""
    import sfcrimedatapipeline_spark.sources.versioned as V

    monkeypatch.setattr(V, "REPLAY_WINDOW", 2)
    monkeypatch.setattr(V, "TOTAL_SCAN_CAP", 4)

    def _df(rng):
        return spark.createDataFrame([(i, f"s{i}") for i in rng], "id long, s string")

    table = str(tmp_path / "table")
    src = tmp_path / "src"
    src.mkdir()
    _df(range(4)).coalesce(1).write.parquet(str(src / "a"))
    for f in (src / "a").glob("*.parquet"):
        f.rename(src / f"a_{f.name}")

    def stream():
        return (
            spark.readStream.schema("id long, s string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    q = V.versioned_stream_sink(
        stream(), table, checkpoint_dir=str(tmp_path / "ck1"), query_name="qa"
    )
    q.awaitTermination(120)
    assert len(V.history(table)) == 1
    # flood: 6 other-writer commits (> TOTAL_SCAN_CAP) bury qa's manifest
    for i in range(6):
        V.append_version(_df(range(2)), table, note=f"other {i}")
    # fresh checkpoint => Spark re-delivers batch 0; must NOT double-append
    q = V.versioned_stream_sink(
        stream(), table, checkpoint_dir=str(tmp_path / "ck2"), query_name="qa"
    )
    q.awaitTermination(120)
    assert len(V.history(table)) == 7  # 1 stream + 6 manual, no duplicate

    # pre-index table (sidecar removed): the capped scan can no longer
    # prove the replay — it must WARN (never silently double-append)
    for name in os.listdir(os.path.join(table, V._MANIFESTS)):
        if name.startswith("_last_batch."):
            os.remove(os.path.join(table, V._MANIFESTS, name))
    with pytest.warns(UserWarning, match="capped"):
        q = V.versioned_stream_sink(
            stream(), table, checkpoint_dir=str(tmp_path / "ck3"), query_name="qa"
        )
        q.awaitTermination(120)


# ---------------------------------------------------------------- r8 (e)
def test_jsonl_corrupt_success_recovers_via_journal(spark, tmp_path):
    """Append onto a table whose _SUCCESS was corrupted: the commit
    must WARN, rebuild prior totals from the per-file journal
    (_SUCCESS.files — O(#files), not O(rows)), and produce exact
    totals."""
    from sfcrimedatapipeline_spark.sources.jsonl import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "t")
    df1 = spark.range(7).selectExpr("id", "CAST(id AS STRING) AS s")
    df1.coalesce(2).write.format("jsonlsink").option("path", out).mode(
        "overwrite"
    ).save()
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert json.load(fh)["rows"] == 7
    journal = os.path.join(out, "_SUCCESS.files")
    assert os.path.exists(journal)
    with open(os.path.join(out, "_SUCCESS"), "w") as fh:
        fh.write("{corrupt json")
    df2 = spark.range(100, 105).selectExpr("id", "CAST(id AS STRING) AS s")
    # the recovery UserWarning is emitted inside the data-source COMMIT
    # python worker (a separate process — it lands on the worker's
    # stderr/log, not in this process's warning filters), so the test
    # pins the observable recovery RESULT: exact totals via the journal
    df2.coalesce(1).write.format("jsonlsink").option("path", out).mode(
        "append"
    ).save()
    with open(os.path.join(out, "_SUCCESS")) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 12
    assert manifest["files"] == 3
    # the journal now records every committed part with its row count
    with open(journal) as fh:
        recs = [json.loads(line) for line in fh]
    assert sum(r["rows"] for r in recs) == 12
    assert len(recs) == 3


# --------------------------------------------------------------- ADVICE 4
def test_dup_memo_evicts_stale_session_entries(spark):
    """_DUP_MEMO hygiene: rebuilding for a new session must unpersist
    and drop EVERY stale-session entry (any sf_dir), not overwrite one
    key in place — cycling sessions must not leak persisted frames."""
    from types import SimpleNamespace

    from sfcrimedatapipeline_spark.plans import corpus_queries as cq

    calls = []
    fake_pairs = SimpleNamespace(unpersist=lambda: calls.append("unpersisted"))
    dead_session = object()
    # the sweep runs on REBUILD, not on a memo hit — drop any live
    # entry another test may have left so _dup_pairs actually rebuilds
    cq._DUP_MEMO.pop("/root/testdata/sf0.001", None)
    cq._DUP_MEMO["__stale_dir__"] = (dead_session, fake_pairs, None)
    try:
        cq._dup_pairs(spark, "/root/testdata/sf0.001")
        assert "__stale_dir__" not in cq._DUP_MEMO
        assert calls == ["unpersisted"]
        assert "/root/testdata/sf0.001" in cq._DUP_MEMO
    finally:
        cq._DUP_MEMO.pop("__stale_dir__", None)


# --------------------------------------------------------------- ADVICE 1
def test_bench_diff_old_reading_below_band_is_not_a_swing(tmp_path, monkeypatch, capsys):
    """bench_diff swing reclassification requires the PAIR to straddle
    the isolated steady state: a memoized old reading far below the
    band must NOT excuse a multi-x new reading that still fits under
    the band (ADVICE r9 #1)."""
    bd = _load_module("bench_diff_under_test", "tools/bench_diff.py")
    monkeypatch.setattr(bd, "load_isolated", lambda: {"qmemo": 5.0, "qswing": 5.0})

    def write(path, queries):
        path.write_text(json.dumps({"metric": "x", "queries": queries}))
        return str(path)

    # memoized old (0.5s << band floor ~3.55s) -> REGRESSION, exit 1
    old = write(tmp_path / "old.json", {"qmemo": 0.5, "qswing": 4.0})
    new = write(tmp_path / "new.json", {"qmemo": 5.2, "qswing": 6.6})
    monkeypatch.setattr(
        "sys.argv", ["bench_diff.py", old, new]
    )
    rc = bd.main()
    out = capsys.readouterr().out
    assert rc == 1
    assert "REGRESSION qmemo" in out and "below the isolated band" in out
    # the true swing (old 4.0 and new 6.6 both near the 5.0 median) is
    # still auto-reclassified
    assert "swing qswing" in out


# --------------------------------------------------------------- ADVICE 5
def test_quality_dup_correlation_null_on_zero_variance(spark, tmp_path):
    """Degenerate corpus where every quality score is equal: var = 0.
    Spark's Divide yields NULL, DuckDB ±inf/NaN — both engines must now
    return NULL via the shared var > 0 guard (ADVICE r9 #5)."""
    import duckdb

    from sfcrimedatapipeline_spark.plans.corpus_queries import (
        ORACLE_SQL,
        corpus_quality_dup_correlation,
    )

    # 8 identical docs (a dup cluster) + 1 unique doc with the SAME
    # token count and token lengths => identical quality score, var 0,
    # and 0 < n_dup < n so only the variance guard can fire
    rows = [(i, "qqq www eee rrr", "en", "src0", 15) for i in range(8)]
    rows.append((8, "zzz xxx ccc vvv", "en", "src0", 15))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "sfdeg")
    os.makedirs(sf_dir)
    docs.coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    row = corpus_quality_dup_correlation(spark, sf_dir).collect()[0]
    assert 0 < row.n_dup < row.n
    assert row.r_pointbiserial is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}/*.parquet'"
    )
    oracle = con.execute(ORACLE_SQL["corpus_quality_dup_correlation"]).fetchone()
    assert oracle[1] > 0 and oracle[1] < oracle[0]
    assert oracle[4] is None


# ------------------------------------------------------------ VERDICT #3
def test_wm_dau_overcounts_after_eviction(spark, tmp_path):
    """events_dau_stream_wm's state contract: a (user, day) duplicate
    arriving within the watermark delay is dropped; once the watermark
    passes the entry's expiration the key re-emits and the day's DAU
    overcounts — time-bounded state trades exactly-once per corpus for
    bounded memory (the dedup_exact_stream_wm eviction precedent,
    applied to the DAU dedup keys)."""
    import datetime as dt
    import shutil

    from sfcrimedatapipeline_spark.streaming.events import run_stream_to_memory

    t0 = dt.datetime(2024, 1, 1)
    # watermark lags one batch, so eviction needs a follow-up batch
    batches = [
        [(1, t0)],                                   # user 1 day 1: emit
        [(1, t0 + dt.timedelta(minutes=10))],        # in horizon: drop
        [(2, t0 + dt.timedelta(hours=5))],           # advances watermark
        [(3, t0 + dt.timedelta(hours=5, minutes=30))],  # wm 4h30: evicts u1
        [(1, t0 + dt.timedelta(hours=6))],           # re-emit: DAU double-counts
    ]
    ddl = "user_id long, ts timestamp"
    watch = tmp_path / "watch"
    watch.mkdir()
    base_t = 1_700_000_000
    for i, rows in enumerate(batches):
        part = tmp_path / f"part{i}"
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        [src] = [f for f in os.listdir(part) if f.endswith(".parquet")]
        dest = watch / f"part-{i}.parquet"
        shutil.copy(part / src, dest)
        os.utime(dest, (base_t + i * 10, base_t + i * 10))

    def transform(stream):
        return (
            stream.withWatermark("ts", "1 hour")
            .select("user_id", F.to_date("ts").alias("day"), "ts")
            .dropDuplicatesWithinWatermark(["user_id", "day"])
            .select("user_id", "day")
        )

    deduped = run_stream_to_memory(
        spark,
        str(watch),
        transform,
        query_name="wm_dau_eviction",
        output_mode="append",
        schema=ddl,
    )
    dau = {
        r.day.isoformat(): r.dau
        for r in deduped.groupBy("day")
        .agg(F.count("*").cast("long").alias("dau"))
        .collect()
    }
    # 3 distinct users, but user 1's evicted entry re-emitted: DAU = 4
    assert dau == {"2024-01-01": 4}


# ------------------------------------------------------------ VERDICT #8
def test_embedding_contamination_lsh_is_cross_only(spark):
    """The semantic-contamination operator pairs eval items with TRAIN
    near-duplicates only: two identical EVAL vectors must not pair with
    each other, and an uncontaminated eval vector stays absent."""
    from sfcrimedatapipeline_spark.operators import dedup

    def vec(seed: int) -> list[float]:
        return [float((seed * 31 + d * 7) % 13 - 6) for d in range(8)]

    train = spark.createDataFrame(
        [(0, vec(1)), (1, vec(2)), (2, vec(3))],
        "vec_id long, embedding array<float>",
    )
    evals = spark.createDataFrame(
        [
            (100, vec(1)),   # contaminated: identical to train 0
            (101, vec(99)),  # clean
            (102, vec(99)),  # identical to eval 101 — must NOT pair
        ],
        "vec_id long, embedding array<float>",
    )
    rows = dedup.embedding_contamination_lsh(
        evals, train, threshold=0.99, dim=8
    ).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(0, 100)}
    assert rows[0].cosine == 1.0


# ------------------------------------------------------------- round 9c
def test_trained_ivf_centroids_memo_free_and_deterministic(spark):
    """OPTIMIZATION r13: the r9 _KMEANS_MEMO is retired — the trained
    IVF centroids are re-trained on EVERY call (symmetric timing
    contract with ann_pq_topk_trained; the bench may never serve a
    module-level result memo keyed on the test data). Two calls return
    EQUAL centroids (the trainer is bit-deterministic) but distinct
    objects (no memo hit), in the cosine_topk_ivf input shape."""
    from sfcrimedatapipeline_spark.plans import llmops

    assert not hasattr(llmops, "_KMEANS_MEMO")  # memo really gone
    t1 = llmops._trained_ivf_centroids(spark, "/root/testdata/sf0.001")
    assert len(t1) == llmops.ANN_IVF_CENTROIDS
    cid, vec = t1[0]
    assert isinstance(cid, int) and len(vec) == 64
    t2 = llmops._trained_ivf_centroids(spark, "/root/testdata/sf0.001")
    assert t2 is not t1  # retrained, not memo-served
    assert t2 == t1  # same data → same deterministic centroids


def test_ivf_assign_keep_cos_contract(spark):
    """ivf_assign(keep_cos=True) must expose the per-rank raw cosine
    the audits consume: ranks are 1..limit per vector, cosines
    non-increasing by rank, and the rank-1 centroid equals the
    keep_cos=False argmax path (the two code branches cannot drift)."""
    from sfcrimedatapipeline_spark.operators.similarity import ivf_assign

    vecs = [
        (i, [float((i * 7 + j * 3) % 5 - 2) for j in range(64)])
        for i in range(20)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = [(k, [float((k + 1) * (j % 3) - 1) for j in range(64)]) for k in range(4)]

    top2 = ivf_assign(df, cents, "vid", 2, keep_cos=True).collect()
    by_vid = {}
    for r in top2:
        by_vid.setdefault(r.vid, {})[r["__r"]] = r
    argmax = {
        r.vid: r.centroid_id
        for r in ivf_assign(df, cents, "vid", 1).collect()
    }
    for vid, ranks in by_vid.items():
        assert set(ranks) == {1, 2}
        assert ranks[1]["__ccos"] >= ranks[2]["__ccos"]
        assert ranks[1].centroid_id == argmax[vid]
