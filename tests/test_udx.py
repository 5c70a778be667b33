"""UDAF/UDTF unit semantics: partitioning-independence of the exact
int-cents accumulation, and UDTF null/empty handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators.udx import SplitSentences, weighted_mean_by


def test_weighted_mean_partitioning_independent(spark):
    rows = [("a", 10.01, 2.0), ("a", 19.99, 3.0), ("b", 5.00, 1.0)]
    df = spark.createDataFrame(rows, "k string, p double, w double")
    one = {r["group_key"]: r.asDict() for r in weighted_mean_by(df, "k", "p", "w").collect()}
    many = {
        r["group_key"]: r.asDict()
        for r in weighted_mean_by(df.repartition(7), "k", "p", "w").collect()
    }
    assert one == many
    # exact: (1001*2 + 1999*3) / 5 / 100
    assert one["a"]["wavg_price"] == ((1001 * 2 + 1999 * 3) / 5) / 100.0
    assert one["a"]["sum_qty"] == 5 and one["a"]["n_items"] == 2


def test_udtf_null_and_empty_text(spark):
    spark.udtf.register("split_sentences_t", SplitSentences)
    df = spark.createDataFrame(
        [(1, "one. two"), (2, ""), (3, None)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("_udx_t")
    out = spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence "
        "FROM _udx_t d, LATERAL split_sentences_t(d.text) s"
    ).collect()
    got = sorted((r["doc_id"], r["sent_idx"], r["sentence"]) for r in out)
    # empty text -> one empty sentence (str.split contract); NULL -> no rows
    assert got == [(1, 0, "one"), (1, 1, "two"), (2, 0, "")]


def test_md5_prefix_udf_null_contract(spark):
    """NULL text -> NULL hash, matching JVM F.md5 and the SQL oracle
    (ADVICE r4: str(None) used to hash the literal 'None')."""
    import hashlib

    from pyspark.sql import functions as F

    from sfcrimedatapipeline_spark.operators.udx import md5_prefix_udf

    df = spark.createDataFrame(
        [(1, "abc"), (2, None)], "id long, text string"
    )
    rows = {
        r["id"]: r["h"]
        for r in df.select(
            "id", md5_prefix_udf()(F.col("text")).alias("h")
        ).collect()
    }
    assert rows[1] == int(hashlib.md5(b"abc").hexdigest()[:8], 16)
    assert rows[2] is None


def test_nfc_normalization_matches_duckdb_on_non_ascii(spark):
    import duckdb

    from sfcrimedatapipeline_spark.operators.udx import with_nfc_normalized

    rows = [
        (1, "café latte"),          # decomposed é → composed
        (2, "café latte"),                 # already NFC: unchanged
        (3, "Å Å"),            # Å (ring) and ANGSTROM SIGN
        (4, "ascii only"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.nfc_text, r.nfc_changed)
        for r in with_nfc_normalized(docs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            "SELECT doc_id, nfc_normalize(text), nfc_normalize(text) <> text FROM d"
        ).fetchall()
    }
    assert got == want
    assert got[1][1] is True and got[2][1] is False and got[5][0] is None
    # composing really happened: both doc 1 and 2 now share one form
    assert got[1][0] == got[2][0]


def test_multilingual_tokens_match_duckdb_on_cjk(spark):
    import duckdb

    from sfcrimedatapipeline_spark.functions.text import CJK_CLASS, tokens_multilingual
    from pyspark.sql import functions as F

    rows = [
        (1, "hello 世界和平 world"),
        (2, "中"),                       # lone CJK char → unigram
        (3, "日本 and 한국어"),          # two runs, mixed scripts
        (4, "ascii only text"),
        (5, "ひらがな"),                 # kana run → 3 bigrams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id", tokens_multilingual(F.col("text")).alias("t")
        ).collect()
    }
    assert got[1] == ["hello", "世界", "界和", "和平", "world"]
    assert got[2] == ["中"]
    assert got[3] == ["日本", "and", "한국", "국어"]
    assert got[5] == ["ひら", "らが", "がな"]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    sql = f"""
        WITH toked AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(
                       lower(regexp_replace(text, '([{CJK_CLASS}])', ' \\1 ', 'g')),
                       '\\s+'), t -> t <> '') AS tk
            FROM d
        )
        SELECT doc_id, flatten([
            CASE
                WHEN regexp_matches(tk[i], '^[{CJK_CLASS}]$')
                     AND coalesce(regexp_matches(tk[i+1], '^[{CJK_CLASS}]$'), FALSE)
                THEN [tk[i] || tk[i+1]]
                WHEN regexp_matches(tk[i], '^[{CJK_CLASS}]$')
                     AND NOT coalesce(CASE WHEN i > 1
                          THEN regexp_matches(tk[i-1], '^[{CJK_CLASS}]$') END, FALSE)
                THEN [tk[i]]
                WHEN NOT regexp_matches(tk[i], '^[{CJK_CLASS}]$')
                THEN [tk[i]]
                ELSE []
            END for i in generate_series(1, len(tk))]) AS toks
        FROM toked
    """
    want = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    assert got == want
