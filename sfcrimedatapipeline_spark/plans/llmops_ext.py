"""Round-5 continuation LLM-pipeline queries: chunk-level corpus
dedup, hashed-feature classifier scoring, exact n-gram
decontamination — each with a DuckDB oracle generated from the same
shared constants (functions/text.py tokenizer, functions/hashing.py
portable 60-bit hash) as the Spark side, so the two engines cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sfcrimedatapipeline_spark.functions.hashing import sql_hash64
from sfcrimedatapipeline_spark.functions.text import SQL_TOKENS, sql_ngrams
from sfcrimedatapipeline_spark.functions.partitioning import ensure_min_partitions
from sfcrimedatapipeline_spark.operators import corpus as corpus_ops
from sfcrimedatapipeline_spark.operators import dedup, textstats
from sfcrimedatapipeline_spark.plans.tpch import QueryFn
from sfcrimedatapipeline_spark.sources.tables import read_table

CHUNK_TOKENS = 8
DECON_NGRAM = 5
#: eval split for the decontamination query: every 10th doc id
DECON_EVAL_MOD = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_min_partitions(read_table(spark, sf_dir, "documents"))


def docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide chunk-level dedup (operators/dedup.py:
    chunk_dedup_corpus) — first occurrence of each 8-token chunk wins,
    cleaned text reassembled in order."""
    return dedup.chunk_dedup_corpus(_docs(spark, sf_dir), chunk_tokens=CHUNK_TOKENS)


def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier scoring (operators/textstats.py:
    with_classifier_score) — broadcast weight table, exact BIGINT
    scores."""
    return textstats.with_classifier_score(_docs(spark, sf_dir))


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram decontamination of the train split (doc_id % 10 != 0)
    against the eval split (doc_id % 10 == 0)."""
    docs = _docs(spark, sf_dir)
    from pyspark.sql import functions as F

    is_eval = F.pmod(F.col("doc_id"), F.lit(DECON_EVAL_MOD)) == 0
    return corpus_ops.decontaminate_exact_ngrams(
        docs.filter(~is_eval), docs.filter(is_eval), n=DECON_NGRAM
    )


QUERIES: dict[str, QueryFn] = {
    "docs_chunk_dedup": docs_chunk_dedup,
    "text_classifier_score": text_classifier_score,
    "docs_decontaminate": docs_decontaminate,
}


def build_oracle_sql() -> dict[str, str]:
    k = CHUNK_TOKENS
    dim = textstats.CLASSIFIER_DIM
    w_hash = sql_hash64("i", f"'{textstats.CLASSIFIER_WEIGHT_SEED}'")
    f_hash = sql_hash64("tok", f"'{textstats.CLASSIFIER_FEATURE_SEED}'")
    return {
        "docs_chunk_dedup": f"""
            WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents),
            tokrows AS (
                SELECT doc_id,
                       CAST(floor((generate_subscripts(tk, 1) - 1) / {k}) AS INT) AS chunk_idx,
                       generate_subscripts(tk, 1) AS ord,
                       unnest(tk) AS tok
                FROM toks
            ),
            chunks AS (
                SELECT doc_id, chunk_idx,
                       string_agg(tok, ' ' ORDER BY ord) AS chunk_text
                FROM tokrows GROUP BY doc_id, chunk_idx
            ),
            ranked AS (
                SELECT doc_id, chunk_idx, chunk_text,
                       row_number() OVER (PARTITION BY md5(chunk_text)
                                          ORDER BY doc_id, chunk_idx) AS rn
                FROM chunks
            ),
            per_doc AS (
                SELECT doc_id,
                       CAST(count(*) AS INTEGER) AS n_chunks,
                       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_dropped,
                       coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END,
                                           ' ' ORDER BY chunk_idx), '') AS clean_text
                FROM ranked GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(p.clean_text, '') AS clean_text,
                   coalesce(p.n_chunks, 0) AS n_chunks,
                   coalesce(p.n_dropped, 0) AS n_dropped
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        "text_classifier_score": f"""
            WITH weights AS (
                SELECT i AS bucket, {w_hash} % 17 - 8 AS weight
                FROM range(0, {dim}) t(i)
            ),
            tok AS (SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents),
            bucketed AS (
                SELECT doc_id, {f_hash} % {dim} AS bucket, count(*) AS n
                FROM tok GROUP BY 1, 2
            ),
            scored AS (
                SELECT doc_id, CAST(sum(n * weight) AS BIGINT) AS clf_score
                FROM bucketed JOIN weights USING (bucket) GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(s.clf_score, 0) AS clf_score,
                   coalesce(s.clf_score, 0) > 0 AS clf_pass
            FROM documents d LEFT JOIN scored s USING (doc_id)
        """,
        "docs_decontaminate": f"""
            WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents),
            eval_g AS (
                SELECT DISTINCT md5(g) AS fp
                FROM (SELECT unnest({sql_ngrams('tk', DECON_NGRAM)}) AS g
                      FROM toks WHERE doc_id % {DECON_EVAL_MOD} = 0)
            ),
            train_g AS (
                SELECT DISTINCT doc_id, md5(g) AS fp
                FROM (SELECT doc_id, unnest({sql_ngrams('tk', DECON_NGRAM)}) AS g
                      FROM toks WHERE doc_id % {DECON_EVAL_MOD} <> 0)
            ),
            hits AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
                FROM train_g WHERE fp IN (SELECT fp FROM eval_g)
                GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(h.n_hit_grams, 0) AS n_hit_grams,
                   coalesce(h.n_hit_grams, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents
                  WHERE doc_id % {DECON_EVAL_MOD} <> 0) d
            LEFT JOIN hits h USING (doc_id)
        """,
    }


ORACLE_SQL = build_oracle_sql()
