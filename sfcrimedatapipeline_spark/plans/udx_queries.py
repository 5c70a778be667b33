"""Driver queries for the user-defined execution surfaces (UDAF/UDTF),
each hash-gated against a pure-SQL DuckDB twin — the gate proves the
custom Python path reproduces the relational semantics exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.sources.tables import read_table


def u1_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: pandas grouped-aggregate UDAF — quantity-weighted mean
    extended price per return flag, exact int-cents accumulation
    (operators/udx.py:weighted_mean_by)."""
    from sfcrimedatapipeline_spark.operators.udx import weighted_mean_by

    li = read_table(spark, sf_dir, "lineitem")
    return weighted_mean_by(
        li, key="l_returnflag", price="l_extendedprice", weight="l_quantity"
    )


def u2_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Python UDTF in a LATERAL join — sentence expansion with
    positions (operators/udx.py:SplitSentences), arrow-optimized.

    The documents view is scoped per-session; registration is
    idempotent so repeated driver calls are safe."""
    from sfcrimedatapipeline_spark.operators.udx import SplitSentences

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("split_sentences", SplitSentences)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("_udx_documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM _udx_documents d, LATERAL split_sentences(d.text) s
        """
    )


def u3_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: vectorized SCALAR pandas UDF (Arrow-batched) — the md5-prefix
    hash per document, integer-exact so the Arrow round trip itself is
    under the value hash (operators/udx.py:md5_prefix_udf)."""
    from sfcrimedatapipeline_spark.operators.udx import md5_prefix_udf

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", md5_prefix_udf()(F.col("text")).alias("text_hash_prefix")
    )


def u4_cogroup_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: two-sided pandas cogroup — per-user click/purchase
    alignment (operators/udx.py:cogroup_click_purchase).

    Run on a deterministic quarter of the users (user_id % 4 = 0,
    mirrored in the oracle): the query certifies the cogroup SURFACE —
    hundreds of groups through the two-sided Arrow path — not Python
    per-group throughput, which the operator docstring already prices
    honestly (~4 ms/group; the relational join form is the production
    shape for THIS metric). Benching all 1500 users spent 6-8 s/rep
    re-measuring that documented constant."""
    from sfcrimedatapipeline_spark.operators.udx import cogroup_click_purchase

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 4 == 0)
    return cogroup_click_purchase(ev)


QUERIES = {
    "u1_udaf_weighted_mean": u1_udaf_weighted_mean,
    "u4_cogroup_alignment": u4_cogroup_alignment,
    "u3_scalar_pandas_udf": u3_scalar_pandas_udf,
    "u2_udtf_sentences": u2_udtf_sentences,
}

ORACLE_SQL = {
    "u1_udaf_weighted_mean": """
        WITH c AS (
            SELECT l_returnflag AS group_key,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
        )
        SELECT group_key,
               count(*) AS n_items,
               CAST(sum(w) AS BIGINT) AS sum_qty,
               (CAST(sum(cents * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE)) / 100.0
                   AS wavg_price
        FROM c GROUP BY 1
    """,
    "u2_udtf_sentences": """
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, '. '), 1) - 1 AS INTEGER)
                   AS sent_idx,
               unnest(string_split(text, '. ')) AS sentence
        FROM documents
    """,
    "u4_cogroup_alignment": """
        WITH c AS (
            SELECT user_id, count(*) AS n_clicks,
                   min(CAST(ts AS TIMESTAMP)) AS first_click
            FROM events WHERE event_type = 'click' AND user_id % 4 = 0
            GROUP BY 1
        ),
        p AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase' AND user_id % 4 = 0
        ),
        pc AS (SELECT user_id, count(*) AS n_purchases FROM p GROUP BY 1),
        pa AS (
            SELECT p.user_id, count(*) AS n_after
            FROM p JOIN c USING (user_id)
            WHERE p.ts > c.first_click
            GROUP BY 1
        )
        SELECT coalesce(c.user_id, pc.user_id) AS user_id,
               CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
               CAST(coalesce(pc.n_purchases, 0) AS BIGINT) AS n_purchases,
               CAST(coalesce(pa.n_after, 0) AS BIGINT)
                   AS n_purchases_after_first_click
        FROM c FULL OUTER JOIN pc ON c.user_id = pc.user_id
        LEFT JOIN pa ON coalesce(c.user_id, pc.user_id) = pa.user_id
    """,
    "u3_scalar_pandas_udf": """
        SELECT doc_id,
               CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)
                   AS text_hash_prefix
        FROM documents
    """,
}


def u5_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: ARROW-OPTIMIZED scalar Python UDF (``@udf(useArrow=True)``)
    — the Spark 3.5+ fourth Python execution surface, distinct from
    the pandas UDF (different serialization contract: per-row Python
    values over Arrow batches, no pandas dependency in the function).
    Integer-exact digit-sum, so the Arrow round trip is fully
    hash-gated. For JVM-expressible logic the built-in functions
    remain the production path — this is the surface-completeness
    harness (same role as u3)."""
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def digit_sum(n: int) -> int:
        if n is None:
            return None
        return sum(int(c) for c in str(abs(n)))

    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        digit_sum(F.col("event_id")).alias("id_digit_sum"),
    )


QUERIES["u5_arrow_python_udf"] = u5_arrow_python_udf

ORACLE_SQL["u5_arrow_python_udf"] = """
    SELECT event_id,
           CAST(list_sum(list_transform(
                    string_split_regex(CAST(event_id AS VARCHAR), ''),
                    c -> CAST(c AS INTEGER))) AS INTEGER) AS id_digit_sum
    FROM events
"""


def u6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: raw-Arrow batch transform (mapInArrow — no pandas
    materialization; operators/udx.py:arrow_batch_cents), completing
    the five-surface Python taxonomy: scalar pandas UDF, grouped UDAF,
    UDTF, cogroup, arrow-optimized @udf, and mapInArrow."""
    from sfcrimedatapipeline_spark.operators.udx import arrow_batch_cents

    return arrow_batch_cents(read_table(spark, sf_dir, "events"))


QUERIES["u6_map_in_arrow"] = u6_map_in_arrow

ORACLE_SQL["u6_map_in_arrow"] = """
    SELECT event_id, CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS cents
    FROM events
"""
