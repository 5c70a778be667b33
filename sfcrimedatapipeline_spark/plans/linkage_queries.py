"""Entity-resolution driver queries (operators/linkage.py) with DuckDB
oracles: blocked fuzzy matching over a deterministically dirtied
customer table, then connected-components entity clusters.

The dirty table is derived IN the query (the pagerank_dup_graph
precedent — the synthetic tables have no natural duplicates): every
5th customer gains a case/punctuation variant, every 7th a typo
variant ("Custmer#"), every 11th a DECOY that shares the block key but
is a different entity. A correct linker must match the first two
classes to their base record, chain base↔case↔typo triangles into one
entity each, and reject the decoys plus the ~30 cross-customer block
collisions — all of which the hash gate checks row-for-row.

Oracle-exactness: the score is the rational
``0.5*n_inter/n_union + 0.5*same_digits`` evaluated with the same
association on both engines; trigram sets are built by the same
substring walk (list comprehension in DuckDB, sequence+transform in
Spark); the cluster map is gated by the same recursive-CTE transitive
closure as dedup_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.functions.partitioning import ensure_min_partitions
from sfcrimedatapipeline_spark.operators import linkage
from sfcrimedatapipeline_spark.plans.tpch import QueryFn
from sfcrimedatapipeline_spark.sources.tables import read_table

ER_THRESHOLD = 0.6


def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer + deterministic variants: case (id+1e7, every 5th),
    typo (id+2e7, every 7th), decoy (id+3e7, every 11th — same block,
    different entity)."""
    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
    )
    case_v = base.filter(F.col("rec_id") % 5 == 0).select(
        (F.col("rec_id") + 10_000_000).alias("rec_id"),
        F.lower(F.replace("name", F.lit("#"), F.lit(" "))).alias("name"),
        "nation",
    )
    typo_v = base.filter(F.col("rec_id") % 7 == 0).select(
        (F.col("rec_id") + 20_000_000).alias("rec_id"),
        F.replace("name", F.lit("Customer#"), F.lit("Custmer#")).alias("name"),
        "nation",
    )
    decoy = base.filter(F.col("rec_id") % 11 == 0).select(
        (F.col("rec_id") + 30_000_000).alias("rec_id"),
        F.concat(
            F.lit("Vendor "),
            F.substring(F.regexp_extract("name", "([0-9]+)", 1), -3, 3),
        ).alias("name"),
        "nation",
    )
    return ensure_min_partitions(
        base.unionByName(case_v).unionByName(typo_v).unionByName(decoy)
    )


def er_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched record pairs at score >= 0.6
    (operators/linkage.py:link_records): blocked on
    (nation, last-3-of-digits), scored by trigram-Jaccard + exact
    digit agreement."""
    return linkage.link_records(
        _dirty_customers(spark, sf_dir),
        block_cols=["nation"],
        threshold=ER_THRESHOLD,
    )


def er_customer_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched pairs → entity map (rec_id, canonical_id) via connected
    components (operators/linkage.py:resolve_entities) — base, case
    and typo variants of one customer collapse to the base id."""
    matches = er_customer_pairs(spark, sf_dir)
    return linkage.resolve_entities(matches).orderBy("rec_id")


QUERIES: dict[str, QueryFn] = {
    "er_customer_pairs": er_customer_pairs,
    "er_customer_clusters": er_customer_clusters,
}


#: shared dirty-records + scored-pairs SQL (DuckDB list comprehension
#: mirrors char_trigrams' sequence+transform walk)
_ER_PAIRS_SQL = f"""
    WITH base AS (
        SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nation
        FROM customer
    ),
    dirty AS (
        SELECT rec_id, name, nation FROM base
        UNION ALL
        SELECT rec_id + 10000000, lower(replace(name, '#', ' ')), nation
        FROM base WHERE rec_id % 5 = 0
        UNION ALL
        SELECT rec_id + 20000000, replace(name, 'Customer#', 'Custmer#'),
               nation
        FROM base WHERE rec_id % 7 = 0
        UNION ALL
        SELECT rec_id + 30000000,
               'Vendor ' || right(regexp_extract(name, '([0-9]+)', 1), 3),
               nation
        FROM base WHERE rec_id % 11 = 0
    ),
    recs AS (
        SELECT rec_id, nation,
               trim(regexp_replace(lower(name), '\\s+', ' ', 'g')) AS nm,
               regexp_extract(name, '([0-9]+)', 1) AS digits
        FROM dirty
    ),
    feat AS (
        SELECT rec_id, nation, digits,
               right(digits, 3) AS blk3,
               CASE WHEN len(nm) >= 3
                    THEN list_distinct([substr(nm, i, 3)
                         FOR i IN generate_series(1, len(nm) - 2)])
                    ELSE [] END AS tg
        FROM recs
    ),
    scored AS (
        SELECT a.rec_id AS id_a, b.rec_id AS id_b,
               CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) AS n_inter,
               CAST(len(list_distinct(a.tg || b.tg)) AS BIGINT) AS n_union,
               CAST(CASE WHEN a.digits = b.digits THEN 1 ELSE 0 END
                    AS INTEGER) AS same_digits
        FROM feat a
        JOIN feat b ON a.nation = b.nation AND a.blk3 = b.blk3
                   AND a.rec_id < b.rec_id
    )
    SELECT *,
           0.5 * n_inter / n_union + 0.5 * same_digits AS score
    FROM scored
    WHERE 0.5 * n_inter / n_union + 0.5 * same_digits >= {ER_THRESHOLD}
"""


ORACLE_SQL: dict[str, str] = {
    "er_customer_pairs": _ER_PAIRS_SQL,
    "er_customer_clusters": f"""
        WITH RECURSIVE m AS (
            SELECT id_a, id_b FROM ({_ER_PAIRS_SQL}) p
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM m
            UNION ALL
            SELECT id_b, id_a FROM m
        ),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        reach(id, r) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
        )
        SELECT CAST(id AS BIGINT) AS rec_id,
               CAST(min(r) AS BIGINT) AS canonical_id
        FROM reach GROUP BY id
        ORDER BY rec_id
    """,
}
