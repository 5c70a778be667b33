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


def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge after entity resolution
    (operators/linkage.py:golden_record): one canonical record per
    resolved entity — longest name (lexicographic max on ties), max
    account balance, most frequent market segment (largest on count
    ties), member count. Unmatched records are their own singleton
    entity (canonical = self). Attributes come from the base customer
    row (``rec_id % 1e7`` strips the variant offset), so every variant
    of one customer carries the base's balance/segment and the merge's
    work is the deterministic pick rules, which the hash gate checks
    value-for-value against the oracle's window-ranked picks."""
    from sfcrimedatapipeline_spark.operators.linkage import golden_record

    dirty = _dirty_customers(spark, sf_dir)
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    ent = linkage.resolve_entities(er_customer_pairs(spark, sf_dir))
    enriched = (
        dirty.join(cust, dirty["rec_id"] % 10_000_000 == cust["c_custkey"])
        .join(ent, "rec_id", "left")
        .withColumn("canonical_id", F.coalesce("canonical_id", "rec_id"))
        .select("canonical_id", "name", "acctbal", "segment")
    )
    g = golden_record(
        enriched,
        "canonical_id",
        longest=["name"],
        maxes=["acctbal"],
        modes=["segment"],
    )
    return g.select(
        "canonical_id",
        F.col("name").alias("canonical_name"),
        "n_members",
        F.col("acctbal").alias("acctbal_max"),
        F.col("segment").alias("segment_mode"),
    )


QUERIES: dict[str, QueryFn] = {
    "er_customer_pairs": er_customer_pairs,
    "er_customer_clusters": er_customer_clusters,
    "er_golden_record": er_golden_record,
}


#: shared dirty-records CTEs (base + the three variant classes) —
#: used by the pairs oracle and the golden-record oracle
_DIRTY_CTES = """base AS (
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
    )"""

#: shared dirty-records + scored-pairs SQL (DuckDB list comprehension
#: mirrors char_trigrams' sequence+transform walk)
_ER_PAIRS_SQL = f"""
    WITH {_DIRTY_CTES},
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


_ER_CLUSTERS_SQL = f"""
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
    """

ORACLE_SQL: dict[str, str] = {
    "er_customer_pairs": _ER_PAIRS_SQL,
    "er_customer_clusters": _ER_CLUSTERS_SQL,
    # golden record: window-ranked picks — deliberately a different
    # formulation than the Spark side's max_by-over-struct, so the
    # gate validates the total ordering of every survivorship rule
    "er_golden_record": f"""
        WITH {_DIRTY_CTES},
        ent AS (SELECT * FROM ({_ER_CLUSTERS_SQL}) t),
        enriched AS (
            SELECT coalesce(e.canonical_id, d.rec_id) AS canonical_id,
                   d.name, cu.c_acctbal AS acctbal,
                   cu.c_mktsegment AS segment
            FROM dirty d
            JOIN customer cu ON cu.c_custkey = d.rec_id % 10000000
            LEFT JOIN ent e ON e.rec_id = d.rec_id
        ),
        name_pick AS (
            SELECT canonical_id, name AS canonical_name
            FROM (SELECT canonical_id, name,
                         row_number() OVER (
                             PARTITION BY canonical_id
                             ORDER BY len(name) DESC, name DESC) AS rn
                  FROM enriched) WHERE rn = 1
        ),
        seg_pick AS (
            SELECT canonical_id, segment AS segment_mode
            FROM (SELECT canonical_id, segment,
                         row_number() OVER (
                             PARTITION BY canonical_id
                             ORDER BY c DESC, segment DESC) AS rn
                  FROM (SELECT canonical_id, segment, count(*) AS c
                        FROM enriched GROUP BY 1, 2)) WHERE rn = 1
        ),
        agg AS (
            SELECT canonical_id, count(*) AS n_members,
                   max(acctbal) AS acctbal_max
            FROM enriched GROUP BY 1
        )
        SELECT a.canonical_id, n.canonical_name, a.n_members,
               a.acctbal_max, s.segment_mode
        FROM agg a
        JOIN name_pick n USING (canonical_id)
        JOIN seg_pick s USING (canonical_id)
    """,
}
