"""TPC-H structural suite beyond q1/q3/q9: the decorrelation shapes.

Each query keeps its TPC-H number's STRUCTURE — EXISTS semi-join (q4),
6-way region-constrained join (q5), outer-join count distribution
(q13), correlated scalar average (q17), group-HAVING semi-join (q18),
scalar-subquery + anti-join (q22) — with predicates adapted to the
testdata's columns (no commitdate/receiptdate/phone/container/partsupp;
see TESTDATA.md). These shapes are what Catalyst's subquery
decorrelation, semi/anti-join planning, and scalar-subquery broadcast
exist for; the plans are pinned by tests/test_plan_quality.py.

Money math follows the repo's exact-cents discipline (q1's recipe:
quantize to BIGINT cents per row, sum exactly, divide once at the end)
so every oracle twin hashes bit-identically. Threshold comparisons
against averages are cross-multiplied into integer form
(qty*5*cnt < sum_qty, bal_cents*cnt > sum_cents) — no float division
on the filter path in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.plans.tpch import QueryFn
from sfcrimedatapipeline_spark.sources.tables import read_table


def _cents(col: str) -> "F.Column":
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


def _rev_cents() -> "F.Column":
    return F.floor(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) * 100
        + F.lit(0.5)
    ).cast("long")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: how many orders per priority had at least one
    LATE line (shipped > 60 days after the order date) in 1996Q3.
    The correlated EXISTS decorrelates to a left-semi join whose
    condition spans both sides (equi on orderkey + the date range) —
    the semi side never inflates the order count however many lines
    are late."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").cast("long").alias("order_count"))
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for 1996 orders where the
    supplier and the customer share the nation, region-scoped. The
    region→nation→supplier chain rides broadcasts; the only shuffles
    are lineitem⋈orders (orderkey) and ⋈customer (custkey); the
    same-nation constraint is a post-join filter, not another
    shuffle."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = read_table(spark, sf_dir, "customer")
    li = read_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(_rev_cents()).cast("double") / 100).alias("revenue"))
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers — which is why the outer join must
    be customer LEFT JOIN orders, and why count(o_orderkey) (not
    count(*)) feeds the histogram. Non-urgent orders only. Two
    aggregations: custkey-cardinality, then |distinct counts| rows."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems of one
    brand's small parts whose quantity is below 20% of that part's own
    average. The correlated scalar avg decorrelates into a per-partkey
    aggregate joined back; the 0.2·avg comparison is cross-multiplied
    to integers (qty·5·cnt < sum_qty), so both engines filter
    exactly. Part is pre-filtered and broadcast twice (filter + agg
    side) — the lineitem table shuffles once, on l_partkey."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5)
    )
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty = F.col("l_quantity").cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(qty).alias("__sum_qty"), F.count("*").alias("__cnt")
    )
    small = li.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("__pk")
    ).filter(qty * 5 * F.col("__cnt") < F.col("__sum_qty"))
    return small.agg(
        (F.sum(_cents("l_extendedprice")).cast("double") / 100 / 7.0).alias(
            "avg_yearly"
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed any order totalling more
    than 250 units. The HAVING aggregate becomes a grouped frame used
    as a SEMI side against orders, then customer resolves by a join —
    order count stays exact because the semi never duplicates."""
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("c_custkey").alias("customer_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            F.col("sum_qty"),
        )
    )


def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per market segment, customers with
    above-average balance (scalar subquery over POSITIVE balances
    only) and NO orders since 1998 (anti-join). The scalar average
    rides a 1-row broadcast; the comparison is cross-multiplied to
    cents·count integers; the anti side shuffles on custkey."""
    customer = read_table(spark, sf_dir, "customer")
    stats = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_cents("c_acctbal")).alias("__sum_cents"),
        F.count("*").alias("__cnt"),
    )
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    rich = customer.crossJoin(F.broadcast(stats)).filter(
        _cents("c_acctbal") * F.col("__cnt") > F.col("__sum_cents")
    )
    dormant = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("long").alias("numcust"),
        (F.sum(_cents("c_acctbal")).cast("double") / 100).alias("totacctbal"),
    )


QUERIES: dict[str, QueryFn] = {
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q22_dormant_rich_customers": q22_dormant_rich_customers,
}

ORACLE_SQL: dict[str, str] = {
    "q4_order_priority": """
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
    """,
    "q5_local_supplier_volume": """
        SELECT n.n_name AS nation,
               CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                   * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
                   AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
                       AND c.c_nationkey = s.s_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    "q13_order_count_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey,
                   CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                              AND o.o_orderpriority <> '1-URGENT'
            GROUP BY 1
        )
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY 1
    """,
    "q17_small_quantity_revenue": """
        WITH flt AS (
            SELECT l.*
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = 'Brand#23' AND p.p_size <= 5
        ),
        per_part AS (
            SELECT l_partkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM flt GROUP BY 1
        )
        SELECT CAST(sum(CAST(floor(f.l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100 / 7.0 AS avg_yearly
        FROM flt f JOIN per_part pp ON f.l_partkey = pp.l_partkey
        WHERE CAST(f.l_quantity AS BIGINT) * 5 * pp.cnt < pp.sum_qty
    """,
    "q18_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY 1
            HAVING sum(CAST(l_quantity AS BIGINT)) > 250
        )
        SELECT c.c_name AS customer_name,
               c.c_custkey AS customer_key,
               o.o_orderkey AS order_key,
               CAST(o.o_orderdate AS DATE) AS order_date,
               o.o_totalprice AS total_price,
               b.sum_qty
        FROM orders o
        JOIN big b ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "q22_dormant_rich_customers": """
        WITH stats AS (
            SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM customer WHERE c_acctbal > 0
        ),
        rich AS (
            SELECT c.* FROM customer c, stats
            WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) * stats.cnt
                  > stats.sum_cents
        )
        SELECT c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100 AS totacctbal
        FROM rich r
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = r.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY 1
    """,
}
