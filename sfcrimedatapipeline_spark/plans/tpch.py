"""Driver-harness queries: SURVEY §2's operator inventory re-targeted at
the driver's TPC-H-ish test tables (TESTDATA.md), each paired with a
DuckDB oracle (ORACLE_SQL) for the hash-compare correctness gate.

Conventions shared by both sides (critical for the value-hash match):
- every computed column is aliased identically in Spark and SQL;
- money aggregates are computed in DECIMAL(18,2) (exact, order-
  independent) — summing raw doubles would make the hash depend on
  Spark's nondeterministic reduction order;
- ``row_number``/``year`` outputs are cast to INT on both sides
  (DuckDB's default is BIGINT, Spark's is INT).

Reference-op provenance is cited per query (file:line into
/root/reference/dags/ELT.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators.keys import dense_ids
from sfcrimedatapipeline_spark.sources.tables import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_DEC = "decimal(18,2)"


# --- scans & projections (S-, P-series) ------------------------------------

def p1_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 column projection + aliasing (dags/ELT.py:194-196 et al.)."""
    return read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
    )


def p2_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 NULL-defaulting CASE (dags/ELT.py:237-240): coalesce over a
    synthesized-NULL column (the test tables have no native NULLs)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("click")), F.lit("none")).alias(
            "event_kind"
        ),
    )


def p3_cast_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 timestamp→date cast used as a key expression (dags/ELT.py:281)."""
    return read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


def p4_cast_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 timestamp→time cast (dags/ELT.py:282) — the engine's TIME
    representation is the unpadded-hour "H:mm:ss" string (SURVEY §1.2)."""
    return read_table(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.date_format(F.col("ts"), "H:mm:ss").alias("event_time"),
    )


def p5_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 IN-list filter (dags/ELT.py:328)."""
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
    )


# --- aggregations / dedup (A-series) ---------------------------------------

def a1_distinct_2col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 two-column DISTINCT (dags/ELT.py:198-199)."""
    return (
        read_table(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nation_key"),
            F.col("c_mktsegment").alias("market_segment"),
        )
        .distinct()
    )


def a2_distinct_3col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 three-column DISTINCT (dags/ELT.py:217-218)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .distinct()
    )


def a3_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 month-bucket rollup (pandas ``dt.to_period("M")``,
    dags/ELT.py:331-333) as date_format + groupBy."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("year_month"))
        .agg(
            F.count("*").alias("n_orders"),
            # pin the sum's widened result type (decimal(28,2)) back to
            # decimal(18,2) — the driver's hash is type-sensitive and
            # DuckDB widens to DECIMAL(38,2) instead (VERDICT r1 #1)
            F.sum(F.col("o_totalprice").cast(_DEC)).cast(_DEC).alias("total_price"),
        )
    )


# --- joins (J-series) ------------------------------------------------------

def j1_left_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 LEFT join fact←dimension, single key, broadcast
    (dags/ELT.py:279)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
    ).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
    )


def j3_dim_aliased_twice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 same dimension joined twice under different aliases
    (dags/ELT.py:279+281: DimDate as d1 and d2). Here: nation reached
    via the customer side and via the supplier side of lineitem."""
    li = read_table(spark, sf_dir, "lineitem").alias("li")
    orders = read_table(spark, sf_dir, "orders").alias("o")
    customer = F.broadcast(read_table(spark, sf_dir, "customer").alias("c"))
    supplier = F.broadcast(read_table(spark, sf_dir, "supplier").alias("s"))
    nation = read_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.alias("n1"))
    n2 = F.broadcast(nation.alias("n2"))
    return (
        li.join(orders, F.col("li.l_orderkey") == F.col("o.o_orderkey"), "left")
        .join(customer, F.col("o.o_custkey") == F.col("c.c_custkey"), "left")
        .join(n1, F.col("c.c_nationkey") == F.col("n1.n_nationkey"), "left")
        .join(supplier, F.col("li.l_suppkey") == F.col("s.s_suppkey"), "left")
        .join(n2, F.col("s.s_nationkey") == F.col("n2.n_nationkey"), "left")
        .select(
            F.col("li.l_orderkey").alias("order_key"),
            F.col("li.l_linenumber").alias("line_number"),
            F.col("n1.n_name").alias("cust_nation"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )


def j5_composite_null_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 composite-key LEFT join with NULL keys never matching
    (dags/ELT.py:283-285) + W1 surrogate numbering of the dim. NULLs are
    synthesized with nullif since the test tables are NULL-free; plain
    ``==`` (not eqNullSafe) reproduces SQL `=` semantics."""
    li = read_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.nullif(F.col("l_returnflag"), F.lit("R")).alias("rf"),
        F.col("l_linestatus").alias("ls"),
    )
    dim = s.select("rf", "ls").distinct()
    w = Window.orderBy(F.asc_nulls_last("rf"), F.asc_nulls_last("ls"))
    dim = dim.select(F.row_number().over(w).cast("int").alias("dim_id"), "rf", "ls")
    joined = s.alias("s").join(
        F.broadcast(dim.alias("d")),
        (F.col("s.rf") == F.col("d.rf")) & (F.col("s.ls") == F.col("d.ls")),
        "left",
    )
    return joined.select("s.order_key", "s.line_number", F.col("d.dim_id").alias("dim_id"))


def j8_star_join_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 star join + P5 IN-filter + A3 month rollup — the flagship,
    shaped like the serve query (dags/ELT.py:308-333) over TPC-H tables.
    Dims broadcast; the lineitem side never shuffles for the joins (one
    exchange total, for the final groupBy)."""
    li = read_table(spark, sf_dir, "lineitem").alias("li")
    orders = read_table(spark, sf_dir, "orders").alias("o")
    customer = F.broadcast(read_table(spark, sf_dir, "customer").alias("c"))
    nation = F.broadcast(read_table(spark, sf_dir, "nation").alias("n"))
    region = F.broadcast(read_table(spark, sf_dir, "region").alias("r"))
    return (
        li.join(orders, F.col("li.l_orderkey") == F.col("o.o_orderkey"))
        .join(customer, F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(nation, F.col("c.c_nationkey") == F.col("n.n_nationkey"))
        .join(region, F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .filter(
            F.col("o.o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("r.r_name") == "ASIA")
        )
        .groupBy(
            F.col("n.n_name").alias("nation"),
            F.date_format("o.o_orderdate", "yyyy-MM").alias("year_month"),
        )
        .agg(
            F.count("*").alias("n_items"),
            # sum_qty pinned to decimal(18,2) (type-sensitive hash);
            # revenue's product type decimal(38,4) already agrees with
            # DuckDB so it stays unpinned
            F.sum(F.col("li.l_quantity").cast(_DEC)).cast(_DEC).alias("sum_qty"),
            F.sum(
                F.col("li.l_extendedprice").cast(_DEC)
                * (F.lit(1).cast(_DEC) - F.col("li.l_discount").cast(_DEC))
            ).alias("revenue"),
        )
    )


# --- windows (W-series) ----------------------------------------------------

def w1_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 dedup + partition-less ROW_NUMBER with Postgres NULLS-LAST
    ordering (dags/ELT.py:194; SURVEY §7.4.2)."""
    dim = (
        read_table(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nation_key"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("market_segment"),
        )
        .distinct()
    )
    w = Window.orderBy(F.asc_nulls_last("nation_key"), F.asc_nulls_last("market_segment"))
    return dim.select(
        F.row_number().over(w).cast("int").alias("location_id"),
        "nation_key",
        "market_segment",
    )


def w2_load_order_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 SERIAL load-order id (dags/ELT.py:100) via the scale-safe
    two-phase dense_ids operator — no single-partition exchange. Order
    is pinned to o_orderkey because parquet split order is not load
    order (SURVEY §7.4.1)."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key")
    )
    return dense_ids(orders, ["order_key"], "id")


#: DuckDB oracle for every query above — identical aliases, identical
#: decimal arithmetic. Views are pre-registered by the driver.
ORACLE_SQL: dict[str, str] = {
    "p1_project_alias": """
        SELECT c_custkey AS customer_id, c_name AS customer_name,
               c_mktsegment AS market_segment
        FROM customer
    """,
    "p2_null_default": """
        SELECT event_id,
               coalesce(nullif(event_type, 'click'), 'none') AS event_kind
        FROM events
    """,
    "p3_cast_date": """
        SELECT o_orderkey AS order_key, CAST(o_orderdate AS DATE) AS order_date
        FROM orders
    """,
    "p4_cast_time": """
        SELECT event_id,
               CAST(hour(ts) AS VARCHAR) || ':' ||
               lpad(CAST(minute(ts) AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(second(ts) AS VARCHAR), 2, '0') AS event_time
        FROM events
    """,
    "p5_in_filter": """
        SELECT o_orderkey AS order_key, o_orderpriority AS priority,
               o_orderstatus AS status
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    "a1_distinct_2col": """
        SELECT DISTINCT c_nationkey AS nation_key, c_mktsegment AS market_segment
        FROM customer
    """,
    "a2_distinct_3col": """
        SELECT DISTINCT l_returnflag AS return_flag, l_linestatus AS line_status,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year
        FROM lineitem
    """,
    "a3_month_rollup": """
        SELECT strftime(o_orderdate, '%Y-%m') AS year_month,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_price
        FROM orders
        GROUP BY 1
    """,
    "j1_left_join_dim": """
        SELECT o_orderkey AS order_key, c_name AS customer_name,
               c_mktsegment AS market_segment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    "j3_dim_aliased_twice": """
        SELECT li.l_orderkey AS order_key, li.l_linenumber AS line_number,
               n1.n_name AS cust_nation, n2.n_name AS supp_nation
        FROM lineitem li
        LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        LEFT JOIN supplier s ON li.l_suppkey = s.s_suppkey
        LEFT JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    """,
    "j5_composite_null_keys": """
        WITH s AS (
            SELECT l_orderkey AS order_key, l_linenumber AS line_number,
                   nullif(l_returnflag, 'R') AS rf, l_linestatus AS ls
            FROM lineitem
        ),
        d AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY rf ASC NULLS LAST, ls ASC NULLS LAST) AS INTEGER) AS dim_id,
                   rf, ls
            FROM (SELECT DISTINCT rf, ls FROM s) t
        )
        SELECT s.order_key, s.line_number, d.dim_id AS dim_id
        FROM s LEFT JOIN d ON s.rf = d.rf AND s.ls = d.ls
    """,
    "j8_star_join_monthly": """
        SELECT n.n_name AS nation,
               strftime(o.o_orderdate, '%Y-%m') AS year_month,
               count(*) AS n_items,
               CAST(sum(CAST(li.l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
               sum(CAST(li.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(li.l_discount AS DECIMAL(18,2)))) AS revenue
        FROM lineitem li
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH') AND r.r_name = 'ASIA'
        GROUP BY 1, 2
    """,
    "w1_surrogate_key": """
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY nation_key ASC NULLS LAST,
                                       market_segment ASC NULLS LAST) AS INTEGER) AS location_id,
               nation_key, market_segment
        FROM (
            SELECT DISTINCT c_nationkey AS nation_key,
                   nullif(c_mktsegment, 'BUILDING') AS market_segment
            FROM customer
        ) t
    """,
    "w2_load_order_id": """
        SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS id,
               o_orderkey AS order_key
        FROM orders
    """,
}


QUERIES: dict[str, QueryFn] = {
    "p1_project_alias": p1_project_alias,
    "p2_null_default": p2_null_default,
    "p3_cast_date": p3_cast_date,
    "p4_cast_time": p4_cast_time,
    "p5_in_filter": p5_in_filter,
    "a1_distinct_2col": a1_distinct_2col,
    "a2_distinct_3col": a2_distinct_3col,
    "a3_month_rollup": a3_month_rollup,
    "j1_left_join_dim": j1_left_join_dim,
    "j3_dim_aliased_twice": j3_dim_aliased_twice,
    "j5_composite_null_keys": j5_composite_null_keys,
    "j8_star_join_monthly": j8_star_join_monthly,
    "w1_surrogate_key": w1_surrogate_key,
    "w2_load_order_id": w2_load_order_id,
}
