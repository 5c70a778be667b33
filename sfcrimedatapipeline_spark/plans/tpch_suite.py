"""TPC-H structural suite: all 22 query shapes on the testdata schema.

Each query keeps its TPC-H number's STRUCTURE — EXISTS semi-join (q4),
6-way region-constrained join (q5), outer-join count distribution
(q13), correlated scalar average (q17), group-HAVING semi-join (q18),
scalar-subquery + anti-join (q22), correlated MIN lookup (q2),
conditional-share ratios (q8/q14), disjunctive pushdown (q19),
double-nested aggregate comparison (q20), double EXISTS/NOT EXISTS
self-join (q21), MAX-equality view join (q15) — with predicates
adapted to the testdata's columns (no commitdate/receiptdate/phone/
container/partsupp/shipmode; see TESTDATA.md; where TPC-H uses
partsupp, lineitem itself serves as the part×supplier relation). These
shapes are what Catalyst's subquery decorrelation, semi/anti-join
planning, and scalar-subquery broadcast exist for; the plans are
pinned by tests/test_plan_quality.py. q1/q3 live in plans/tpch.py's
reference series.

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


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each STANDARD size-15 part, the EUROPE
    supplier(s) whose observed price equals the part's minimum
    (correlated MIN subquery, here over lineitem standing in for
    partsupp). The per-part MIN decorrelates into a groupBy joined
    back on (partkey, cents-equality); supplier/nation/region ride
    broadcasts; lineitem shuffles once on l_partkey. Cost compares in
    exact cents so min-equality never float-misses."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = read_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("__cost", _cents("l_extendedprice"))
    )
    min_cost = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("__cost").alias("__min_cost")
    )
    best = li.join(
        F.broadcast(min_cost),
        (F.col("l_partkey") == F.col("__pk"))
        & (F.col("__cost") == F.col("__min_cost")),
    )
    return best.select(
        F.col("s_acctbal").alias("supplier_balance"),
        F.col("s_name").alias("supplier_name"),
        F.col("n_name").alias("nation"),
        F.col("p_partkey").alias("part_key"),
        F.col("p_name").alias("part_name"),
    ).distinct()


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — 1996 shipments,
    discount 5-7%, quantity < 24. The whole query is one map-side
    partial + one 1-row reduce; every predicate reaches the parquet
    scan (PushedFilters pins it for shipdate/quantity). Discount is a
    stored double multiple of 0.01, compared on round(d*100) so both
    engines pick exactly the same rows."""
    li = read_table(spark, sf_dir, "lineitem")
    pct = F.round(F.col("l_discount") * 100).cast("int")
    flt = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 24)
    ).filter((pct >= 5) & (pct <= 7))
    disc_cents = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 100 + F.lit(0.5)
    ).cast("long")
    return flt.agg((F.sum(disc_cents).cast("double") / 100).alias("revenue"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between NATION_3 and
    NATION_7 by ship year — supplier nation on one side, customer
    nation on the other, both directions kept, 1996-1997. Both nation
    lookups broadcast (aliased frames, q3-style); lineitem shuffles on
    orderkey then custkey only. The pair filter is a pushed-down
    disjunction of two conjuncts."""
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey")
    ).select("s_suppkey", F.col("n1.n_name").alias("supp_nation"))
    customer = read_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey")
    ).select("c_custkey", F.col("n2.n_name").alias("cust_nation"))
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg((F.sum(_rev_cents()).cast("double") / 100).alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5 suppliers' share of the ASIA PROMO
    market by order year. Share = conditional cents sum / total cents
    sum, both exact BIGINTs, divided once as doubles — identical IEEE
    division on identical integers on both engines. Customer-side
    nation is region-scoped (broadcast chain); supplier-side nation
    tags the numerator."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    cust_nation = nation.alias("cn").join(
        F.broadcast(region), F.col("cn.n_regionkey") == F.col("r_regionkey")
    )
    customer = read_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn.n_nationkey")
    ).select("c_custkey")
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.alias("sn")),
        F.col("s_nationkey") == F.col("sn.n_nationkey"),
    ).select("s_suppkey", F.col("sn.n_name").alias("supp_nation"))
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
    )
    per_year = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_5", _rev_cents()).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("__nat"),
        F.sum(_rev_cents()).alias("__tot"),
    )
    return per_year.select(
        "order_year",
        (F.col("__nat").cast("double") / F.col("__tot").cast("double")).alias(
            "mkt_share"
        ),
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    order year (no partsupp.supplycost in the testdata, so profit is
    discounted revenue — the join/group structure is the point: a
    LIKE-filtered broadcast part dim, supplier→nation broadcast, and
    lineitem⋈orders as the only big shuffle)."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    nation = read_table(spark, sf_dir, "nation")
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("order_year")
        )
        .agg((F.sum(_rev_cents()).cast("double") / 100).alias("profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns
    (l_returnflag = 'R') on 1996Q1 orders. Revenue ranks in exact
    cents with custkey as the total-order tiebreak, so the LIMIT is
    deterministic and the oracle hash stable; nation broadcasts, the
    orders⋈lineitem and ⋈customer shuffles carry only Q1 rows."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    per_cust = joined.groupBy(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("customer_name"),
        F.col("c_acctbal").alias("balance"),
        F.col("n_name").alias("nation"),
    ).agg(F.sum(_rev_cents()).alias("__rev_cents"))
    top = per_cust.orderBy(
        F.col("__rev_cents").desc(), F.col("customer_key")
    ).limit(20)
    return top.select(
        "customer_key",
        "customer_name",
        "balance",
        "nation",
        (F.col("__rev_cents").cast("double") / 100).alias("revenue"),
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose ASIA-supplied value exceeds a
    fixed fraction (0.0001) of the total — a grouped aggregate HAVING
    against a scalar subquery over the SAME aggregate input. The
    scalar total rides a 1-row broadcast; the threshold compare is
    cross-multiplied to integers (value_cents * 10000 > total_cents)
    so no float division decides membership."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(_cents("l_extendedprice")).alias("__val_cents")
    )
    total = per_part.agg(F.sum("__val_cents").alias("__tot_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__val_cents") * 10000 > F.col("__tot_cents"))
        .select(
            "part_key",
            (F.col("__val_cents").cast("double") / 100).alias("value"),
        )
    )


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus): per line status, how
    many 1996-shipped lines belong to critical-priority orders vs not
    — the CASE-sum pivot over a fact⋈dim join. One shuffle
    (orderkey), one grouped aggregate with two conditional sums."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    return joined.groupBy(F.col("l_linestatus").alias("line_status")).agg(
        F.sum(F.when(crit, one).otherwise(zero)).alias("high_line_count"),
        F.sum(F.when(crit, zero).otherwise(one)).alias("low_line_count"),
    )


def q14_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of March-1996 revenue from PROMO
    parts. Numerator and denominator are exact cents BIGINTs from one
    conditional aggregate over the lineitem⋈part broadcast join; the
    single double division (×100) happens once at the end, identically
    in both engines."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("__promo"),
        F.sum(_rev_cents()).alias("__tot"),
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.col("__promo").cast("double")
            / F.col("__tot").cast("double")
        ).alias("promo_revenue_pct")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose 1996Q1 revenue equals
    the maximum — the revenue view reused twice (group + scalar MAX),
    joined back on exact-cents equality so ties surface instead of
    being ranked away. The MAX rides a 1-row broadcast."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("__rev_cents")
    )
    top = revenue.agg(F.max("__rev_cents").alias("__max_cents"))
    supplier = read_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("__rev_cents") == F.col("__max_cents"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
            (F.col("__rev_cents").cast("double") / 100).alias("total_revenue"),
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for
    non-PROMO, non-Brand#23 small parts, EXCLUDING flagged suppliers
    (complaints → negative balance) via an anti-join on the supplier
    key. countDistinct dedups map-side per group; the anti side is a
    broadcast of the (tiny) flagged-supplier keys."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 10)
    )
    flagged = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.groupBy(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("size"),
    ).agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive
    (brand × size-range × quantity-range) conjunct groups — the
    OR-of-ANDs predicate Catalyst must keep joinable (equi on partkey)
    while pushing each side's half of the conjuncts below the join.
    One broadcast join, one 1-row aggregate."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        (F.sum(_rev_cents()).cast("double") / 100).alias("revenue")
    )


def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers who front-loaded 'bolt' parts
    — for some (supplier, part) pair, 1996 shipments exceed half of
    that pair's all-time shipments (availqty > 0.5·sum becomes
    2·recent > total, integer-exact). The nested aggregate compare
    happens inside one grouped frame (conditional sum vs total sum);
    qualifying pairs collapse to a supplier semi-join; nation/region
    broadcast."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("bolt")
    ).select("p_partkey")
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    recent = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = F.col("l_quantity").cast("long")
    pairs = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(recent, qty).otherwise(F.lit(0).cast("long"))).alias("__recent"),
        F.sum(qty).alias("__total"),
    )
    qualifying = pairs.filter(
        (F.col("__recent") * 2 > F.col("__total")) & (F.col("__recent") > 0)
    ).select("l_suppkey").distinct()
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supplier.join(
        qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select(
        F.col("s_name").alias("supplier_name"),
        F.col("s_acctbal").alias("supplier_balance"),
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order (late = shipped > 90 days after the
    order date; no receipt/commit dates in the testdata). The classic
    EXISTS(other supplier) AND NOT EXISTS(other LATE supplier)
    double-correlation becomes a semi-join against the distinct
    (order, supplier) set and an anti-join against the distinct late
    set, both keyed on orderkey with a suppkey-inequality condition —
    no window, no fan-out."""
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    all_sup = li.select("l_orderkey", "l_suppkey").distinct()
    late_sup = (
        li.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = all_sup.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    other_late = late_sup.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    sole_late = (
        late_sup.join(
            other,
            (F.col("l_orderkey") == F.col("__ok"))
            & (F.col("l_suppkey") != F.col("__sk")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("__ok2"))
            & (F.col("l_suppkey") != F.col("__sk2")),
            "left_anti",
        )
    )
    supplier = read_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count("*").cast("long").alias("numwait"))
    )


QUERIES: dict[str, QueryFn] = {
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q22_dormant_rich_customers": q22_dormant_rich_customers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_stock": q11_important_stock,
    "q12_priority_by_status": q12_priority_by_status,
    "q14_promotion_effect": q14_promotion_effect,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q20_excess_inventory_suppliers": q20_excess_inventory_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
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
    "q2_min_cost_supplier": """
        WITH eur AS (
            SELECT s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        offers AS (
            SELECT l.l_partkey, l.l_suppkey,
                   CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cost
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN eur e ON l.l_suppkey = e.s_suppkey
            WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
        ),
        min_cost AS (
            SELECT l_partkey, min(cost) AS min_cost FROM offers GROUP BY 1
        )
        SELECT DISTINCT e.s_acctbal AS supplier_balance,
               e.s_name AS supplier_name,
               e.n_name AS nation,
               p.p_partkey AS part_key,
               p.p_name AS part_name
        FROM offers o
        JOIN min_cost m ON o.l_partkey = m.l_partkey AND o.cost = m.min_cost
        JOIN eur e ON o.l_suppkey = e.s_suppkey
        JOIN part p ON o.l_partkey = p.p_partkey
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 100 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_quantity < 24
          AND CAST(round(l_discount * 100) AS INT) BETWEEN 5 AND 7
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                   * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
                   AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": """
        WITH joined AS (
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
                   sn.n_name AS supp_nation,
                   CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                              * 100 + 0.5) AS BIGINT) AS rev
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
                         AND r.r_name = 'ASIA'
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT order_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
                             ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
               / CAST(sum(rev) AS DOUBLE) AS mkt_share
        FROM joined GROUP BY 1
    """,
    "q9_product_profit": """
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
               CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                   * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
                   AS profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
                   AND p.p_name LIKE '%widget%'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """,
    "q10_returned_items": """
        WITH per_cust AS (
            SELECT c.c_custkey AS customer_key,
                   c.c_name AS customer_name,
                   c.c_acctbal AS balance,
                   n.n_name AS nation,
                   sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                  * 100 + 0.5) AS BIGINT)) AS rev_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1, 2, 3, 4
        )
        SELECT customer_key, customer_name, balance, nation,
               CAST(rev_cents AS DOUBLE) / 100 AS revenue
        FROM per_cust
        ORDER BY rev_cents DESC, customer_key
        LIMIT 20
    """,
    "q11_important_stock": """
        WITH per_part AS (
            SELECT l.l_partkey AS part_key,
                   sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS val_cents
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
                         AND r.r_name = 'ASIA'
            GROUP BY 1
        ),
        total AS (SELECT sum(val_cents) AS tot_cents FROM per_part)
        SELECT p.part_key, CAST(p.val_cents AS DOUBLE) / 100 AS value
        FROM per_part p, total t
        WHERE p.val_cents * 10000 > t.tot_cents
    """,
    "q12_priority_by_status": """
        SELECT l.l_linestatus AS line_status,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    "q14_promotion_effect": """
        SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                   * 100 + 0.5) AS BIGINT)
                   ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
               / CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                     * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(floor((l_extendedprice * (1.0 - l_discount))
                                  * 100 + 0.5) AS BIGINT)) AS rev_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s.s_suppkey AS supplier_key,
               s.s_name AS supplier_name,
               CAST(r.rev_cents AS DOUBLE) / 100 AS total_revenue
        FROM revenue r
        JOIN supplier s ON r.supplier_no = s.s_suppkey
        WHERE r.rev_cents = (SELECT max(rev_cents) FROM revenue)
    """,
    "q16_supplier_part_counts": """
        SELECT p.p_brand AS brand,
               p.p_type AS part_type,
               p.p_size AS size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#23'
          AND p.p_type <> 'PROMO'
          AND p.p_size <= 10
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q19_discounted_revenue": """
        SELECT CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
                                   * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
                   AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q20_excess_inventory_suppliers": """
        WITH pairs AS (
            SELECT l.l_suppkey, l.l_partkey,
                   sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01'
                             AND l.l_shipdate <  TIMESTAMP '1997-01-01'
                            THEN CAST(l.l_quantity AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END) AS recent,
                   sum(CAST(l.l_quantity AS BIGINT)) AS total
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
                       AND p.p_name LIKE '%bolt%'
            GROUP BY 1, 2
        )
        SELECT s.s_name AS supplier_name,
               s.s_acctbal AS supplier_balance
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        WHERE EXISTS (SELECT 1 FROM pairs q
                      WHERE q.l_suppkey = s.s_suppkey
                        AND q.recent * 2 > q.total AND q.recent > 0)
    """,
    "q21_waiting_suppliers": """
        WITH li AS (
            SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        all_sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li),
        late_sup AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM li
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        )
        SELECT s.s_name AS supplier_name,
               CAST(count(*) AS BIGINT) AS numwait
        FROM late_sup w
        JOIN supplier s ON w.l_suppkey = s.s_suppkey
        WHERE EXISTS (SELECT 1 FROM all_sup a
                      WHERE a.l_orderkey = w.l_orderkey
                        AND a.l_suppkey <> w.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late_sup x
                          WHERE x.l_orderkey = w.l_orderkey
                            AND x.l_suppkey <> w.l_suppkey)
        GROUP BY 1
    """,
}
