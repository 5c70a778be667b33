"""Round-5 SQL-surface extensions: correlated subqueries, LATERAL
joins, discrete percentiles, map-typed analytics, regexp_extract_all,
and IGNORE NULLS windows (last-observation-carried-forward).

Like plans/tpch.py these widen the engine's declared SQL surface
beyond the reference's own Postgres usage (reference ELT at
/root/reference/dags/ELT.py is plain project/join/aggregate SQL);
each query here has a DuckDB oracle twin under the driver's full
value-hash gate.

Cross-engine exactness discipline (established rounds 1-4):

- money predicates compare EXACT INTEGER CENTS — ``floor(x*100+0.5)``
  on both engines — never raw double aggregates, so a 1-ulp avg
  difference can never flip a filter at a decision boundary;
- percentile queries use percentile_DISC (picks a real element of the
  sorted multiset — no interpolation arithmetic to disagree on);
- map-typed results are EXPLODED to plain (key, value) rows before
  the gate hashes them, so map iteration order is irrelevant and the
  oracle can state the same semantics relationally (DuckDB's MAP API
  differs, its relational content does not);
- every window ORDER BY is a total order (ties broken by a key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.plans.tpch import QueryFn
from sfcrimedatapipeline_spark.sources.tables import read_table


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def s15_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: correlated scalar subqueries + correlated EXISTS.

    Orders priced above 1.5x their customer's average order price,
    restricted to BUILDING-segment customers. The average comparison is
    done in exact integers (cents*2*count > 3*sum_cents <=> price >
    1.5*avg) so the predicate is bit-portable; Catalyst decorrelates
    both scalar subqueries into aggregate-then-join and the EXISTS
    into a left-semi join — no per-row re-execution at any scale.
    """
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o.o_orderkey AS order_key,
               o.o_custkey  AS customer_id,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM orders o
        WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                * (SELECT count(*) FROM orders o2
                   WHERE o2.o_custkey = o.o_custkey) * 2
              > 3 * (SELECT sum(CAST(floor(o3.o_totalprice * 100 + 0.5) AS BIGINT))
                     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
          AND EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING')
        """
    )


def s16_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16: LATERAL correlated subquery — per-customer top-2 orders by
    price (total order: cents DESC, key ASC), customers with no orders
    dropped by the inner join.

    The lateral subquery is the SQL-standard spelling of "top-k per
    group"; Catalyst rewrites it to a window + filter (one shuffle on
    the correlation key), not a per-customer re-scan.
    """
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT c.c_custkey AS customer_id, l.order_key, l.price_cents
        FROM customer c,
        LATERAL (
            SELECT o.o_orderkey AS order_key,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY price_cents DESC, order_key ASC
            LIMIT 2
        ) l
        """
    )


def a11_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: discrete percentiles (WITHIN GROUP ORDER BY) — p25/median/
    p75 of order price per priority.

    percentile_DISC returns an actual element of the sorted multiset
    (smallest value whose cume_dist >= p) — no interpolation
    arithmetic, so Spark and DuckDB agree bit-for-bit on doubles.
    The continuous-interpolation variant lives in
    operators/profile.py:exact_quantiles with an explicitly shared
    formula; this is the built-in SQL-aggregate surface.
    """
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               count(*) AS n_orders,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS median,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75
        FROM orders
        GROUP BY o_orderpriority
        """
    )


def f4_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: map-typed analytics — per-user event-type counts carried as
    a MAP column (map_from_entries over collected structs), then
    consumed via map_keys/explode back to rows.

    The map is exploded before the gate hashes the result, so map
    iteration order (Spark: insertion order of the nondeterministic
    collect_list) cannot leak into the comparison; n_types comes from
    size(map_keys(...)) to exercise the map accessors.
    """
    ev = read_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("type_counts")
    )
    return as_map.select(
        "user_id",
        F.size(F.map_keys(F.col("type_counts"))).cast("int").alias("n_types"),
        F.explode(F.col("type_counts")).alias("event_type", "n_events"),
    ).select("user_id", "event_type", "n_events", "n_types")


def p9_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: regexp_extract_all + posexplode — every digit run in the
    event props JSON string, with its match ordinal.

    The pattern ``[0-9]+`` is in the Java-regex/RE2 common subset
    (same discipline as textstats' PII patterns), so both engines
    produce the same match list; ordinals are emitted 0-based.
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), 0).alias("runs"),
        )
        .select("event_id", F.posexplode("runs").alias("match_idx", "digits"))
        .select(
            "event_id",
            F.col("match_idx").cast("int").alias("match_idx"),
            "digits",
        )
    )


def w6_ignore_nulls_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: IGNORE NULLS windows — last-observation-carried-forward.

    Every 5th event's value is masked to NULL (a deterministic stand-in
    for sensor dropout), then per-user event-time order fills each gap
    with the most recent non-null observation (last IGNORE NULLS) and
    tags the first observed value per user (first IGNORE NULLS).
    Exact integer cents; total order (ts, event_id); one shuffle on
    user_id.
    """
    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.pmod(F.col("event_id"), F.lit(5)) == 0, F.lit(None)).otherwise(cents).alias("obs_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "event_id",
        "user_id",
        "obs_cents",
        F.last("obs_cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.first("obs_cents", ignorenulls=True).over(w).alias("first_seen_cents"),
    )


QUERIES: dict[str, QueryFn] = {
    "s15_correlated_subquery": s15_correlated_subquery,
    "s16_lateral_topk": s16_lateral_topk,
    "a11_percentile_disc": a11_percentile_disc,
    "f4_map_functions": f4_map_functions,
    "p9_regexp_extract_all": p9_regexp_extract_all,
    "w6_ignore_nulls_locf": w6_ignore_nulls_locf,
}

ORACLE_SQL: dict[str, str] = {
    "s15_correlated_subquery": """
        SELECT o.o_orderkey AS order_key,
               o.o_custkey  AS customer_id,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM orders o
        WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                * (SELECT count(*) FROM orders o2
                   WHERE o2.o_custkey = o.o_custkey) * 2
              > 3 * (SELECT sum(CAST(floor(o3.o_totalprice * 100 + 0.5) AS BIGINT))
                     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
          AND EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING')
    """,
    "s16_lateral_topk": """
        SELECT c.c_custkey AS customer_id, l.order_key, l.price_cents
        FROM customer c,
        LATERAL (
            SELECT o.o_orderkey AS order_key,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY price_cents DESC, order_key ASC
            LIMIT 2
        ) l
    """,
    "a11_percentile_disc": """
        SELECT o_orderpriority AS priority,
               count(*) AS n_orders,
               quantile_disc(o_totalprice, 0.25) AS p25,
               quantile_disc(o_totalprice, 0.5)  AS median,
               quantile_disc(o_totalprice, 0.75) AS p75
        FROM orders
        GROUP BY o_orderpriority
    """,
    "f4_map_functions": """
        WITH per_type AS (
            SELECT user_id, event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, event_type, n_events,
               CAST(count(*) OVER (PARTITION BY user_id) AS INTEGER) AS n_types
        FROM per_type
    """,
    "p9_regexp_extract_all": """
        SELECT event_id,
               CAST(generate_subscripts(runs, 1) - 1 AS INTEGER) AS match_idx,
               unnest(runs) AS digits
        FROM (SELECT event_id, regexp_extract_all(props, '[0-9]+') AS runs
              FROM events)
    """,
    "w6_ignore_nulls_locf": """
        WITH masked AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_id % 5 = 0 THEN NULL
                        ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
                   END AS obs_cents
            FROM events
        )
        SELECT event_id, user_id, obs_cents,
               last_value(obs_cents IGNORE NULLS) OVER w AS filled_cents,
               first_value(obs_cents IGNORE NULLS) OVER w AS first_seen_cents
        FROM masked
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
}
