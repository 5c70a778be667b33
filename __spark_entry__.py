"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-join query on sf0.001.
``queries``/``oracle_sql`` expose the operator inventory from
SURVEY.md §2 (implemented in ``sfcrimedatapipeline_spark.plans.tpch``
and the extension operators under
``sfcrimedatapipeline_spark.operators``).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (J8 star join + IN filter + month rollup) on sf0.001."""
    from sfcrimedatapipeline_spark.plans.tpch import j8_star_join_monthly

    return j8_star_join_monthly(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from sfcrimedatapipeline_spark.plans import (
        corpus_queries,
        events_queries,
        fact_queries,
        llmops,
        media,
        tpch,
        udx_queries,
    )

    return {
        **tpch.QUERIES,
        **llmops.QUERIES,
        **events_queries.QUERIES,
        **media.QUERIES,
        **fact_queries.QUERIES,
        **corpus_queries.QUERIES,
        **udx_queries.QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    from sfcrimedatapipeline_spark.plans import (
        corpus_queries,
        events_queries,
        fact_queries,
        llmops,
        media,
        tpch,
        udx_queries,
    )

    return {
        **tpch.ORACLE_SQL,
        **llmops.ORACLE_SQL,
        **events_queries.ORACLE_SQL,
        **media.ORACLE_SQL,
        **fact_queries.ORACLE_SQL,
        **corpus_queries.ORACLE_SQL,
        **udx_queries.ORACLE_SQL,
    }
