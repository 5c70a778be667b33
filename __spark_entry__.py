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


#: Run these LAST: pipeline rebuilds, iterative ops, and genuine
#: streaming executions (micro-batched, fixture-backed). The round-4
#: driver artifact truncated at 50/118 queries on a time budget
#: (VERDICT r4 #1); cheap oracle-gated batch queries go first so the
#: record maximizes coverage under any budget. The streaming entries
#: share one session-cached fixture (streaming/events.py:
#: cached_stream_fixture), so grouping them also amortizes its build.
_DEFERRED = [
    # round-6 iterative additions (CC / MinHash-graph downstream)
    "graph_lpa_communities",
    "er_customer_clusters",
    "er_golden_record",
    "geo_dbscan_clusters",
    "graph_modularity_dup",
    "ann_recall_eval",
    "ann_mmr_rerank",
    "emb_pca_topk",
    "docs_bm25_index_search",
    "corpus_shard_manifest",
    "graph_bfs_distances",
    "src_python_stream_source",
    "text_bpe_merges",
    "emb_semantic_dedup",
    "ann_pq_topk_trained",
    "ann_cosine_topk_ivf_trained",
    "fact_crime_build",
    "serve_initial_reports",
    "fact_cube_districts",
    "dedup_clusters",
    "dedup_clusters_2phase",
    "pagerank_dup_graph",
    "graph_triangle_count",
    "u4_cogroup_alignment",
    "events_hourly_agg_stream",
    "events_sliding_agg_stream",
    "events_stream_static_join",
    "events_incremental_agg_stream",
    "events_stream_stream_join",
    "dedup_exact_stream",
    "dedup_exact_stream_wm",
    "docs_accrete_stream",
    "events_sessionize_stream",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions),
    ordered cheap-first (see _DEFERRED)."""
    from sfcrimedatapipeline_spark.plans import (
        analytic_ext,
        corpus_queries,
        events_queries,
        fact_queries,
        geo_queries,
        linkage_queries,
        llmops,
        llmops_ext,
        media,
        sql_surface,
        timeseries,
        tpch,
        tpch_suite,
        udx_queries,
    )

    merged = {
        **tpch.QUERIES,
        **analytic_ext.QUERIES,
        **tpch_suite.QUERIES,
        **sql_surface.QUERIES,
        **timeseries.QUERIES,
        **llmops.QUERIES,
        **llmops_ext.QUERIES,
        **events_queries.QUERIES,
        **media.QUERIES,
        **fact_queries.QUERIES,
        **geo_queries.QUERIES,
        **linkage_queries.QUERIES,
        **corpus_queries.QUERIES,
        **udx_queries.QUERIES,
    }
    deferred = set(_DEFERRED)
    ordered = {k: v for k, v in merged.items() if k not in deferred}
    ordered.update({k: merged[k] for k in _DEFERRED if k in merged})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    from sfcrimedatapipeline_spark.plans import (
        analytic_ext,
        corpus_queries,
        events_queries,
        fact_queries,
        geo_queries,
        linkage_queries,
        llmops,
        llmops_ext,
        media,
        sql_surface,
        timeseries,
        tpch,
        tpch_suite,
        udx_queries,
    )

    return {
        **tpch.ORACLE_SQL,
        **analytic_ext.ORACLE_SQL,
        **tpch_suite.ORACLE_SQL,
        **sql_surface.ORACLE_SQL,
        **timeseries.ORACLE_SQL,
        **llmops.ORACLE_SQL,
        **llmops_ext.ORACLE_SQL,
        **events_queries.ORACLE_SQL,
        **media.ORACLE_SQL,
        **fact_queries.ORACLE_SQL,
        **geo_queries.ORACLE_SQL,
        **linkage_queries.ORACLE_SQL,
        **corpus_queries.ORACLE_SQL,
        **udx_queries.ORACLE_SQL,
    }
