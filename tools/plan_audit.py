"""Whole-surface physical-plan audit: build (never execute) every
``queries()`` plan and scan it for scale anti-patterns.

The per-query companion to tests/test_plan_quality.py (which pins a
curated set of plan properties deeply): this sweeps ALL queries
shallowly so a regression anywhere — a new cartesian product, a
row-at-a-time Python UDF, a partition-less window over a scaling
frame — is caught the round it appears, not when someone re-reads the
plan by hand.

Checks per query:

- ``cartesian``: CartesianProduct or non-whitelisted
  BroadcastNestedLoopJoin. A BNLJ whose build side is a broadcast
  1-row aggregate (the scalar-total crossJoin idiom) is legitimate and
  whitelisted BY QUERY NAME with a reason below.
- ``py_udf``: BatchEvalPython — a row-at-a-time Python UDF in the
  plan. Arrow paths (ArrowEvalPython / MapInPandas / FlatMapGroupsIn
  Pandas) are fine and not flagged.
- ``global_windows``: Window nodes with an empty partition spec.
  Bounded-frame exceptions (calendar spines, vocab-bounded, final
  k-row frames) are whitelisted with reasons.
- ``exchanges``: shuffle count — informational, recorded for
  round-over-round diffing.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Writes PLAN_AUDIT.json at the repo root when run with no query filter;
exits 1 if any non-whitelisted finding exists.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])

#: BNLJ / crossJoin whitelist — every entry must be a broadcast of an
#: AGGREGATE-BOUNDED side (1-row totals, k-row quantile boundaries,
#: centroid tables), never a data-cardinality frame.
CROSS_OK: dict[str, str] = {
    "events_chisq_independence": "crossJoin(broadcast(1-row N total))",
    "ann_sq8_topk": "crossJoin(broadcast(1-row per-dim bounds)) x2 + broadcast query codes",
    "docs_compaction_plan": "running_total's triangular offset join: bounded by partition count, never data",
    "events_ks_drift": "crossJoin(broadcast(1-row n1/n2 totals))",
    "events_cusum_changepoint": "crossJoin(broadcast(1-row n/T totals))",
    "graph_modularity_dup": "crossJoin(broadcast(1-row edge-count m))",
    "events_drift_tvd": "crossJoin(broadcast(1-row totals))",
    "events_max_concurrency": "1-row running-max reduction",
    "events_trend_line": "crossJoin(broadcast(1-row regression sums))",
    "events_winsorized_stats": "broadcast k-row quantile boundaries",
    "events_daily_value_bands": "broadcast k-row quantile boundaries",
    "events_rfm_segmentation": "broadcast 3x3 quartile boundaries",
    "events_time_to_convert": "broadcast k-row quantile boundaries",
    "orders_lead_time_quantiles": "broadcast k-row quantile boundaries",
    "quantiles_extendedprice": "broadcast P-row partition offsets",
    "customer_revenue_gini": "1-row Gini reduction vs totals",
    "a13_pareto_abc": "broadcast 1-row grand total",
    "dq_benford_prices": "broadcast 1-row total for expected freqs",
    "hist_equidepth_prices": "broadcast k-row bin boundaries",
    "hist_extendedprice": "broadcast 2-row min/max bounds",
    "events_histogram2d": "broadcast 1-row min/max bounds",
    "profile_lineitem": "1-row profile assembly",
    "s12_moment_stats": "1-row moment reduction",
    "events_mad_outliers": "broadcast per-group medians vs 1-row MAD",
    "emb_standardize": "broadcast 1-row mean/std vector",
    "emb_validate": "1-row validation summary",
    "ann_cosine_topk": "documented query x corpus scorer",
    "ann_cosine_topk_lsh": "documented query x corpus scorer",
    "ann_cosine_topk_ivf": "broadcast centroid table",
    "ann_cosine_topk_ivf_trained": "broadcast trained centroids",
    "ann_ivfpq_topk": "broadcast centroids + codebooks",
    "ann_pq_topk": "broadcast codebooks",
    "ann_pq_topk_trained": "broadcast trained codebooks",
    "ann_hybrid_rrf": "two ANN tiers, broadcast dims",
    "ann_recall_eval": "all ANN tiers by definition",
    "emb_near_duplicates": "grid-BLAS cell pairing, broadcast bounds",
    "dedup_lsh_recall": "recall harness joins exact vs LSH tiers",
    "text_vocabulary": "broadcast vocab-bounded frame",
    "text_oov_rate": "broadcast vocab",
    "text_unigram_lm": "broadcast 1-row corpus total",
    "text_tfidf_topterms": "broadcast 1-row doc count",
    "docs_bm25_search": "broadcast 1-row avgdl + query terms",
    "docs_bm25_index_search": "broadcast 1-row avgdl + query terms",
    "text_classifier_score": "broadcast class-prior table",
    "corpus_curation_report": "1-row report assembly",
    "corpus_e2e_pipeline": "composes whitelisted stages",
    "mix_report": "broadcast per-source budget shares",
    "mix_temperature_report": "1-row weight-total broadcast + broadcast rate join",
    "quantiles_approx": "broadcast 1-row sketch result",
    "quantiles_by_returnflag": "per-group boundaries, group-bounded",
    "diff_orders_tables": "1-row diff summary",
    "dq_orders_lineitem_reconcile": "1-row reconciliation totals",
    "events_seasonality_profile": "broadcast 1-row totals",
    "events_bounce_rate": "1-row rate reduction",
    "events_audience_overlap": "1-row overlap summary",
    "events_chisq": "alias safety",
    "profile_functional_deps": "1-row FD summary",
    "events_life_table": "broadcast 1-row day-spine bounds",
    "events_resample_interp": "broadcast 1-row spine bounds",
    "events_resample_locf": "broadcast 1-row spine bounds",
    "events_missing_minutes": "broadcast 1-row spine bounds",
    "q22_dormant_rich_customers": "TPC-H Q22: scalar avg(acctbal) subquery",
    "s15_correlated_subquery": "decorrelated scalar subquery",
    "geo_radius_pairs": "documented grid-blocked pair join",
    # verified in-plan (2026-08-14 sweep): BNLJ build side is a 1-row
    # scalar aggregate or the P-bounded partition_offsets triangular
    # join (operators/keys.py:45 — one row per shuffle partition)
    "w2_load_order_id": "partition_offsets triangular join (P-bounded)",
    "q11_important_stock": "TPC-H Q11: 1-row scalar threshold subquery",
    "events_funnel": "BNLJ of three 1-row step counts",
    "events_funnel_bounded": "BNLJ of 1-row step counts",
    "dq_event_id_gaps": "1-row min/max id bounds",
    "docs_sample_negatives": "partition_offsets triangular join (P-bounded)",
    "corpus_epoch_order": "partition_offsets triangular join (P-bounded)",
    "sample_pps": "partition_offsets triangular join + 1-row total",
    # round-6b additions (verified in-plan): each BNLJ build side is
    # aggregate-bounded, never a data-cardinality frame
    "skyline_parts": "dominance anti-join over O(frontier) band-pruned candidates",
    "advisor_join_strategy": "crossJoin of two 1-row stat aggregates",
    "orders_mwu_priority": "partition_offsets triangular join (P-bounded)",
    "geo_district_assign": "broadcast polygon edge list (boundary-bounded)",
    "ann_mmr_rerank": "candidates from the documented query x corpus scorer",
    "docs_curriculum_order": "partition_offsets triangular join (P-bounded) x2",
    "events_purchase_auc": "partition_offsets triangular join (P-bounded)",
    "docs_ndcg_eval": "broadcast 1-row corpus stats (the bm25 shape)",
    "lineitem_spearman_qty_price": "partition_offsets triangular join (P-bounded) x2",
    "orders_control_chart_monthly": "crossJoin(broadcast(1-row moment stats)) over a calendar-bounded month frame",
}

#: BatchEvalPython whitelist — Python surfaces that exist to DEMO the
#: integration path, never hot-path operators.
PY_UDF_OK: dict[str, str] = {
    "u2_udtf_sentences": "deliberate Python UDTF surface demo (u-suite)",
}

#: Partition-less-Window whitelist — every entry's window input must be
#: bounded by something other than data cardinality (a calendar spine,
#: a vocab, a k-row aggregate), with the bound named.
GLOBAL_WINDOW_OK: dict[str, str] = {
    "orders_business_lead_time": "2.9k-row generated date-dim spine",
    "dim_date_yearly": "year-bounded calendar spine",
    "dim_time_rollup": "86400-row time-of-day spine",
    "events_life_table": "day-spine cardinality (calendar-bounded)",
    "w3_window_suite": "demo suite over aggregate-bounded frame",
    "w5_window_distribution": "distribution demo, group-bounded",
    "s9_topn": "top-N after limit pushdown (k-bounded)",
    "s16_lateral_topk": "k-bounded lateral frame",
    "freq_items_lineitem_mg": "k-counter Misra-Gries merge frame",
    "text_vocabulary": "vocab-size-bounded rank (limit-first)",
    "hist_equidepth_prices": "k-row boundary frame",
    # verified in-plan (2026-08-14 sweep): row_number over a
    # HashAggregate(DISTINCT dim columns) child — the reference's own
    # SELECT DISTINCT -> ROW_NUMBER surrogate-key semantics
    # (/root/reference/dags/ELT.py:165-205), bounded by DIM
    # cardinality, never fact rows
    "j5_composite_null_keys": "distinct dim-combo surrogate numbering",
    "j6_composite_2key": "distinct dim-combo surrogate numbering",
    "j7_dedup_nonkey_join": "distinct dim-combo surrogate numbering",
    "j12_nullsafe_join": "distinct dim-combo surrogate numbering",
    "w1_surrogate_key": "distinct dim-combo surrogate numbering",
    "fact_crime_build": "3 dim surrogate keys over SELECT DISTINCT",
    "serve_initial_reports": "dim surrogate keys over SELECT DISTINCT",
    "fact_cube_districts": "dim surrogate keys over SELECT DISTINCT",
    "skyline_parts": "band running-max over x-range/band_width rows (aggregate-bounded)",
    "docs_curriculum_order": "source-cardinality start-offset cumsum",
}


def classify(name: str, plan: str) -> dict:
    cartesian = "CartesianProduct" in plan
    bnlj = "BroadcastNestedLoopJoin" in plan
    py_udf = "BatchEvalPython" in plan
    # A window is GLOBAL iff its windowspecdefinition has no partition
    # columns — i.e. its first argument is already an order spec
    # ("col ASC/DESC NULLS ...") or directly the frame. Bracket-group
    # counting is NOT reliable: an aggregate window without ORDER BY
    # renders two groups just like a partition-less ordered one, and
    # WindowGroupLimit (the partitioned top-k rewrite) renders its
    # partition + order specs without a leading expr group at all.
    global_windows = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        depth = 1
        i = start
        first_arg_end = None
        while i < len(plan) and depth > 0:
            ch = plan[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1 and first_arg_end is None:
                first_arg_end = i
            i += 1
        first_arg = plan[start : first_arg_end if first_arg_end else i - 1]
        if (
            first_arg.strip().startswith("specifiedwindowframe")
            or " ASC" in first_arg
            or " DESC" in first_arg
        ):
            global_windows += 1
    exchanges = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    ) + plan.count("Exchange SinglePartition")
    findings = []
    if cartesian:
        findings.append("cartesian")
    if bnlj and name not in CROSS_OK:
        findings.append("bnlj")
    if py_udf and name not in PY_UDF_OK:
        findings.append("py_udf")
    if global_windows and name not in GLOBAL_WINDOW_OK:
        findings.append("global_window")
    return {
        "cartesian": cartesian,
        "bnlj": bnlj,
        "bnlj_ok": CROSS_OK.get(name),
        "py_udf": py_udf,
        "py_udf_ok": PY_UDF_OK.get(name),
        "global_windows": global_windows,
        "global_window_ok": GLOBAL_WINDOW_OK.get(name),
        "exchanges": exchanges,
        "findings": findings,
    }


def main() -> int:
    import __spark_entry__ as e
    from sfcrimedatapipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    out: dict[str, dict] = {}
    bad: list[str] = []
    for name, fn in e.queries().items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # streaming fixtures etc.
            out[name] = {"error": str(ex)[:200]}
            continue
        rec = classify(name, plan)
        out[name] = rec
        if rec["findings"]:
            bad.append(name)
            print(f"✗ {name:30s} {rec['findings']}")
        spark.catalog.clearCache()
    n_exec = sum(v.get("exchanges", 0) for v in out.values())
    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(out),
        "n_flagged": len(bad),
        "flagged": bad,
        "total_exchanges": n_exec,
        "queries": out,
    }
    if not ONLY:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PLAN_AUDIT.json",
        )
        with open(path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {path}")
    print(
        f"{len(out)} plans audited, {len(bad)} flagged"
        + (": " + ", ".join(bad) if bad else "")
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
