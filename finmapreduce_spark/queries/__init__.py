"""Query catalog — the driver-facing operator surface.

Each submodule exposes ``QUERIES: dict[str, QuerySpec]`` mapping an
operator name (SURVEY §2 ids in the name) to a Spark builder and an
equivalent DuckDB oracle SQL (None for non-SQL-expressible ops, which
the driver checks rows-only).

Builders take ``(spark, sf_dir)`` and return a DataFrame whose column
names match the oracle's aliases exactly (the driver sorts columns by
name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple, Optional

from pyspark.sql import DataFrame, SparkSession


class QuerySpec(NamedTuple):
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


# The driver evaluates a PREFIX of this catalog (budget-bound, ~50
# entries in round 1), so dict order is witness priority. Round 1
# witnessed exactly the relational/tpch-heavy head and left every
# dedup/ANN/pipeline/text/multimodal/training query without a
# CORRECTNESS row. Order now: (1) the flagship DAG + one
# representative of each hard operator family up front, (2) the rest
# of the never-witnessed queries round-robin across families so ANY
# cutoff point spans the whole surface, (3) the round-1-witnessed
# queries last (they re-witness only if budget allows).
_FRONT = [
    "pipeline_e2e_answers",
    "pipeline_judge_accuracy",
    "truncation_e2e_answers",
    "dedup_lsh_pairs",
    "dedup_cluster_canonical",
    "dedup_duplicate_passages",
    "ann_ivf_kmeans_topk",
    "ann_pq_adc_topk",
    "ann_recall_at_k",
    "j4_similarity_join",
    "f2_chunk_documents",
    "f3_truncate_start",
    "f4_truncate_end",
    "p3_score_filter",
    "a1_reduce_ordered_concat",
    "text_token_count",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "text_repetition_metrics",
    "multimodal_ann_topk",
    "training_corpus_report",
    "contamination_ngram_overlap",
    "dedup_exact",
    "dedup_semantic_verify",
    "dedup_incremental_semantic",
    "dedup_minhash_signature",
    "dedup_embedding_cosine",
    "dedup_incremental_passages",
    "asof_join_events",
    "events_range_zorder_scan",
    "u6_pair_cosine",
    "u6_hashing_bow_cosine",
    "a12_prf1",
    "improve_questions",
    "bm25_retrieval_topk",
    "pack_training_sequences",
    "truncation_stats",
    "f9_xml_render",
    "f11_normalize",
    "f12_extract_numbers",
]

# Names with a green driver row in CORRECTNESS_r01.json — historical
# fact, used only to sink them to the catalog tail.
_R01_WITNESSED = frozenset(
    {
        "q1_pricing_summary", "s1_scan_project", "j1_broadcast_left_join",
        "j2_distinct_keys", "j_semi_join", "j_anti_join",
        "q5_regional_revenue", "q6_forecast_revenue", "q4_priority_check",
        "q19_disjunctive_revenue", "q7_nation_flows", "q3_shipping_priority",
        "q_brand_nation_revenue", "cohort_retention", "w_running_total",
        "w_moving_avg_7d", "a5_group_stats_median", "a_quantiles_by_type",
        "a9_pivot_counts", "a12_confusion_matrix", "a_rollup_counts",
        "w2_fixed_batches", "w3_topk_per_group", "w3_topk_per_group_pruned",
        "w4_argmax_per_group", "w6_preview", "setop_union_error_rows",
        "setop_intersect", "setop_except", "f7_json_extract",
        "f17_cache_key", "f18_monthly_histogram", "sessionize_events",
        "hourly_event_rollup", "events_json_extract", "funnel_conversion",
        "histogram_order_totals", "histogram_equidepth_orders",
        "a_grouping_sets", "q2_min_cost_supplier", "q9_product_profit",
        "q12_priority_counts", "q20_dominant_suppliers",
        "q21_sole_late_suppliers", "q8_market_share",
        "q10_returned_top_customers", "q11_value_threshold",
        "q13_order_count_distribution", "q14_promo_ratio", "q15_top_supplier",
    }
)


def _round_robin(groups: list[list[str]]) -> list[str]:
    out: list[str] = []
    i = 0
    while any(groups):
        g = groups[i % len(groups)]
        if g:
            out.append(g.pop(0))
        i += 1
        if i > 10_000:  # defensive; can't trigger with finite input
            break
    return out


def all_queries() -> dict[str, QuerySpec]:
    from finmapreduce_spark.queries import (
        dedup,
        evaluation,
        multimodal,
        pipeline,
        relational,
        scoring,
        similarity,
        temporal,
        textops,
        tpch_shapes,
        training,
    )

    mods = (
        relational,
        tpch_shapes,
        textops,
        dedup,
        similarity,
        pipeline,
        multimodal,
        evaluation,
        temporal,
        scoring,
        training,
    )
    out: dict[str, QuerySpec] = {}
    for mod in mods:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)

    front = [n for n in _FRONT if n in out]
    placed = set(front)
    fresh_by_fam = [
        [n for n in mod.QUERIES if n not in placed and n not in _R01_WITNESSED]
        for mod in mods
    ]
    seen_by_fam = [
        [n for n in mod.QUERIES if n not in placed and n in _R01_WITNESSED]
        for mod in mods
    ]
    ordered = front + _round_robin(fresh_by_fam) + _round_robin(seen_by_fam)
    assert len(ordered) == len(out), "catalog reorder lost queries"
    return {n: out[n] for n in ordered}
