"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2) to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.

Determinism contract: money aggregates go through exact integer cents
(see functions/scalars.py) so Spark and DuckDB agree bit-for-bit; every
computed column is aliased identically on both sides; ratios divide
exact integers (same doubles on both engines).

Ordering contract (rotation, round 4): the driver's CORRECTNESS gate
checks only the FIRST 50 keys of ``queries()``, so the dict is ordered
as  sentinels (regression continuity + the two round-2 oracle-bug fixes)
-> this round's never-checked block (_ROTATION_R4: the seven queries
whose plans were rewritten this round for scale — bucket-walk windows
— plus the recursive-trajectory / stats / graph / SCM families VERDICT
r3 prioritized) -> the remaining never-checked queries (queued for
round 5) -> everything already green in CORRECTNESS_r01/r02/r03.
All registered oracles are additionally validated locally by
tests/driver_sim.py (pandas-typed compare, sf0.01) every round — and
since round 4 any sim mismatch persists a typed row diff under
SELFCHECK_diffs/ — so rotation only changes WHICH get the driver's
hard signal, never which are verified.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_for_e_commerce_shop_spark.queries import (
    QUERIES,
    ORACLES,
)

# Keep a regression heartbeat on the flagship path plus the two queries
# whose oracles were fixed this round (HUGEINT -> BIGINT casts): their
# flip from FAIL to green is the round-3 proof the root cause was right.
_SENTINELS = [
    "category_kpis",
    "order_kpis",
    "merge_coalesce",
    "null_gate",
    "ri_orphans",
    "events_sessionize",
    "events_stream_sessionize",
]

# 43 queries never yet driver-checked, fronted for round 4: first the
# seven whose plans changed this round (bucket-walk window rewrites +
# the ADVICE zero-guard/overflow fixes), then the recursive-CTE
# trajectory, stats, graph, and SCM families VERDICT r3 named as the
# trickiest remaining determinism surface.
_ROTATION_R4 = [
    # changed this round — driver signal on the new plans
    "price_qty_dependence_grid",
    "part_abc_xyz_matrix",
    "layout_zorder_pruning_audit",
    "purchase_propensity_lift",
    "revenue_concentration_curve",
    "ab_hte_screen",
    "policy_snips",
    # recursive-CTE / iterative trajectories
    "events_ema_recursive",
    "events_holt_recursive",
    "events_cusum_changepoint",
    "category_demand_slope",
    # stats suite
    "revenue_bootstrap_ci",
    "anova_nation_priority",
    "brand_mann_kendall",
    "nation_spearman_bal_spend",
    "revenue_ljung_box",
    "priority_mannwhitney_leadtime",
    "priority_kruskal_wallis",
    "nation_kendall_tau",
    "orders_benford_second_digit",
    "events_hourly_rayleigh",
    "orders_weekly_rayleigh",
    "benford_mad_conformity",
    "events_wasserstein_drift",
    "mcnemar_lang_classifiers",
    # graph
    "part_degree_profile",
    "part_label_propagation",
    "part_kcore",
    "part_link_prediction",
    "customer_record_linkage",
    "part_two_hop_reach",
    "leadtime_variance_components",
    # SCM classics
    "part_xyz_classes",
    "part_newsvendor_stock",
    "part_eoq_policy",
    "brand_bullwhip_ratio",
    "supplier_lead_time_sla",
    "part_abc_migration",
    # round-4 operators (brand-new plan machinery — HyperBall register
    # iteration, deterministic policy replay, minimax PAVA, bucketed
    # pair-spine median, VariantType) get the hard signal first; the
    # displaced SCM/dedup names stay sim-verified and queue for r5
    "part_hyperball_reach",
    "bandit_replay_egreedy",
    "conversion_isotonic_curve",
    "revenue_theil_sen",
    "events_variant_json",
]

# Round-3 rotation (all 43 green in CORRECTNESS_r03) — kept for the
# checked-set bookkeeping below.
_ROTATION_R3 = [
    "cumulative_active_users",
    "survival_km",
    "events_stateful_sessionize",
    "cohort_retention",
    "rolling_active_users",
    "scd2_priority_history",
    "scd2_point_in_time_join",
    "scd2_timeline_alignment",
    "hll_distinct_users",
    "hll_merge_identity",
    "hll_overlap",
    "hll_rollup",
    "hll_rolling_users",
    "cms_heavy_hitters",
    "cms_join_size",
    "bloom_prune_orders",
    "embedding_kmeans",
    "ann_pq_topk",
    "dedup_prefix_filter",
    "dedup_chunk_level",
    "dedup_cluster_reps",
    "benchmark_contamination",
    "corpus_pack_sequences",
    "corpus_shuffle_split",
    "corpus_source_mix",
    "corpus_snapshot_diff",
    "corpus_quality_sample",
    "corpus_pipeline_funnel",
    "corpus_split_leakage",
    "basket_rules",
    "basket_pairs",
    "customer_rfm",
    "part_abc_classes",
    "part_pagerank",
    "part_triangles",
    "revenue_gini",
    "ab_test_report",
    "ab_logrank",
    "ab_funnel_uplift",
    "benford_digit_audit",
    "event_rate_wilson_ci",
    "events_drift_chi2",
    "events_ks_drift",
]

# Every query with a green hard signal in CORRECTNESS_r01 or _r02;
# these go to the back of the dict so rotation fronts new coverage.
_CHECKED_R1_R2 = frozenset(
    {
        "ann_brute_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_recall",
        "asof_purchase_click", "brand_category_cube", "category_kpis",
        "category_kpis_sql", "conditional_ratio", "customer_k_anonymity",
        "customer_retention_setops", "customer_spend_quartiles",
        "dedup_clusters", "dedup_embedding_cosine", "dedup_exact",
        "dedup_incremental", "dedup_minhash_estimate", "dedup_minhash_lsh",
        "dedup_near_jaccard", "dedup_simhash", "dedup_simhash_pairs",
        "distinct_statuses", "embedding_stats", "event_type_salted_kpis",
        "events_funnel", "events_hourly", "events_interval_join",
        "events_pii_scan", "events_sessionize", "events_stream_enriched",
        "events_stream_hourly", "events_stream_interval_join",
        "events_stream_sessionize", "grouping_sets_kpis", "kpi_rollup",
        "membership_semi", "merge_coalesce", "multimodal_features",
        "multimodal_frames", "null_gate", "order_kpis", "order_kpis_approx",
        "ordered_head", "priority_parse", "regional_revenue",
        "revenue_moving_avg", "ri_orphans", "scalar_json",
        "segment_price_quantiles", "text_fingerprint", "text_lang_id",
        "text_quality", "text_quality_gate", "text_rare_tokens",
        "text_stratified_sample", "text_tfidf_topk", "text_token_count",
        "text_zipf_topk", "topk_per_group", "union_by_name",
    }
)


def _ordered_names() -> list[str]:
    front = _SENTINELS + _ROTATION_R4
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names not in registry: {missing}"
    front_set = set(front)
    checked = _CHECKED_R1_R2 | set(_ROTATION_R3)
    rest_unchecked = [
        n for n in QUERIES if n not in front_set and n not in checked
    ]
    rest_checked = [
        n for n in QUERIES if n not in front_set and n in checked
    ]
    order = front + rest_unchecked + rest_checked
    assert len(order) == len(QUERIES)
    return order


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (category daily-revenue KPIs) on sf0.001."""
    return QUERIES["category_kpis"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
