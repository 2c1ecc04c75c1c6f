"""Results must not depend on parallelism.

The repo's determinism discipline (integer cents, md5-derived hashes,
percentile_disc, fixed expression order) exists so that ANY partition
count — 8 shuffle partitions here, thousands on a real cluster —
produces bit-identical results.  This is the property that makes the
sf0.01 oracle gate transfer to 100 TB: re-run a cross-section of
value-sensitive queries under a different spark.sql.shuffle.partitions
and require identical normalized rows.
"""

from __future__ import annotations

import pytest

from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES
from tests.oracle_utils import normalize

# Value-sensitive cross-section: money aggs, floating ratios, iterative
# trajectories, Arrow paths, sketches, window chains.
PROBE = [
    "category_kpis",
    "order_kpis",
    "dedup_minhash_lsh",
    "embedding_kmeans",
    "part_pagerank",
    "cogroup_reconciliation",
    "cms_heavy_hitters",
    "category_price_trend",
    "events_rate_anomaly",
    "segment_acctbal_median",
    "hll_distinct_users",
    "cms_join_size",
    "ab_test_report",
    "events_ema_recursive",
    "dedup_prefix_filter",
    "scd2_timeline_alignment",
    # round-3 additions: iterative argmax trajectory, overlapping-span
    # merge windows, position-array intersection, sqrt-share rounding
    "text_bpe_merges",
    "dedup_exact_spans",
    "text_phrase_search",
    "corpus_temperature_mix",
    "shipping_priority",
    # ordered-float-fold scoring + argmax tie-break must not depend
    # on how the token stream is partitioned
    "text_nb_classifier",
    "corpus_datacard",
    # bucket-pruned dominance: frontier membership must survive any
    # bucket/shuffle placement
    "part_skyline",
    # per-row cumulative-quota cent diffs + monthly rollup — the
    # telescoping conservation must not depend on placement
    "revenue_recognition",
    # theta/KMV estimates divide by a MAX-derived threshold — sketch
    # contents must be placement-independent
    "kmv_theta_overlap",
    # two-sided window carry: interpolation anchors must not depend
    # on grid partition boundaries
    "events_gap_interpolate",
    # modular-sum fold is the whole point: fingerprints must be
    # identical under any placement
    "table_fingerprints",
    # dim-ordered double folds from integer sufficient statistics
    "embedding_label_separation",
    # replicate means are exact ratios of weighted int sums
    "revenue_bootstrap_ci",
    # floored unit prices + matched-basket sums
    "category_price_index",
    # share² sums from floored integer ppm shares
    "category_hhi",
    # IPS values are exact ratios of matched-cents sums
    "offline_policy_ips",
    # corpus-level deg/freq ppm scores + phrase-sum ranking
    "text_rake_keywords",
    # bucketed run counting must not depend on shuffle placement
    "lineitem_encoding_advisor",
    # sessionizer window chain + integer reciprocal ranks
    "session_purchase_mrr",
    # Hamilton attribution credits ride (user, session) windows
    "events_position_attribution",
    # 64-chunk bit signatures + quarter-blocked pair join
    "media_ahash_neardup",
    # theta/rho2 from exact int64 moments; fixed-order doubles
    "ab_cuped_adjusted",
    # percentile fences + clamped exact-ratio means
    "category_winsorized_mean",
    # integer CUSUM recursion trajectory
    "events_cusum_changepoint",
    # support-pruned Jaccard top-k with full tie-break
    "itemcf_similar_parts",
    # two ppm matrix compositions with floor truncation
    "events_transition_3step",
    # ntile quartiles in both halves + full-outer cell counts
    "customer_segment_migration",
    # dim-ordered centroid-shift folds from exact per-dim sums
    "embedding_snapshot_drift",
    # power-iteration trajectory from exact integer gram sums
    "embedding_top_pc",
    # floored-integer-mean deviation sums + final double sqrt/divide
    "revenue_acf",
    # same exact-OLS recipe keyed per category
    "category_demand_slope",
    # dim-ordered double fold over exact int64 centroid differences
    "embedding_centroid_outliers",
    # K-round min-label trajectory over support-pruned edges
    "part_label_propagation",
    # min-register signatures must be placement-independent
    "minhash_union_rollup",
    # bucketed positional median + integer S/tie-variance
    "revenue_trend_robust",
    # double SSE argmin over integer prefix sums
    "revenue_best_split",
    # positional lo/hi picks + quarter-cent interpolation
    "category_quantile_bands",
    # peeling trajectory over fixed rounds
    "part_kcore",
    # Hamilton top-ups ranked on double remainders
    "neyman_allocation",
    # integer-encoded running-max argmax chain
    "revenue_max_drawdown",
    # key-ordered explained-sum folds + F ratios
    "anova_nation_priority",
    # two-hop counts with anti-join pruning
    "part_link_prediction",
    # windowed argmax picks over integer dots
    "embedding_hard_negatives",
    # consecutive-order pairing + integer lift
    "part_sequence_rules",
    # decorrelated LATERAL must equal the window top-k under any
    # placement
    "lateral_topk_suppliers",
    # variant extraction + rollup independent of placement
    "variant_props_kpis",
    # policy-replay fold trajectory per part
    "part_inventory_replay",
    # lattice marginal sums from exact ppm rates
    "events_shapley_attribution",
    # three index scans + frozen-discount integer DCG
    "ann_ndcg",
    # power-of-two decay credits + share ppm
    "events_time_decay_attribution",
    # three-tier cent floors must reconcile under any placement
    "category_price_waterfall",
    # deviation sums + final sqrt over edge-degree pairs
    "graph_assortativity",
    # per-row floored MAPE terms averaged as integers
    "forecast_backtest",
    # simulated file assignment + zone-map hits must be
    # placement-independent
    "layout_zorder_pruning_audit",
    # deterministic (ts, event_id)-ordered path slices
    "events_top_conversion_paths",
    # key-ordered chi-square term fold
    "discount_tax_independence",
    # bounded window-end explodes + distinct counts
    "events_stickiness_ratio",
    # lag-gap flags keyed on (user, type, value-cents)
    "events_double_fire_screen",
    # consecutive-order brand pairs + row-share ppm
    "brand_switch_matrix",
    # frozen-z double formula from exact integer moments
    "events_power_analysis",
    # cross-series deviation sums + final sqrt
    "error_purchase_correlation",
    # per-day argmax window + exact share
    "peak_day_drivers",
    # member-vs-rep exact Jaccard over star-contraction clusters
    "dedup_transitivity_audit",
    # own-span half-split with integer boundaries
    "part_lifecycle_stages",
    # floored-share HHI + per-customer argmax
    "customer_spend_concentration",
    # cumulative-share boundaries x cv2 boundaries must agree
    # under any placement
    "part_abc_xyz_matrix",
    # int8 dots + overlap counts vs full-precision brute
    "ann_int8_recall",
    # tie-broken min/max supplier picks + exact spread
    "part_price_consistency",
    # deadline-bounded match + per-part argmax month
    "cart_abandonment_rate",
    "part_peak_season",
    # NN argmins over dim-ordered folds + positional median
    "embedding_twonn_ratio",
    # desc running sums + positional percentile cuts
    "user_value_pareto",
    # value-sorted prefix sums + double SSE argmin
    "order_value_bimodal_split",
    # moment expansion from exact power sums
    "events_value_moments",
    # tie-broken ntile bins + margin lifts
    "price_qty_dependence_grid",
    # per-entity integer OLS classification
    "customer_value_trend",
    # collision-mass ratios across widths
    "dedup_shingle_width_sweep",
    # per-user argmax hour + share ppm
    "user_peak_hour_profile",
    # dispersion ratios over containing docs
    "text_term_burstiness",
    # two-sample z from one conditional-moment pass
    "weekend_value_ztest",
    # per-part weekly lag-1 deviation sums + final sqrt
    "part_demand_persistence_screen",
    # component membership x source cardinality
    "dedup_cross_source_rate",
    # tie-broken cheapest picks + counterfactual sums
    "procurement_savings_potential",
    # tie-broken ntile bins over double scores
    "doc_length_quality_grid",
    # dual positional deciles + mismatch ranking
    "balance_spend_mismatch",
    # sign sequence + lag-window run count over the daily series
    "revenue_runs_test",
    # integer pairwise S + tie-corrected variance per brand
    "brand_mann_kendall",
    # doubled average ranks under ties -> exact int64 moments
    "nation_spearman_bal_spend",
    # lag-ordered double fold of the 7 portmanteau terms
    "revenue_ljung_box",
    # corrected floor-sqrt must land on the identical integer
    "part_eoq_policy",
    # running-sum window over the exploded delta events
    "orders_backlog_timeline",
    # cross-multiplied treatment assignment + 4-cell double formula
    "discount_did_revenue",
    # CV^2 ratios from exact int64 moments via explicit double casts
    "brand_bullwhip_ratio",
    # term-ordered double folds + closed-form absent-mass remainder
    "text_js_source_divergence",
    # parity split + distinct-inventory anti-join
    "text_ngram_novelty",
    # cluster-blocked numpy cosine grid + priority loser picks per tau
    "dedup_semantic_sweep",
    # ppm matrix compositions with floor truncation per step
    "segment_markov_clv",
    # per-group discrete percentile picks + breach shares
    "supplier_lead_time_sla",
    # price-ordered cumulative-weight crossing pick
    "category_weighted_median_price",
    # LEAD gap buckets + running at-risk counts
    "customer_next_order_hazard",
    # centered 12-row window ratios + per-moy integer averaging
    "category_seasonality_index",
    # greedy trajectory over collected round-9 engine cosines
    "embedding_mmr_topk",
    # per-pair deviation sums + min-r argmin picks
    "brand_cannibalization_screen",
    # banded integer ratios + cross-product elasticity doubles
    "category_arc_elasticity",
    # dst-ordered entropy folds over exact transition counts
    "events_transition_entropy",
    # histogram-derived doubled ranks + tie-corrected z
    "priority_mannwhitney_leadtime",
    # packed-scalar floor-EWMA fold over month-ordered arrivals
    "part_croston_forecast",
    # term-ordered |z| folds over exact ppm moments
    "text_burrows_delta",
    # floor-ppm value-iteration trajectory over collected edges
    "events_markov_attribution",
    # per-half cumulative-share class boundaries + full-outer align
    "part_abc_migration",
    # idf-weighted set sums over LSH candidates
    "dedup_weighted_jaccard",
    # histogram ranks + key-ordered 5-term H fold
    "priority_kruskal_wallis",
    # key-ordered chi-square fold over the contingency grid
    "nation_segment_cramers_v",
    # checkpointed edge list feeding degree + wedge + closing join
    "graph_clustering_coeff",
    # key-ordered per-class entropy fold
    "customer_l_diversity",
    # exact p99 percentile_disc + max-share ratios
    "category_dp_sensitivity",
    # matched-parts period self-join + integer index ratios
    "category_fisher_index",
    # JVM levenshtein on frozen prefixes over LSH candidates
    "dedup_edit_distance",
    # per-nation key-ordered Theil folds + 1-row grand total
    "nation_theil_inequality",
    # window cumsum of exact-coefficient LLR over the day spine
    "ab_sequential_sprt",
    # md5-gated dirty derivation + block join + frozen weights
    "customer_record_linkage",
    # at-risk windowing + running hazard cumsums
    "survival_nelson_aalen",
    # shared argmax/runner-up CASE over integer lexicon scores
    "lang_margin_calibration",
    # 4-term fixed-order MI expression over exact cells
    "events_mutual_information",
    # level-wise candidate joins + support equi-joins
    "basket_triples_apriori",
    # scan-local counters + integer-scaled formula
    "text_readability",
    # selective conjunctive-range scan-aggregate
    "tpch_q6_discount_uplift",
    # disjunctive bracket predicate post-broadcast-join
    "tpch_q19_bracket_revenue",
    # integer cross-multiply threshold + anti join
    "dormant_capital_screen",
    # exact per-arm percentile_disc pivot
    "ab_quantile_effects",
    # exact ppm share deltas vs broadcast margins
    "orders_priority_mix_stability",
    # three probe depths vs brute ground truth
    "ann_ivf_nprobe_curve",
    # pooled-SD doubles from exact conditional moments
    "category_weekend_effect_size",
    # integer cross-multiplied concordance over the 300-pair grid
    "nation_kendall_tau",
    # key-ordered G-term fold over the lang x source grid
    "doc_lang_source_gtest",
    # one-scan integer moments + closed-form trend z
    "discount_return_trend",
    # paired disagreement cells over shared NB + heuristic preds
    "mcnemar_lang_classifiers",
    # integer pagerank transfers over the word adjacency graph
    "text_textrank_keywords",
    # t-ordered step-area fold over the KM curve
    "survival_rmst",
    # md5 folds + exact ppm balance grid
    "corpus_kfold_assign",
    # exact e6-quantized integer moment sums per dim
    "embedding_dim_profile",
    # five key-ordered OLS folds over the pair grid
    "trade_gravity_fit",
    # integer power-iteration floor transfers
    "events_markov_stationary",
    # two band-sample candidate sets + integer LP estimate
    "dedup_capture_recapture",
    # exact order-size moments vs broadcast global rate
    "order_return_clustering",
    # capped exposure buckets + Wilson bounds from exact counts
    "exposure_response_curve",
    # per-customer CV2 classes from exact gap moments
    "customer_regularity_classes",
    # window first-order split + span-bucket deciles
    "first_order_ltv_signal",
    # (brand, customer) distinct-order rollup + ppm census
    "brand_loyalty_rate",
    # frozen second-digit expectations + per-digit chi terms
    "orders_benford_second_digit",
    # one-rollup first-event days + single-row ppm census
    "signup_activation_rates",
    # closed-form weekday prefix function over epoch days
    "priority_business_day_leadtime",
    # (customer, day) rollup + capped census
    "same_day_multiorder",
    # dim-keyed integer dots + centroid re-search
    "ann_prf_topk",
    # per-order key-ordered entropy folds + frozen thresholds
    "basket_mission_classes",
    # exact per-category percentile_disc over customer maxima
    "category_wtp_quantiles",
    # cohort-quarter rollup + broadcast age-0 base ratios
    "cohort_revenue_retention",
    # key-ordered ln fold over the activity tail
    "user_activity_hill_alpha",
    # RANGE-frame rolling counts over epoch days
    "customer_order_velocity",
    # lag-spine equi-joins + integer sufficient statistics
    "error_conversion_xcorr",
    # capped order-size buckets of exact day sums
    "basket_size_leadtime_curve",
    # rank-indexed frozen critical values + prefix-AND window
    "category_weekend_holm",
    # wedge join + anti-join two-hop-only reach
    "part_two_hop_reach",
    # per-month integer ranks + shifted self-join rho
    "category_rank_stability",
    # volume-weighted unit cents + multi-nation spread
    "part_price_parity_by_nation",
    # first-sale rollup + capped age buckets
    "part_age_revenue_mix",
    # shared hash pass re-split at three register counts
    "hll_precision_sweep",
    # supplier-key-ordered ratio fold + closed-form ICC
    "leadtime_variance_components",
    # scalar-accumulator Erlang recursion per hour row
    "peak_hour_erlang_b",
    # month-ordered OLS folds over the aligned brand series
    "cross_price_elasticity_top2",
    # bounded month-sequence explode + exact overlap days
    "orders_monthly_wip",
    # sentence fingerprints + frequency join
    "sentence_dedup_rate",
    # per-part exact median + integer dip gate
    "part_price_dip_events",
    # frozen trig tables + hour-ordered resultant folds
    "events_hourly_rayleigh",
    # exact 5% quantile cut + tail integer means
    "revenue_cvar",
    # shared frozen trig tables + per-type ordered folds
    "event_type_circadian_concentration",
    # staged-ppm RCA ratios vs broadcast margins
    "nation_rca_matrix",
    # digit-ordered deviation fold + frozen cutoffs
    "benford_mad_conformity",
    # deterministic ranks + k-spine coverage sums
    "token_coverage_curve",
    # global rank pass + integer rank-bound picks
    "order_value_median_ci",
    # explicit multiply folds for fitted geometric masses
    "order_count_geometric_fit",
    # frozen 7-entry trig tables + day-ordered folds
    "orders_weekly_rayleigh",
    # pooled-month extremes + min-month argmax tie-break
    "category_seasonal_amplitude",
    # composed connected components + lang purity rollup
    "dedup_cluster_lang_purity",
    # rank-1/rank-2 self-join gaps + exact quantiles
    "second_purchase_latency",
    # distinct-category rollup + breadth census
    "customer_breadth_ltv",
    # unioned per-table scan-aggregates
    "key_uniqueness_audit",
    # 6-table broadcast chain + conditional cents sums
    "region_trade_locality",
    # one lag pass + three conditional break counts
    "session_gap_sweep",
    # window cumsum first-crossing + exact day quantiles
    "customer_time_to_1k",
    # bidirectional rank picks + one-row disagreement census
    "attribution_touch_disagreement",
    # round-3 batch additions —
    # ordered-fold KN scoring + continuation counts from one pass
    "text_kneser_ney_ce",
    # day-spine running sum vs duration sums — both sides must agree
    # under any placement for the conservation identity to hold
    "orders_little_law_audit",
    # additive counter cells built from partials: placement-free
    "cms_width_error_curve",
    # two SCD2 island rebuilds + two interval joins
    "scd2_bitemporal_drift",
    # merged-support cumulative CDFs + support gaps
    "events_wasserstein_drift",
    # per-dim stats fold + milli-floored Mahalanobis scores
    "embedding_mahalanobis_ood",
    # residual rank quantile + held-out coverage counts
    "order_value_conformal",
    # bit_or bitmap assembly + shift-AND streak ladder
    "user_activity_bitmaps",
    # retraction/insertion partials merged into base partials
    "kpi_retraction_refresh",
    # dense-grid cumulative EMD + staged ppm multiplier per class
    "customer_t_closeness",
    # centered-MA window + floor-double seasonal means
    "revenue_classical_decomposition",
    # md5-derived priorities + partial top-k + tau clamp
    "corpus_priority_sample",
    # key-ordered double fold of the tau-clamped weights
    "corpus_priority_sample_audit",
    # round 4: bucket-walk positional ranks/prefix sums must be
    # placement-independent (adaptive bucket bounds, offset joins)
    "customer_rfm",
    "revenue_gini",
    "part_abc_classes",
    # register-row merge trajectory (groupBy-max) + exact balls
    "part_hyperball_reach",
    # epsilon-greedy choice/regret trajectory from integer scores
    "bandit_replay_egreedy",
    # minimax PAVA doubles over exact prefix sums
    "conversion_isotonic_curve",
    # lower-median positional pick over pair-slope doubles
    "revenue_theil_sen",
    # VARIANT path extraction round-trip
    "events_variant_json",
    # round-4: Arrow int64 Gramian partials — per-batch Q^T Q sums
    # must be placement-independent (integer addition commutes)
    "embedding_covariance_exact",
    # three orderkey-co-partitioned aggs + strict-latest uniqueness
    "tpch_q21_waiting_suppliers",
    # 1-row global max + equality keep (ties) under any placement
    "tpch_q15_top_supplier",
    # exact integer charge sums + int/count ratio averages
    "tpch_q1_pricing_summary",
    # round-4 additions: frozen reciprocal-rank ppm panel over three
    # index tiers (first-relevant min must not depend on placement)
    "ann_mrr",
    # integer-ppm IPF trajectory: 4 margin aggregates + truncating
    # per-row weight updates must walk one trajectory at any layout
    "survey_raking_ipf",
    # two-level modular hash folds + node-gated leaf diff: the fold
    # is commutative so every fingerprint is placement-independent
    "orders_merkle_range_diff",
]


@pytest.mark.parametrize("name", PROBE)
def test_partition_invariance(spark, sf_dir, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    df1 = QUERIES[name](spark, sf_dir)
    _, rows1 = normalize(df1.columns, [tuple(r) for r in df1.collect()])
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        df2 = QUERIES[name](spark, sf_dir)
        _, rows2 = normalize(df2.columns, [tuple(r) for r in df2.collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert rows1 == rows2, f"{name} depends on partition count"
