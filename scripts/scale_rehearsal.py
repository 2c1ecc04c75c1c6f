"""Scale rehearsal: replicate the sf0.1 tables R times with
FK-consistent key offsets into a scratch directory, then run a query
subset at the inflated scale and record per-query times.

Purpose (round 4): EVIDENCE for the 100 TB design claims — the local
bench at sf0.1 shows plans are fast at test scale, but the charter's
real question is whether they survive a scale-up.  Running the
headline set at 10x (effective sf1, ~6M lineitem rows) checks:

- no int64 overflow in the exact-cents aggregates (ANSI mode would
  fail loudly);
- no single-partition stage blows up (the bucket-walk windows and
  broadcast thresholds hold);
- runtime scales ~linearly (shuffle-bound plans scale with data, not
  with pair cardinality).

Replication is FK-consistent: replica r offsets every orderkey /
custkey / partkey / suppkey / event_id / user_id / doc_id / vec_id by
r * STRIDE on BOTH sides of each relationship, so join cardinalities
scale exactly linearly.  nation/region stay fixed (constant dims at
any SF, matching TPC-H semantics).  Document text gets a per-replica
suffix so content-level dedup stays realistic instead of degenerating
into R-way exact duplicates.

Usage:
    python scripts/scale_rehearsal.py [R] [src_sf_dir] [out_dir] [stride]
    # defaults: R=10, /root/testdata/sf0.1, /tmp/scale_rehearsal/sf1,
    # stride=1e9.  Rehearsals compose: replicating the sf1 output
    # another 10x with stride=1e13 gives a collision-free effective
    # sf10 (its ids already span ~1e10).

Scratch output only — never writes to /root/testdata.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

# Import the box-speed yardstick at module load, BEFORE the
# multi-minute rehearsal loop: a repo-root-not-on-sys.path problem
# must fail fast, not discard the run's timings at the end (ADVICE
# r4).  `python scripts/scale_rehearsal.py` puts scripts/ first on
# sys.path, so add the repo root explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _cpu_calibration_sec  # noqa: E402

STRIDE = 1_000_000_000

# keys to offset per table (column -> applies in every table listed)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]

# Headline subset that exercises every operator family but skips the
# streaming drains (availableNow floor dominates, nothing to learn)
# and keeps the content-pair families to their blocked variants.
REHEARSAL = [
    "category_kpis",
    "order_kpis",
    "merge_coalesce",
    "ri_orphans",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "text_tfidf_topk",
    "text_lang_id",
    "scd2_timeline_alignment",
    "part_pagerank",
    "hll_rollup",
    "cms_heavy_hitters",
    "corpus_shuffle_split",
    "revenue_moving_avg",
    "customer_rfm",
    "price_qty_dependence_grid",
    "part_abc_classes",
    "revenue_gini",
    "user_value_pareto",
    "embedding_covariance_exact",
    "tpch_q1_pricing_summary",
    "tpch_q3_unshipped_topk",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q13_order_count_distribution",
    "tpch_q18_large_volume_customers",
    "tpch_q21_waiting_suppliers",
    "contamination_bloom_screen",
    "basket_rules",
    "revenue_recognition",
    "table_fingerprints",
    # round-4 additions (label-MRR panel, integer-ppm IPF raking)
    "ann_mrr",
    "survey_raking_ipf",
]

# Extension subset (mode "ext-only"): broadens the 100x evidence to
# the families the core 34 don't touch — iterative graph, LM text,
# span/simhash/semantic dedup, Arrow stateful sessionization, SCD2
# incremental apply, conformal intervals, sketch algebra, corpus
# selection, k-anonymity, and the merkle reconciliation.
REHEARSAL_EXT = [
    "part_kcore",
    "part_label_propagation",
    "part_triangles",
    "part_degree_profile",
    "text_kneser_ney_ce",
    "text_bpe_merges",
    "text_bm25_topk",
    "dedup_exact_spans",
    "dedup_simhash",
    "dedup_semantic",
    "events_attribution",
    "events_stateful_sessionize",
    "events_funnel",
    "scd2_incremental_apply",
    "order_value_conformal",
    "itemcf_similar_parts",
    "kmv_theta_overlap",
    "minhash_union_rollup",
    "corpus_budget_selection",
    "corpus_stratified_split",
    "customer_k_anonymity",
    "orders_merkle_range_diff",
]

# Third subset (mode "ext2-only"): the families still unproven at
# 100x — the TPC-H remainder, attribution ladder, Arrow UDF paths
# (grouped-agg median, mapInPandas features), one streaming rep, and
# the queries whose reuse caches were converted this round.
REHEARSAL_EXT2 = [
    "tpch_q4_priority_late_lines",
    "tpch_q7_nation_volume_shipping",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q19_bracket_revenue",
    "tpch_q22_dormant_customers",
    "ab_test_report",
    "ab_logrank",
    "events_markov_attribution",
    "events_shapley_attribution",
    "hll_rolling_users",
    "segment_acctbal_median",
    "multimodal_features",
    "events_stream_hourly",
    "text_textrank_keywords",
    "dedup_winnow_pairs",
    "lineitem_price_equidepth",
    "part_skyline",
    "order_value_median_ci",
    "customer_record_linkage",
    "fiscal_445_rollup",
]

# Round-5 subset (mode "r5-only"): the three near-dup ops whose block
# geometry became data-derived this round (r4 VERDICT item 3 — the
# "done" test is that their 100x time ratios leave the ~280-330x
# superlinear band), their sweep twin, and the co-purchase graph
# family under re-measure for item 7 (incl. graph_assortativity's
# 1.8x probe-normalized r4 regression).
REHEARSAL_R5 = [
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "dedup_semantic_sweep",
    "part_degree_profile",
    "part_kcore",
    "part_label_propagation",
    "part_pagerank",
    "graph_assortativity",
]


# Round-6 subset (mode "r6-only"): the operators this round changed
# or added — the rewritten dedup family (metadata-literal geometry,
# packed votes, self-join pairs), the string-expression random
# projection, the salted join, and the Delta maintenance round trip.
REHEARSAL_R6 = [
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "dedup_semantic_sweep",
    "dedup_simhash",
    "embedding_random_projection",
    "event_type_salted_join",
    "event_type_salted_kpis",
    "events_delta_optimize_vacuum",
    "events_stream_delta_exactly_once",
]


# Round-6 window subset (mode "r6window-only"): the driver-window
# names never previously rehearsed at sf10 — the hard-signal queries
# deserve the scale proof most.
REHEARSAL_R6_WINDOW = [
    "null_gate",
    "segment_quantile_sketch_bottomk",
    "tpch_q6_discount_uplift",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "kpi_incremental_refresh",
    "kpi_retraction_refresh",
    "part_inventory_replay",
    "events_markov_stationary",
    "segment_markov_clv",
    "forecast_seasonal_naive",
    "forecast_backtest",
    "monthly_status_pivot",
    "time_to_conversion",
    "text_bigram_topk",
    "text_repetition",
    "text_chunks",
    "embedding_quantize",
    "price_outliers",
    "funnel_ordered",
]


# Round-6 sweep (mode "r6sweep-only"): the 40 never-rehearsed
# registry queries with the LARGEST sf0.1 bench medians — the
# likeliest hiding places for a scale cliff.
REHEARSAL_R6_SWEEP = [
    "part_hyperball_reach",
    "revenue_theil_sen",
    "basket_triples_apriori",
    "revenue_trend_robust",
    "ann_ivf_nprobe_curve",
    "layout_zorder_pruning_audit",
    "revenue_bootstrap_ci",
    "graph_clustering_coeff",
    "part_two_hop_reach",
    "embedding_twonn_ratio",
    "category_winsorized_mean",
    "part_sequence_rules",
    "doc_trigram_lang_outliers",
    "embedding_hubness",
    "dedup_transitivity_audit",
    "fk_inclusion_audit",
    "part_link_prediction",
    "lineitem_encoding_advisor",
    "brand_cannibalization_screen",
    "order_complexity_profile",
    "dedup_prefix_filter",
    "dedup_length_bias",
    "corpus_gate_verdicts",
    "ann_pq_topk",
    "brand_switch_matrix",
    "bloom_prune_orders",
    "dedup_edit_distance",
    "doc_length_quality_grid",
    "ann_ndcg",
    "corpus_pipeline_funnel",
    "category_wtp_quantiles",
    "category_price_index",
    "dedup_weighted_jaccard",
    "order_value_qq_shift",
    "ann_recall",
    "category_weighted_median_price",
    "brand_loyalty_rate",
    "dedup_cross_source_rate",
    "basket_mission_classes",
    "shipment_consolidation",
]


# Round-8 subset (mode "r8-only"): the round-7 structural rewrites
# whose 100 TB claims the r7 verdict asked to re-prove at sf10
# (VERDICT r7 item 3) — graph family shared-basket pass, driver-fold
# model queries (raking, markov), survival cells, day-pair fan-outs,
# the one-pass zorder rank, the one-candidate-pass bloom screen, and
# the fused positional walks.  Run at 8 AND 32 cores for the scaling
# table.
REHEARSAL_R8 = [
    "part_pagerank",
    "graph_assortativity",
    "part_degree_profile",
    "itemcf_similar_parts",
    "survey_raking_ipf",
    "events_markov_stationary",
    "survival_km",
    "ab_logrank",
    "revenue_theil_sen",
    "revenue_trend_robust",
    "layout_zorder_pruning_audit",
    "contamination_bloom_screen",
    "customer_rfm",
    "price_qty_dependence_grid",
    "fk_inclusion_audit",
    "revenue_bootstrap_ci",
]


# Round-6 subset (mode "stream-only"): ALL streaming consumers, with
# per-query RESULT ROW COUNTS recorded alongside times.  VERDICT r5
# item 8: the round-5 dir-in-dir staging bug meant every earlier sf10
# streaming number was a vacuous zero-batch drain, so nonzero drained
# output is part of the recorded evidence, not just the time.
REHEARSAL_STREAM = [
    "events_stream_hourly",
    "events_stream_sessionize",
    "events_stream_interval_join",
    "events_stream_enriched",
    "events_stream_dedup",
    "events_stream_delta_exactly_once",
    "events_stream_hourly_topk",
    "events_stream_value_moments",
    "events_stream_drift_chi2",
    "events_stream_hll_users",
    "events_stream_cms_users",
    "events_stateful_sessionize",
    "events_stateful_totals",
    "stream_source_kpis",
    "synthetic_source_kpis",
    "events_backfill_hourly",
]


def replicate(
    spark, src: str, out: str, r_factor: int, stride: int = STRIDE
) -> None:
    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    for t, keys in OFFSETS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        reps = []
        for r in range(r_factor):
            rep = df
            for k in keys:
                rep = rep.withColumn(
                    k, F.col(k) + F.lit(r * stride).cast("long")
                )
            if t == "documents" and r > 0:
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{r}"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(3))
            reps.append(rep)
        u = reps[0]
        for rep in reps[1:]:
            u = u.unionByName(rep)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> int:
    r_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/tmp/scale_rehearsal/sf1"
    )
    stride = int(float(sys.argv[4])) if len(sys.argv) > 4 else STRIDE
    mode = sys.argv[5] if len(sys.argv) > 5 else "full"
    known_modes = ("full", "replicate-only", "ext-only", "ext2-only",
                   "r5-only", "stream-only", "r6-only", "r6window-only",
                   "r6sweep-only", "r8-only")
    if mode not in known_modes:
        raise SystemExit(
            f"unknown mode {mode!r}; expected one of {known_modes}"
        )

    from data_pipeline_for_e_commerce_shop_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # Replicate ONLY in the modes that build data; any "*-only" query
    # mode must never write into the directory it is reading (a
    # src==out self-overwrite truncates tables mid-read).
    if mode in ("full", "replicate-only"):
        if src == out:
            raise SystemExit("refusing to replicate src onto itself")
        t0 = time.time()
        replicate(spark, src, out, r_factor, stride)
        print(f"replicated x{r_factor} -> {out} in {time.time()-t0:.0f}s")
    if mode == "replicate-only":
        return 0
    rehearsal = {
        "ext-only": REHEARSAL_EXT,
        "ext2-only": REHEARSAL_EXT2,
        "r5-only": REHEARSAL_R5,
        "stream-only": REHEARSAL_STREAM,
        "r6-only": REHEARSAL_R6,
        "r6window-only": REHEARSAL_R6_WINDOW,
        "r6sweep-only": REHEARSAL_R6_SWEEP,
        "r8-only": REHEARSAL_R8,
    }.get(mode, REHEARSAL)

    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    failed: dict[str, str] = {}
    import gc

    for name in rehearsal:
        if name not in QUERIES:
            # environment-gated registration (e.g. events_stateful_totals
            # needs protobuf) — record the skip, keep the run alive
            failed[name] = "not registered in this environment (gated)"
            print(f"{name}: SKIP (env-gated)")
            continue
        fn = QUERIES[name]
        t0 = time.time()
        try:
            n_rows = fn(spark, out).count()
            timings[name] = round(time.time() - t0, 2)
            rows[name] = n_rows
        except Exception as ex:  # noqa: BLE001 — record, keep going
            failed[name] = str(ex)[:200]
        # Release the query's localCheckpoint RDD storage before the
        # next one: at 10x the per-query caches are GBs each, and a
        # 34-query shared session accumulates them into a single-box
        # OOM (the first sf10 run died exactly this way).  Dropping
        # the Python refs + gc lets Spark's ContextCleaner unpersist;
        # clearCache handles anything SQL-cached.
        del fn
        gc.collect()
        spark.catalog.clearCache()
        print(
            f"{name}: {timings.get(name, 'FAIL')}"
            + (f" ({failed[name]})" if name in failed else "")
        )
    # Box-speed yardstick (same probe as bench.py) so rehearsal
    # records are comparable across rounds/boxes; imported at module
    # top so a path problem fails before the loop, not after it.
    print(
        json.dumps(
            {
                "r_factor": r_factor,
                "sf_dir": out,
                "driver_mem": os.environ.get(
                    "SPARK_GRAFT_DRIVER_MEM", "8g"
                ),
                "total_sec": round(sum(timings.values()), 1),
                "n_ok": len(timings),
                "n_fail": len(failed),
                "cpu_calibration_sec_end": _cpu_calibration_sec(),
                "loadavg_end": list(os.getloadavg()),
                "timings": timings,
                "result_rows": rows,
                "failed": failed,
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
