#!/usr/bin/env python
"""Benchmark harness: runs every named query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is fully materialized through the `noop` sink (count() would
let Spark skip projection work).  Every query is timed N_RUNS times and
the MEDIAN is reported (per-run seconds vary ±20% on a shared box, see
BASELINE.md; medians make round-over-round comparison meaningful).

Output contract (BENCH_r02 lesson: at 154 queries the single JSON line
outgrew the driver's tail buffer and parsed as null): the final stdout
line is a COMPACT JSON — totals plus per-query medians for the headline
subset only, rounded to 2 decimals.  The full per-query medians and
max-min spreads for all queries go to BENCH_detail.json next to this
script.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time

N_RUNS = 3


def _cpu_calibration_sec() -> float:
    """Fixed single-thread CPU probe (sha256 over 512 MiB): a
    box-speed yardstick recorded with every bench run so a future
    round can separate environment drift from code regressions.
    The round-3->4 investigation (BASELINE.md) found a ~3.5x
    day-over-day shift on IDENTICAL code — without a recorded
    yardstick that read as a code regression."""
    blob = b"\x5a" * (1 << 20)
    h = hashlib.sha256()
    t0 = time.time()
    for _ in range(512):
        h.update(blob)
    return round(time.time() - t0, 4)


def _spark_calibration_sec(spark) -> float:
    """Fixed Spark probe (agg over range(2e8)): JVM+scheduler speed
    yardstick, same purpose as the CPU probe but covering codegen and
    task dispatch."""
    t0 = time.time()
    spark.range(200_000_000).selectExpr("sum(id * 3 % 7)").collect()
    return round(time.time() - t0, 4)

# Headline queries for the final JSON line: one or two representatives
# per operator family (KPIs, merge, sessionize/streaming, dedup ladder,
# ANN, text, SCD2, graph, sketches, corpus, stats).  Everything else is
# still timed and totaled — full detail in BENCH_detail.json.
HEADLINE = [
    "category_kpis",
    "order_kpis",
    "merge_coalesce",
    "null_gate",
    "ri_orphans",
    "events_hourly",
    "events_sessionize",
    "events_stream_hourly",
    "events_stream_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_tfidf_topk",
    "text_lang_id",
    "scd2_timeline_alignment",
    "part_pagerank",
    "hll_rollup",
    "cms_heavy_hitters",
    "corpus_shuffle_split",
    "recsys_negative_samples",
    "priority_parse",
    "revenue_moving_avg",
    "segment_price_quantiles",
    # round-3 flagships
    "dedup_exact_spans",
    "text_bpe_merges",
    "text_nb_classifier",
    "shipping_priority",
    "events_stream_dedup",
    "synthetic_source_kpis",
    # round-3 session-3 flagships
    "part_skyline",
    "kmv_theta_overlap",
    "revenue_recognition",
    "table_fingerprints",
    "dedup_containment_pairs",
    "session_purchase_mrr",
    # round-3 session-4 flagships
    "text_kneser_ney_ce",
    "contamination_bloom_screen",
    "scd2_bitemporal_drift",
    "events_wasserstein_drift",
    "user_activity_bitmaps",
    # round-4 flagships: bucket-walk window rewrites + new operators
    "customer_rfm",
    "price_qty_dependence_grid",
    "layout_zorder_pruning_audit",
    "part_hyperball_reach",
    "bandit_replay_egreedy",
    "conversion_isotonic_curve",
    "revenue_theil_sen",
    "events_variant_json",
    # round-5/6 flagships: sketch algebra, Delta exactly-once +
    # maintenance round trips, the salted join
    "segment_quantile_sketch_bottomk",
    "events_stream_delta_exactly_once",
    "events_delta_optimize_vacuum",
    "event_type_salted_join",
]


def _load_gate(max_wait_sec: float = 600.0) -> dict:
    """Start-load gate (VERDICT r6 item 2): the r6 driver bench ran at
    loadavg 40 on 32 CPUs and recorded 774.6 s for a tree that times
    453.2 s idle — a polluted record inverted the round's perf story.
    A bench can't refuse to produce an artifact (the driver needs one),
    so the gate (a) WAITS up to ``max_wait_sec`` for the 1-min loadavg
    to drop below 1.5x cores, then (b) stamps the artifact with a
    CLEAN/CONTAMINATED verdict so a polluted run can never again read
    as a regression record without saying so on its face."""
    cores = os.cpu_count() or 32
    threshold = 1.5 * cores
    waited = 0.0
    while os.getloadavg()[0] > threshold and waited < max_wait_sec:
        time.sleep(15.0)
        waited += 15.0
    load1 = os.getloadavg()[0]
    return {
        "cores": cores,
        "threshold": round(threshold, 1),
        "loadavg_at_gate": round(load1, 2),
        "waited_sec": waited,
        "verdict": "CLEAN" if load1 <= threshold else "CONTAMINATED",
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    gate = _load_gate()

    from data_pipeline_for_e_commerce_shop_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench")
    queries = entry_mod.queries()

    # Session-shape + box-speed record (VERDICT r3 item 7): enough
    # context for round-over-round comparison without re-deriving it.
    # Key facts the r3->r4 A/B established: (a) one warmed session
    # over the full registry is FASTER per query than a fresh small
    # session (JVM JIT dominates; ~1.4x at 70 queries), so single-
    # session timing stands; (b) the box itself moved ~3.5x between
    # round records — normalize cross-round ratios by calibration.
    session_meta = {
        "load_gate": gate,
        "n_registered": len(queries),
        "timing": f"median of {N_RUNS} back-to-back runs per query,"
                  " single shared session, queries in sorted-name order;"
                  " cache/checkpoint blocks released AND idle Python"
                  " workers reaped between queries (outside timed"
                  " regions, r7+r8 measurement fixes)",
        "loadavg_start": list(os.getloadavg()),
        "cpu_calibration_sec_start": _cpu_calibration_sec(),
        "spark_calibration_sec": _spark_calibration_sec(spark),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # WindowExec "No Partition Defined" warnings in the log are
        # PLAN-TIME and fire regardless of input size; every remaining
        # unpartitioned-window site runs over a bounded domain
        # (calendar days/months, vocabulary, category/decile cells —
        # audited in BASELINE.md round 4). Row-scale global windows
        # were eliminated in round 4 (bucket-walk plans).
        "window_warnings": "bounded-domain only; row-scale global"
                           " windows eliminated r4 (see BASELINE.md)",
    }

    # Untimed warm-up: absorb one-time session costs (executor spin-up,
    # first-job scheduling, shared codegen) so they don't land on
    # whichever query happens to run first.  Uses the first available
    # query rather than a hardcoded name; a failed warm-up is reported,
    # not swallowed.
    warm = next(iter(sorted(queries)))
    try:
        queries[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:
        print(f"bench warm-up ({warm}) failed: {exc}", file=sys.stderr)

    def _release_blocks() -> None:
        """Drop cache/checkpoint blocks left behind by the previous
        query, OUTSIDE any timed region (round-7 measurement fix,
        declared in OPTIMIZATION_r07.md): localCheckpoint/persist
        blocks are only freed when the JVM RDD is GC'd, so a 516-query
        single-session sweep accumulates storage debris — the r7-close
        bench showed one query's leftovers inflating the next queries
        in sorted order up to 8x (survey_raking_ipf -> survival_*) and
        inverting solo-vs-session conclusions (part_sequence_rules).
        Releasing between queries makes each query's timing independent
        of sweep order and kills accidental cross-query cache reuse
        (two queries persisting the same logical subplan would
        otherwise share one cache entry — result caching the bench
        must not do).  Within a query, the N_RUNS back-to-back runs
        are untouched."""
        try:
            spark.catalog.clearCache()
            jrdds = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in jrdds.values():
                jrdd.unpersist(False)
        except Exception as exc:  # never let cleanup kill the bench
            print(f"bench cleanup warning: {exc}", file=sys.stderr)
        # Reap IDLE Python workers (round-8 measurement fix, VERDICT r7
        # item 1): with spark.python.worker.reuse=true (the default),
        # released workers sit in PythonWorkerFactory.idleWorkers
        # forever, each holding the RSS of whatever Arrow/pandas query
        # last ran in it.  Over a 516-query sweep that debris produced
        # episodic sorted-name windows timing 2.5-8x their solo values
        # right after Python-boundary queries (r7 close:
        # dedup_incremental 2.72 in-session vs 1.04 solo).  Stopping
        # only the IDLE workers between queries — the daemon survives,
        # so the next Python query pays a ~ms fork, not an interpreter
        # start — frees that memory outside every timed region.  No
        # public API exposes the factory map; the reflection below is
        # bench-harness-only code and degrades to a warning if the
        # internals move.
        try:
            gw = spark.sparkContext._gateway
            jvm = spark.sparkContext._jvm
            no_cls = gw.new_array(jvm.java.lang.Class, 0)
            no_arg = gw.new_array(jvm.java.lang.Object, 0)
            env = jvm.org.apache.spark.SparkEnv.get()
            m = env.getClass().getDeclaredMethod("pythonWorkers", no_cls)
            m.setAccessible(True)
            fit = m.invoke(env, no_arg).valuesIterator()
            while fit.hasNext():
                fac = fit.next()
                qm = fac.getClass().getDeclaredMethod(
                    "idleWorkers", no_cls
                )
                qm.setAccessible(True)
                q = qm.invoke(fac, no_arg)
                while not q.isEmpty():
                    fac.stopWorker(q.dequeue())
        except Exception as exc:  # never let cleanup kill the bench
            print(f"bench worker-reap warning: {exc}", file=sys.stderr)
        # Drive the ContextCleaner (round-8, same measurement fix):
        # shuffle files and broadcast blocks are deleted only when the
        # JVM garbage-collects the referencing ShuffleDependency /
        # Broadcast — on an 8g driver heap that runs tiny queries, GC
        # is rare, so a 516-query sweep accumulates GBs of shuffle
        # files in local dirs (disk + page-cache pressure that shows
        # up as episodic 1.5-2x windows mid-sweep).  An explicit GC
        # between queries (outside every timed region) keeps the
        # cleaner current; ~0.1 s per query of untimed overhead.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception as exc:
            print(f"bench gc warning: {exc}", file=sys.stderr)

    def _time_query(fn) -> list[float]:
        runs = []
        for _ in range(N_RUNS):
            # fn() is INSIDE the timed region: for batch queries it
            # only builds the plan (sub-ms), but streaming queries
            # run their availableNow drain there — excluding it
            # would under-report every streaming query as ~0.
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        _release_blocks()
        return runs

    raw_runs: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in sorted(queries):
        try:
            runs = _time_query(queries[name])
            raw_runs[name] = runs
            timings[name] = round(statistics.median(runs), 3)
            spread[name] = round(max(runs) - min(runs), 3)
        except Exception as exc:  # record failures, don't abort the run
            timings[name] = -1.0
            spread[name] = 0.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    # Worst-spread retry (VERDICT r6 item 2): a transient load spike
    # shows up as a large max-min spread; re-time those queries after
    # the main sweep (box presumably quieter) and report the median of
    # ALL runs — unbiased (no min-picking), spike-resistant (6 samples
    # swamp one polluted window).  Bounded to the 12 worst offenders.
    retry = sorted(
        (n for n in raw_runs if spread[n] > max(0.5, timings[n])),
        key=lambda n: -spread[n],
    )[:12]
    retried: dict[str, dict] = {}
    for name in retry:
        try:
            more = _time_query(queries[name])
        except Exception as exc:
            print(f"bench retry error in {name}: {exc}", file=sys.stderr)
            continue
        all_runs = raw_runs[name] + more
        retried[name] = {
            "first_median": timings[name],
            "retry_median": round(statistics.median(more), 3),
        }
        timings[name] = round(statistics.median(all_runs), 3)
        spread[name] = round(max(all_runs) - min(all_runs), 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    n_fail = sum(1 for t in timings.values() if t < 0)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    session_meta["loadavg_end"] = list(os.getloadavg())
    session_meta["cpu_calibration_sec_end"] = _cpu_calibration_sec()
    session_meta["retried_worst_spread"] = retried
    if (
        gate["verdict"] == "CLEAN"
        and os.getloadavg()[0] > gate["threshold"]
    ):
        # external load arrived mid-run: the start gate passed but the
        # record may still be polluted — say so on the artifact's face
        gate["verdict"] = "CONTAMINATED_END"
        gate["loadavg_at_end"] = round(os.getloadavg()[0], 2)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_detail.json")
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "runs_per_query": N_RUNS,
                "n_queries": len(timings),
                "n_failed": n_fail,
                "session": session_meta,
                "queries": timings,
                "spread": spread,
            },
            f,
            indent=1,
        )

    headline = {
        k: round(timings[k], 2) for k in HEADLINE if k in timings
    }
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": headline,
                "sf": sf_val,
                "n_queries": len(timings),
                "n_failed": n_fail,
                "runs_per_query": N_RUNS,
                "load_gate": gate["verdict"],
                "detail": "BENCH_detail.json",
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
