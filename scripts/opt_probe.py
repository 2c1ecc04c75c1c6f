#!/usr/bin/env python
"""Round-7 optimization probe: time a NAMED subset of queries with the
exact bench.py methodology (noop sink, median of N back-to-back runs,
single warmed session) and optionally capture their formatted plans to
plans/r07/<name>_<tag>.txt.

Why not bench.py: a full 516-query sweep costs ~8-13 min; the
optimization loop (guide §1.6 "re-measure after each change") needs a
~30 s cycle on the 1-5 queries under the knife.  Methodology is kept
IDENTICAL (plan build inside the timed region, noop materialization,
median) so numbers are comparable to BENCH_detail.json rows.

Usage:
  python scripts/opt_probe.py [--runs N] [--plans TAG] [--sf DIR] name...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="plan file tag (e.g. before/after)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from data_pipeline_for_e_commerce_shop_spark.session import get_spark
    from data_pipeline_for_e_commerce_shop_spark.plans.inspect import physical_plan
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="opt_probe")
    queries = entry_mod.queries()
    unknown = [n for n in args.names if n not in queries]
    assert not unknown, f"unknown queries: {unknown}"

    # Warm-up: absorb executor spin-up / first-job scheduling so the
    # first timed query is comparable to a mid-bench reading.
    spark.range(10_000_000).selectExpr("sum(id % 13)").collect()
    queries[args.names[0]](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
                            os.environ.get("SPARK_GRAFT_PLAN_DIR", "r08"))
    results: dict[str, float] = {}
    for name in args.names:
        fn = queries[name]
        if args.plans:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(physical_plan(df))
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        # bench.py parity (r7 measurement fix): release cache/checkpoint
        # blocks between queries, outside the timed regions.
        try:
            spark.catalog.clearCache()
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
        except Exception as exc:
            print(f"probe cleanup warning: {exc}", file=sys.stderr)
        # bench.py parity (r8 measurement fix): reap IDLE Python
        # workers between queries so Arrow/pandas worker debris from
        # one query never inflates the next (the daemon survives).
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
                qm = fac.getClass().getDeclaredMethod("idleWorkers", no_cls)
                qm.setAccessible(True)
                q = qm.invoke(fac, no_arg)
                while not q.isEmpty():
                    fac.stopWorker(q.dequeue())
        except Exception as exc:
            print(f"probe worker-reap warning: {exc}", file=sys.stderr)
        # bench.py parity: drive the ContextCleaner so shuffle files /
        # broadcasts from the previous query are actually deleted.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception as exc:
            print(f"probe gc warning: {exc}", file=sys.stderr)
        results[name] = round(statistics.median(runs), 3)
        print(f"{name}: median {results[name]}  runs {[round(r,3) for r in runs]}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "runs": args.runs, "queries": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
