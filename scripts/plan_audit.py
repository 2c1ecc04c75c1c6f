#!/usr/bin/env python
"""Round-7 registry-wide plan audit: build every query's physical plan
(plan build only — no noop execution; eager checkpoints inside fn()
still run their bounded jobs) and count the shapes the optimization
guide says to hunt: duplicate fact-table scans, Exchange count,
Python-boundary nodes, cartesians.  Output: one JSON line per query to
stdout, worst offenders summarized to stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = ["lineitem", "orders", "events", "docs", "embeddings"]


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:]

    from data_pipeline_for_e_commerce_shop_spark.session import get_spark
    from data_pipeline_for_e_commerce_shop_spark.plans.inspect import (
        physical_plan,
    )
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="plan_audit")
    queries = entry_mod.queries()
    names = only or sorted(queries)
    rows = []
    for name in names:
        if name.startswith(("events_stream", "stream_", "synthetic_")):
            continue  # streaming drains run real work at build time
        t0 = time.time()
        try:
            df = queries[name](spark, sf)
            plan = physical_plan(df)
        except Exception as exc:
            print(f"{name}: PLAN ERROR {exc}", file=sys.stderr)
            continue
        locs: dict[str, int] = {}
        for m in re.findall(r"Location: \S+ \[?(\S+?)[\],]", plan):
            base = m.rsplit("/", 1)[-1]
            locs[base] = locs.get(base, 0) + 1
        rec = {
            "name": name,
            "build_sec": round(time.time() - t0, 2),
            "exchanges": plan.count("Exchange"),
            "existing_rdd": plan.count("ExistingRDD"),
            "in_memory": plan.count("InMemoryTableScan"),
            "py": plan.count("EvalPython"),
            "nlj": plan.count("CartesianProduct")
            + plan.count("BroadcastNestedLoopJoin"),
            "scans": locs,
        }
        rows.append(rec)
        # release anything fn() checkpointed at build time
        try:
            spark.catalog.clearCache()
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
        except Exception:
            pass
    print(json.dumps(rows))
    multi = [r for r in rows if r["scans"] and max(r["scans"].values()) >= 2]
    multi.sort(key=lambda r: -max(r["scans"].values()))
    print(f"\n== {len(multi)} queries with a source scanned >=2x ==",
          file=sys.stderr)
    for r in multi[:80]:
        tags = " ".join(
            f"{k}x{v}" for k, v in r["scans"].items() if v >= 2
        )
        print(f"{r['name']:44s} {tags}  exch={r['exchanges']}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
