#!/usr/bin/env python
"""Benchmark harness: runs every named query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is fully materialized through the `noop` sink (count() would
let Spark skip projection work); per-query wall-clock seconds are
reported plus the total.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from data_pipeline_for_e_commerce_shop_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench")
    queries = entry_mod.queries()

    # Untimed warm-up: absorb one-time session costs (executor spin-up,
    # first-job scheduling, shared codegen) so they don't land on
    # whichever query happens to run first alphabetically.
    try:
        queries["category_kpis"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        try:
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # record failures, don't abort the run
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
