#!/usr/bin/env python
"""Controlled A/B for the round-3 bench regression (VERDICT r3 item 1).

On the 70 queries common to BENCH_r02 and BENCH_r03, the round-3 bench
showed a uniform ~2.6x median slowdown.  The candidate causes are
(a) session-scale overhead — the r3 bench ran 483 queries in ONE Spark
session (catalog/codegen-cache/GC accumulation) while the r2 bench ran
~71 — or (b) real per-query regressions, or (c) box drift between the
r2 and r3 measurement days.  This script separates them same-day,
same-box, same code:

  mode=small : fresh session, time ONLY the 70 common queries
               (3 runs, median, noop sink — identical method to
               bench.py).  Replicates the r2 session shape.
  mode=large : fresh session, first materialize every OTHER registered
               query once (untimed, replicating the r3 session's
               accumulated state), then time the same 70 identically.

If small ~= r2-recorded numbers and large ~= r3-recorded numbers, the
regression is session-scale overhead and the fix belongs in bench.py
(session recycling), not in any query.  Results go to
/tmp/ab_bench_{mode}.json for comparison.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = 3


def recover_r2_times() -> dict[str, float]:
    r2 = json.load(open("/root/repo/BENCH_r02.json"))
    pairs = re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', r2["tail"])
    return {k: float(v) for k, v in pairs}


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    assert mode in ("small", "large"), mode
    sf_dir = "/root/testdata/sf0.1"

    from data_pipeline_for_e_commerce_shop_spark.session import get_spark
    import __spark_entry__ as entry_mod

    r2_times = recover_r2_times()
    r3_times = json.load(open("/root/repo/BENCH_detail.json"))["queries"]
    queries = entry_mod.queries()
    common = sorted(k for k in r2_times if k in r3_times and k in queries)
    print(f"mode={mode} common={len(common)}", file=sys.stderr)

    spark = get_spark(app_name=f"ab_bench_{mode}")

    # warm-up (same policy as bench.py)
    queries[common[0]](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    if mode == "large":
        others = [n for n in sorted(queries) if n not in set(common)]
        t0 = time.time()
        for i, name in enumerate(others):
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"state-build error {name}: {exc}", file=sys.stderr)
            if (i + 1) % 50 == 0:
                print(
                    f"state-build {i+1}/{len(others)} "
                    f"({time.time()-t0:.0f}s)",
                    file=sys.stderr,
                )
        print(f"state-build done in {time.time()-t0:.0f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in common:
        fn = queries[name]
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    med_vs_r2 = statistics.median(
        timings[k] / max(r2_times[k], 1e-9) for k in common
    )
    med_vs_r3 = statistics.median(
        timings[k] / max(r3_times[k], 1e-9) for k in common
    )
    out = {
        "mode": mode,
        "total_70": total,
        "median_ratio_vs_r2": round(med_vs_r2, 3),
        "median_ratio_vs_r3": round(med_vs_r3, 3),
        "queries": timings,
    }
    with open(f"/tmp/ab_bench_{mode}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
