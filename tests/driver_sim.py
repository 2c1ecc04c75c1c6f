"""Driver simulation: run EVERY registered query against its oracle at
sf0.01 through the pandas-typed comparison (tests/oracle_utils.py) and
write a CORRECTNESS-shaped artifact.

Usage: python -m tests.driver_sim [sf_dir] [out_json]

This is the pre-rotation audit VERDICT r2 item 5 asked for: the driver
only checks the first 50 registered queries per round, so this catches
type-coercion mismatches (HUGEINT->float64, nullable-int->float64,
date-vs-timestamp) across the whole registry before rotation exposes
them to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "SELFCHECK.json"

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipeline_for_e_commerce_shop_spark.queries import ORACLES, QUERIES
    from tests.oracle_utils import compare_query, diff_query

    # VERDICT r3 item 5: on any mismatch, persist an inspectable
    # spark-vs-oracle row diff — this sim is the only signal for the
    # queries outside the driver's 50-per-round window, so its
    # evidence must be reviewable, not just a one-line assert.
    diff_dir = os.path.join(os.path.dirname(out) or ".", "SELFCHECK_diffs")

    def _write_diff(name: str, fn) -> None:
        try:
            d = diff_query(spark, fn, ORACLES[name], sf_dir)
            if d is not None:
                os.makedirs(diff_dir, exist_ok=True)
                with open(os.path.join(diff_dir, f"{name}.json"), "w") as f:
                    json.dump(d, f, indent=1)
        except Exception:  # noqa: BLE001 — diff capture is best-effort
            traceback.print_exc()

    results: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in QUERIES.items():
        t0 = time.time()
        rec: dict = {"ok": None, "sec": None, "err": None}
        try:
            if name in ORACLES:
                compare_query(spark, fn, ORACLES[name], sf_dir)
                rec["ok"] = True
            else:
                n = fn(spark, sf_dir).count()
                rec["ok"] = True
                rec["err"] = f"no_oracle rows={n}"
        except AssertionError as e:
            rec["ok"] = False
            rec["err"] = str(e)[:500]
            _write_diff(name, fn)
        except Exception as e:  # noqa: BLE001 — audit must not abort
            rec["ok"] = False
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            traceback.print_exc()
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        status = "ok" if rec["ok"] else "FAIL"
        print(f"{status:4s} {rec['sec']:7.2f}s {name}", flush=True)

    n_ok = sum(1 for r in results.values() if r["ok"])
    # Engine-version stamp (VERDICT r5 item 7): BOTH round-5 driver
    # reds were DuckDB/Spark VERSION-semantics divergences (DECIMAL
    # literal parsing, // floor-vs-truncate) — recording the engine
    # pair that produced a green sim makes the next version-class
    # divergence diagnosable from artifacts alone.
    import duckdb as _duckdb
    import pyspark as _pyspark

    rows_only = sorted(n for n in QUERIES if n not in ORACLES)
    summary = {
        "sf_dir": sf_dir,
        "engines": {
            "duckdb": _duckdb.__version__,
            "pyspark": _pyspark.__version__,
            "spark_jvm": spark.version,
        },
        "n_queries": len(results),
        "n_ok": n_ok,
        "n_fail": len(results) - n_ok,
        # queries with NO DuckDB-expressible oracle, checked rows-only
        # by contract (VERDICT r5 item 3: make the registry-vs-oracle
        # count difference self-documenting)
        "rows_only_by_contract": rows_only,
        "total_sec": round(time.time() - t_all, 1),
        "results": results,
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{n_ok}/{len(results)} ok -> {out}", flush=True)
    spark.stop()
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
