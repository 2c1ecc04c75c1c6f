#!/usr/bin/env python
"""Round-7 per-query oracle check: exactly the driver's gate (Spark vs
DuckDB, normalized rows + schema) for a NAMED subset, at sf0.01 by
default.  Used after every optimization to prove the rewrite computes
the identical result before it is committed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]

    import __spark_entry__ as e
    from data_pipeline_for_e_commerce_shop_spark.session import get_spark
    from tests.oracle_utils import run_oracle, normalize

    spark = get_spark(app_name="opt_oracle")
    oracles = e.oracle_sql()
    queries = e.queries()
    bad = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only by contract)", file=sys.stderr)
            continue
        sdf = queries[name](spark, sf)
        _, sn = normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
        o_cols, o_rows = run_oracle(oracles[name], sf)
        _, on = normalize(o_cols, o_rows)
        ok = sn == on and sorted(sdf.columns) == sorted(o_cols)
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(sn)} rows)", file=sys.stderr)
        if not ok:
            bad.append(name)
    print("MISMATCH:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
