"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, then
compares row count, column names, and order-insensitive values.  Used by
tests/test_oracle_parity.py so every queries() entry is validated here
before the driver ever sees it.

Type fidelity (CORRECTNESS_r02 lesson): the driver materializes the
oracle result through pandas, where DuckDB HUGEINT (e.g. a windowed
integer SUM) becomes float64 — hashing ``2.0`` against Spark's ``2``.
This replica therefore (a) fetches the oracle via ``fetchdf()`` (the
same pandas coercion path) and (b) tags numbers by int/float class in
``_norm`` so Python's ``2.0 == 2`` cannot mask the divergence the way
``fetchall()`` + untyped tuples did in rounds 1–2.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from data_pipeline_for_e_commerce_shop_spark.schemas import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str):
    """Execute oracle SQL and return (cols, rows) THROUGH pandas,
    mirroring the driver's type-coercion path (HUGEINT -> float64,
    nullable ints -> float64, DATE -> datetime64)."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    df = con.execute(sql).fetchdf()
    con.close()
    cols = list(df.columns)
    rows = list(df.itertuples(index=False, name=None))
    return cols, rows


def _norm(v):
    # Missing-value umbrella: None, NaT; float NaN is tagged below so a
    # NaN float column still differs from a NULL int column.
    if v is None or v is pd.NaT:
        return None
    # numpy scalars (pandas itertuples) -> python scalars, class kept.
    if isinstance(v, np.bool_):
        v = bool(v)
    elif isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, Decimal):
        # Spark DecimalType rows (a bare 1000.0 literal in spark.sql
        # is DECIMAL) hash differently from the oracle's doubles in
        # the driver — the r4 ema/holt driver-red root cause, masked
        # here when Decimal was coerced to float.  Tag distinctly so
        # the divergence is locally visible; queries must cast to
        # DOUBLE (e.g. a 100.0D literal) on the Spark side.
        return ("dec", str(v.normalize()))
    if isinstance(v, bool):  # before int: bool subclasses int
        return v
    if isinstance(v, float):
        if math.isnan(v):
            # NULL in a double column arrives as None from Spark's
            # collect() but NaN from DuckDB's fetchdf(); the driver
            # equates them (NULL-bearing double queries were green in
            # CORRECTNESS_r02), so the gate does too.
            return None
        # Class-tagged so 2.0 (float) != 2 (int) — the driver hashes
        # these differently even though Python's == does not.  FULL
        # precision (r4 VERDICT item 4): the driver hashes raw doubles,
        # so rounding here could hide sub-1e-9 engine divergence the
        # driver would flag.
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime):
        # DuckDB DATE arrives as midnight datetime64 via pandas while
        # Spark yields datetime.date; the driver tolerates this pair
        # (date-projecting queries are green), so canonicalize.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def normalize(cols, rows):
    """Sort columns by name, normalize values, sort rows.

    Column-level int->float coercion: pandas stores a NULL-bearing
    integer column as float64, so the driver sees ``6.0`` wherever that
    column holds 6 — on BOTH engines, since the null pattern is data.
    Mimic it: any column containing a missing value has its ints
    re-tagged as floats.  A column that is float on ONE side only (the
    HUGEINT case — no nulls needed) still mismatches, which is the bug
    class this gate exists to catch.
    """
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    n = len(order)
    has_null = [any(r[j] is None for r in out) for j in range(n)]
    if any(has_null):
        out = [
            tuple(
                ("f", float(v[1]))
                if has_null[j] and isinstance(v, tuple) and v[0] == "i"
                else v
                for j, v in enumerate(r)
            )
            for r in out
        ]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def compare_query(spark, query_fn, oracle: str, sf_dir: str):
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    _, sn = normalize(s_cols, s_rows)
    _, on = normalize(o_cols, o_rows)
    mismatches = [
        (a, b) for a, b in zip(sn, on) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"


def diff_query(spark, query_fn, oracle: str, sf_dir: str) -> dict | None:
    """Inspectable spark-vs-oracle diff (VERDICT r3 item 5): the same
    comparison as :func:`compare_query`, but instead of asserting it
    returns None on match or a JSON-serializable dict with the sorted
    column order and the first 20 differing normalized row pairs —
    the evidence artifact driver_sim writes to SELFCHECK_diffs/."""
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)
    cols_sorted, sn = normalize(s_cols, s_rows)
    o_sorted, on = normalize(o_cols, o_rows)
    diff: dict = {
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
    }
    if sorted(s_cols) != sorted(o_cols):
        diff["kind"] = "columns"
        return diff
    pairs = []
    for i in range(max(len(sn), len(on))):
        a = sn[i] if i < len(sn) else None
        b = on[i] if i < len(on) else None
        if a != b:
            pairs.append({"row": i, "spark": repr(a), "oracle": repr(b)})
        if len(pairs) >= 20:
            break
    if not pairs:
        return None
    diff["kind"] = "rows" if len(s_rows) != len(o_rows) else "values"
    diff["columns_in_hash_order"] = cols_sorted
    diff["first_mismatches"] = pairs
    return diff
