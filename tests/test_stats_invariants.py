"""Mathematical invariants of the round-3 session-5 operators.

Oracle parity proves Spark and DuckDB agree; these prove both agree
with the MATH — bounds and identities that hold for the definitions
regardless of data, so an error baked identically into both sides
would still be caught.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_for_e_commerce_shop_spark.queries import (
    EOQ_HOLDING_CENTS_PER_UNIT,
    EOQ_ORDER_COST_CENTS,
    QUERIES,
)


def test_runs_test_partition_identity(spark, sf_dir):
    """n_above + n_below = n_days and 1 <= n_runs <= n_days."""
    r = QUERIES["revenue_runs_test"](spark, sf_dir).collect()[0]
    assert r["n_above"] + r["n_below"] == r["n_days"]
    assert 1 <= r["n_runs"] <= r["n_days"]


def test_mann_kendall_bounds(spark, sf_dir):
    """|S| <= n(n-1)/2, var18 >= 0, trend flag consistent with z."""
    for r in QUERIES["brand_mann_kendall"](spark, sf_dir).collect():
        n = r["n_months"]
        assert abs(r["s_stat"]) <= n * (n - 1) // 2
        assert r["var18"] >= 0
        if r["trend"] == 1:
            assert r["z_e3"] > 1959
        elif r["trend"] == -1:
            assert r["z_e3"] < -1959
        else:
            assert -1960 <= r["z_e3"] <= 1959


def test_spearman_rho_bounded(spark, sf_dir):
    for r in QUERIES["nation_spearman_bal_spend"](spark, sf_dir).collect():
        assert -1_000_000 <= r["rho_e6"] <= 1_000_000


def test_ljung_box_nonnegative(spark, sf_dir):
    r = QUERIES["revenue_ljung_box"](spark, sf_dir).collect()[0]
    assert r["q_e3"] >= 0
    assert r["n_lags"] == 7


def test_eoq_isqrt_exact(spark, sf_dir):
    """eoq is EXACTLY floor(sqrt(2KD/h)): eoq^2 <= x < (eoq+1)^2."""
    for r in QUERIES["part_eoq_policy"](spark, sf_dir).collect():
        x = (
            2 * EOQ_ORDER_COST_CENTS * r["demand_units"]
        ) // EOQ_HOLDING_CENTS_PER_UNIT
        q = r["eoq_units"]
        assert q * q <= x < (q + 1) * (q + 1)
        assert r["n_orders"] == -(-r["demand_units"] // q)  # ceil


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=2**50))
def test_corrected_isqrt_formula_matches_math_isqrt(x):
    """The corrected floor-sqrt recipe both engines run equals
    math.isqrt for any radicand in the supported range."""
    q0 = int(math.floor(math.sqrt(float(x))))
    if (q0 + 1) * (q0 + 1) <= x:
        q = q0 + 1
    elif q0 * q0 > x:
        q = q0 - 1
    else:
        q = q0
    assert q == math.isqrt(x)


def test_backlog_conserves(spark, sf_dir):
    """Every opened order eventually closes: totals match and the
    final cumulative backlog is exactly zero."""
    rows = QUERIES["orders_backlog_timeline"](spark, sf_dir).collect()
    assert sum(r["opened"] for r in rows) == sum(
        r["closed"] for r in rows
    )
    assert rows[-1]["backlog_eom"] == 0


def test_bullwhip_flag_consistent(spark, sf_dir):
    for r in QUERIES["brand_bullwhip_ratio"](spark, sf_dir).collect():
        assert r["cv2_ordered_e6"] >= 0
        assert r["cv2_shipped_e6"] >= 0
        if r["amplified"] == 1:
            assert r["cv2_ordered_e6"] >= r["cv2_shipped_e6"]
        else:
            assert r["cv2_ordered_e6"] <= r["cv2_shipped_e6"] + 1


def test_did_cells_cover_assigned_lines(spark, sf_dir):
    """The four DID cells partition exactly the lineitems whose part
    appears in the pre period (treatment is assignable)."""
    import duckdb

    r = QUERIES["discount_did_revenue"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT *"
        f" FROM '{sf_dir}/lineitem.parquet'"
    )
    n = con.execute(
        """
        SELECT COUNT(*) FROM lineitem
        WHERE l_partkey IN (
          SELECT DISTINCT l_partkey FROM lineitem
          WHERE CAST(l_shipdate AS DATE) < DATE '1995-06-01')
        """
    ).fetchone()[0]
    assert r["n_t0"] + r["n_t1"] + r["n_c0"] + r["n_c1"] == n


def test_js_divergence_bounded(spark, sf_dir):
    """0 <= JS <= ln 2 for every source."""
    for r in QUERIES["text_js_source_divergence"](spark, sf_dir).collect():
        assert -1e-9 <= r["js_nats"] <= math.log(2) + 1e-9


def test_novelty_bounded(spark, sf_dir):
    for r in QUERIES["text_ngram_novelty"](spark, sf_dir).collect():
        assert 0 <= r["n_novel_grams"] <= r["n_test_grams"]
        assert 0 <= r["novel_ppm"] <= 1_000_000


def test_semantic_sweep_monotone(spark, sf_dir):
    """A higher cosine threshold can only shrink the candidate-pair
    and removal sets."""
    rows = QUERIES["dedup_semantic_sweep"](spark, sf_dir).collect()
    taus = [r["tau_pct"] for r in rows]
    assert taus == sorted(taus)
    for lo, hi in zip(rows, rows[1:]):
        assert hi["n_pairs"] <= lo["n_pairs"]
        assert hi["n_removed"] <= lo["n_removed"]
        assert hi["removed_ppm"] <= lo["removed_ppm"]


def test_markov_clv_accounting(spark, sf_dir):
    """State-quarter observations cover the full customer x quarter
    grid, and discounted value >= immediate reward (rewards >= 0)."""
    import duckdb

    rows = QUERIES["segment_markov_clv"](spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT *"
        f" FROM '{sf_dir}/customer.parquet'"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT *"
        f" FROM '{sf_dir}/orders.parquet'"
    )
    n_cust, n_q = con.execute(
        """
        SELECT (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(DISTINCT DATE_TRUNC('quarter',
                        CAST(o_orderdate AS DATE))) FROM orders)
        """
    ).fetchone()
    assert sum(r["n_obs"] for r in rows) == n_cust * n_q
    for r in rows:
        assert r["clv3_cents"] >= r["r_cents"]
