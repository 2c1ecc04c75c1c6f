"""Hypothesis replays for the stateful HOF-fold operators.

Oracle parity cannot catch a recursion both engines implement
identically wrong; these tests fold arbitrary small inputs through
pure-Python reference state machines and require the engine to match
exactly (same model as the revenue-bridge property test).
"""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES


def test_inventory_replay_matches_python(spark, tmp_path):
    line = st.tuples(
        st.integers(min_value=1, max_value=3),     # partkey
        st.integers(min_value=0, max_value=25),    # day offset
        st.integers(min_value=1, max_value=60),    # qty
    )
    counter = [0]

    @settings(max_examples=6, deadline=None)
    @given(st.lists(line, min_size=1, max_size=25))
    def check(rows):
        counter[0] += 1
        d = str(tmp_path / f"inv{counter[0]}")
        os.makedirs(d, exist_ok=True)
        data = [
            (pk, f"2020-01-{day + 1:02d}", float(q))
            for (pk, day, q) in rows
        ]
        spark.createDataFrame(
            data,
            "l_partkey long, l_shipdate string, l_quantity double",
        ).selectExpr(
            "l_partkey",
            "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate",
            "l_quantity",
        ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        got = {
            r["p_partkey"]: (
                r["n_days"],
                r["mean_q"],
                r["n_orders"],
                r["stockout_days"],
                r["lost_units"],
                r["end_inventory"],
            )
            for r in QUERIES["part_inventory_replay"](spark, d).collect()
        }
        # pure-Python reference
        daily: dict = {}
        for pk, day, q in rows:
            daily[(pk, day)] = daily.get((pk, day), 0) + q
        exp = {}
        for pk in {pk for pk, _, _ in rows}:
            seq = sorted(
                (day, q) for (p, day), q in daily.items() if p == pk
            )
            n = len(seq)
            tot = sum(q for _, q in seq)
            mean = tot // n
            inv, orders, so, lost = 3 * mean, 0, 0, 0
            for _, q in seq:
                served = min(inv, q)
                if q > inv:
                    so += 1
                lost += q - served
                rem = inv - served
                if rem <= mean:
                    inv = 3 * mean
                    orders += 1
                else:
                    inv = rem
            exp[pk] = (n, mean, orders, so, lost, inv)
        assert got == exp

    check()


def test_cusum_matches_python(spark, tmp_path):
    ev = st.tuples(
        st.integers(min_value=0, max_value=1),     # type index
        st.integers(min_value=0, max_value=20),    # day offset
        st.integers(min_value=0, max_value=40000), # value cents
    )
    counter = [0]

    @settings(max_examples=6, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=30))
    def check(rows):
        counter[0] += 1
        d = str(tmp_path / f"cu{counter[0]}")
        os.makedirs(d, exist_ok=True)
        types = ["alpha", "beta"]
        data = [
            (
                i,
                f"2020-03-{day + 1:02d} 12:00:00",
                types[t],
                cents / 100.0,
                1000 + i,
                "{}",
            )
            for i, (t, day, cents) in enumerate(rows)
        ]
        spark.createDataFrame(
            data,
            "event_id long, ts string, event_type string,"
            " value double, user_id long, props string",
        ).selectExpr(
            "event_id",
            "CAST(ts AS TIMESTAMP) AS ts",
            "user_id",
            "event_type",
            "value",
            "props",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["event_type"]: (
                r["max_cusum_cents"],
                r["peak_day_epoch"],
                r["n_alert_days"],
                r["n_days"],
            )
            for r in QUERIES["events_cusum_changepoint"](spark, d).collect()
        }
        # pure-Python reference (engine cents = floor through the
        # double round-trip, revenue-bridge lesson)
        import math

        daily: dict = {}
        for t, day, cents in rows:
            eng = math.floor((cents / 100.0) * 100)
            key = (types[t], day)
            daily[key] = daily.get(key, 0) + eng
        exp = {}
        for tname in {types[t] for t, _, _ in rows}:
            seq = sorted(
                (day, x) for (tt, day), x in daily.items() if tt == tname
            )
            tot = sum(x for _, x in seq)
            mu = tot // len(seq)
            k = mu // 20
            s, mx, peak, alerts = 0, -1, 0, 0
            for day, x in seq:
                s = max(0, s + x - mu - k)
                if s > mx:
                    mx = s
                    peak = day
                if s > 4 * k:
                    alerts += 1
            # engine peak day is epoch days; convert our offset
            import datetime

            epoch = (
                datetime.date(2020, 3, 1 + peak)
                - datetime.date(1970, 1, 1)
            ).days
            exp[tname] = (mx, epoch, alerts, len(seq))
        assert got == exp

    check()


def test_ema_holt_fold_matches_recursive_bitwise(spark):
    """The registered ema/holt FOLD plans must be bit-identical to
    their distributed WITH RECURSIVE twins (r4 VERDICT item 1a): a
    recursion-execution bug in either engine version now becomes
    locally visible instead of surfacing only in the driver's
    environment.  Exact tuple compare — including the double columns,
    which both forms derive from the same integers via double
    literals (1000.0D)."""
    from data_pipeline_for_e_commerce_shop_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    for name, demo in [
        ("events_ema_recursive", Q.events_ema_recursive_demo),
        ("events_holt_recursive", Q.events_holt_recursive_demo),
    ]:
        fold = sorted(tuple(r) for r in Q.QUERIES[name](spark, sf).collect())
        rec = sorted(tuple(r) for r in demo(spark, sf).collect())
        assert fold == rec, (
            name,
            [p for p in zip(fold, rec) if p[0] != p[1]][:3],
        )
        assert len(fold) > 0
