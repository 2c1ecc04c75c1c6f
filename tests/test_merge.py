"""Coalescing-merge properties (reference helperfunction.py:110-208
branch matrix): idempotency, partial-then-complete convergence,
provenance accumulation — including hypothesis property tests."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_pipeline_for_e_commerce_shop_spark.operators.merge import coalescing_merge

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("a", T.LongType(), True),
        T.StructField("b", T.DoubleType(), True),
        T.StructField("data_sources", T.ArrayType(T.StringType()), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _as_map(df):
    return {
        r["k"]: (r["a"], r["b"], tuple(r["data_sources"] or ()))
        for r in df.collect()
    }


def test_new_over_old_coalesce(spark):
    target = _df(spark, [("d1", 5, None, ["orders"])])
    source = _df(spark, [("d1", None, 9.5, ["order_items"])])
    merged = coalescing_merge(target, source, ["k"], ["a", "b"])
    assert _as_map(merged) == {"d1": (5, 9.5, ("order_items", "orders"))}


def test_insert_and_preserve(spark):
    target = _df(spark, [("d1", 1, 1.0, ["orders"])])
    source = _df(spark, [("d2", 2, 2.0, ["orders"])])
    merged = coalescing_merge(target, source, ["k"], ["a", "b"])
    assert _as_map(merged) == {
        "d1": (1, 1.0, ("orders",)),
        "d2": (2, 2.0, ("orders",)),
    }


def test_source_wins_on_conflict(spark):
    """complete-batch branch (helperfunction.py:186-201): non-null
    source values overwrite."""
    target = _df(spark, [("d1", 1, 1.0, ["orders"])])
    source = _df(spark, [("d1", 7, 7.0, ["orders"])])
    merged = coalescing_merge(target, source, ["k"], ["a", "b"])
    assert _as_map(merged) == {"d1": (7, 7.0, ("orders",))}


def test_merge_idempotent(spark):
    target = _df(spark, [("d1", 1, None, ["orders"])])
    source = _df(spark, [("d1", None, 2.0, ["order_items"]), ("d2", 3, 3.0, ["orders"])])
    once = coalescing_merge(target, source, ["k"], ["a", "b"])
    twice = coalescing_merge(once, source, ["k"], ["a", "b"])
    assert _as_map(once) == _as_map(twice)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    tgt=st.dictionaries(
        st.sampled_from(["d1", "d2", "d3"]),
        st.tuples(
            st.one_of(st.none(), st.integers(0, 100)),
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
        ),
        max_size=3,
    ),
    src=st.dictionaries(
        st.sampled_from(["d1", "d2", "d3", "d4"]),
        st.tuples(
            st.one_of(st.none(), st.integers(0, 100)),
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
        ),
        max_size=4,
    ),
)
def test_merge_matches_model(spark, tgt, src):
    """Property: the DataFrame merge equals the obvious per-key Python
    model (field-wise coalesce new-over-old, provenance union)."""
    target = _df(spark, [(k, a, b, ["t"]) for k, (a, b) in tgt.items()])
    source = _df(spark, [(k, a, b, ["s"]) for k, (a, b) in src.items()])
    merged = _as_map(coalescing_merge(target, source, ["k"], ["a", "b"]))

    expected = {}
    for k in set(tgt) | set(src):
        ta, tb = tgt.get(k, (None, None))
        sa, sb = src.get(k, (None, None))
        prov = tuple(
            sorted((["t"] if k in tgt else []) + (["s"] if k in src else []))
        )
        expected[k] = (
            sa if sa is not None else ta,
            sb if sb is not None else tb,
            prov,
        )
    assert merged == expected
