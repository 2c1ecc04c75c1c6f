"""As-of join semantics: inclusive bound, no-prior-row nulls, key
isolation, and the no-pair-explosion plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from data_pipeline_for_e_commerce_shop_spark.operators.asof import asof_join

TS = lambda s: dt.datetime(2024, 3, 1, 10, 0, s)  # noqa: E731

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("lv", T.LongType(), False),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("rv", T.LongType(), False),
    ]
)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", TS(10), 1),   # after r@5  -> rv=50
            ("a", TS(20), 2),   # after r@15 -> rv=150
            ("a", TS(15), 3),   # EQUAL to r@15 -> inclusive -> rv=150
            ("a", TS(1), 4),    # before any right row -> null
            ("b", TS(30), 5),   # key b has no right rows -> null
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [("a", TS(5), 50), ("a", TS(15), 150), ("c", TS(1), 999)],
        RIGHT_SCHEMA,
    )
    out = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    assert out == {1: 50, 2: 150, 3: 150, 4: None, 5: None}


def test_asof_single_shuffle_plan(spark):
    """The whole point: no join node at all — one window over a union."""
    left = spark.createDataFrame([("a", TS(10), 1)], LEFT_SCHEMA)
    right = spark.createDataFrame([("a", TS(5), 50)], RIGHT_SCHEMA)
    df = asof_join(left, right, "k", "ts", ["rv"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one hash partition + AQE reads
