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


def test_scd2_incremental_split_is_nonvacuous(spark):
    """The incremental-apply equivalence only means something if the
    cutoff genuinely splits the log: both sides non-empty, some keys
    affected, some untouched."""
    from pyspark.sql import functions as F

    from data_pipeline_for_e_commerce_shop_spark.operators.scd import (
        SCD2_DELTA_CUTOFF,
    )
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    cut = F.lit(SCD2_DELTA_CUTOFF).cast("date")
    n_old = orders.where(F.col("odate") < cut).count()
    n_delta = orders.where(F.col("odate") >= cut).count()
    assert n_old > 0 and n_delta > 0
    aff = (
        orders.where(F.col("odate") >= cut).select("o_custkey").distinct()
    )
    n_aff = aff.count()
    n_keys = orders.select("o_custkey").distinct().count()
    assert 0 < n_aff < n_keys  # some keys untouched, some affected
