"""Event-stream analytics over the `events` table — the batch duals of
the streaming operators (SURVEY §2.9); the Structured Streaming forms
live in streaming/.

The reference's control plane is a hand-rolled processing-time stream
processor (debounce batching, lambda/s3_validation.py:64-112).  These
queries give the event-time equivalents as plain DataFrame programs:
tumbling-window aggregation and gap-based sessionization (the debounce
window T3 is exactly a 90-second-gap session).

Time arithmetic sticks to integer epoch seconds (unix_timestamp ==
floor(epoch)) so results are engine-exact; money-style value sums use
integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

DEBOUNCE_GAP_SECONDS = 90  # reference BATCH_WINDOW_SECONDS default
                           # (lambda/s3_validation.py:23)


def hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type: counts + exact value sum.

    Batch dual of ``groupBy(window(ts, '1 hour'), event_type)``; the
    bucket is epoch//3600 so the oracle computes the identical key.
    """
    events = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return (
        events.groupBy(
            bucket.alias("hour_epoch"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100)) / 100.0).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_seconds: int = DEBOUNCE_GAP_SECONDS) -> DataFrame:
    """Gap-based sessionization per user (the reference's debounce
    window T3: an event more than 90 s after the previous one opens a
    NEW session — lambda/s3_validation.py:64-71).

    Two windows over one shuffle on user_id: lag to mark session
    starts, running sum to number sessions; then a grouped rollup per
    session.  In Structured Streaming this is session_window /
    applyInPandasWithState (streaming/debounce.py).
    """
    events = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "event_id",
        "value",
        sec.alias("epoch_sec"),
        F.when(
            (sec - F.lag(sec, 1).over(w)) > gap_seconds, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("epoch_sec", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("epoch_sec").alias("session_start"),
            F.max("epoch_sec").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100)) / 100.0).alias("total_value"),
        )
    )


def event_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type pivot (counts per type) — the KV-serving
    shape of the reference's per-key KPI rows, as one wide row per
    user.  Pivot with an explicit type list stays a single hash agg."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
