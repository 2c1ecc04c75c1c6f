"""T5/T11 at scale: incremental KPI maintenance from a file stream.

The reference recomputes KPIs per batch and point-upserts them
(scripts/transformation.py:187-205 → helperfunction.py:53-208).  At
100 TB you never recompute the whole history: each arriving micro-batch
contributes a PARTIAL aggregate (counts + integer-cent sums — the
decomposable terms), which an additive merge folds into the serving
table.  Averages/ratios are derived from the accumulated terms at read
time, so they are always consistent with the totals.

Exactly-once: the checkpoint tracks processed files, so a restarted
``availableNow`` run skips everything already folded in — re-running
the stream does NOT double-count (tests/test_incremental.py).  With a
transactional table format the merge itself is also atomic; on plain
parquet the read-modify-write in upsert is the single-writer section.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from data_pipeline_for_e_commerce_shop_spark.operators.merge import additive_merge

KEY_COLS = ["category", "order_date"]
SUM_COLS = ["n_items", "revenue_cents", "n_returned"]
SKETCH_COLS = ["users_hll"]


def partial_category_kpis(batch: DataFrame) -> DataFrame:
    """Per-micro-batch decomposable terms for the category KPIs.

    Distinct users travel as an HLL sketch (binary column): exact
    per-batch countDistinct cannot accumulate across batches, but
    sketches union associatively — the estimate at read time covers
    every batch ever folded in.
    """
    return batch.groupBy("category", "order_date").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.floor(F.col("sale_price") * 100))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.when(F.col("status") == "returned", 1)).alias("n_returned"),
        F.hll_sketch_agg("user_id").alias("users_hll"),
    )


def accumulate_into(spark: SparkSession, table_path: str, partial: DataFrame) -> None:
    """Fold one batch's partials into the parquet serving table."""
    import os

    if os.path.isdir(table_path) and any(
        f.endswith(".parquet") for f in os.listdir(table_path)
    ):
        target = spark.read.parquet(table_path)
        merged = additive_merge(
            target, partial, KEY_COLS, SUM_COLS, sketch_cols=SKETCH_COLS
        )
    else:
        merged = partial
    out = merged.cache()
    out.count()  # materialize before overwriting the input path
    out.write.mode("overwrite").parquet(table_path)
    out.unpersist()


def serving_view(spark: SparkSession, table_path: str) -> DataFrame:
    """Derived KPIs from the accumulated terms — identical shape to the
    batch category_kpis output."""
    t = spark.read.parquet(table_path)
    return t.select(
        "category",
        "order_date",
        (F.col("revenue_cents") / 100.0).alias("daily_revenue"),
        (F.col("revenue_cents") / 100.0 / F.col("n_items")).alias(
            "avg_order_value"
        ),
        (F.col("n_returned") / F.col("n_items")).alias("avg_return_rate"),
        F.hll_sketch_estimate("users_hll").alias("n_users_approx"),
    )


def run_incremental_kpis(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    table_path: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available files into the serving table
    (Trigger.AvailableNow), then stop.  Call again after new files
    arrive — the checkpoint guarantees each file folds in exactly once.
    """

    def fold(batch: DataFrame, _batch_id: int) -> None:
        accumulate_into(spark, table_path, partial_category_kpis(batch))

    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def accumulate_into_versioned(
    spark: SparkSession,
    table_path: str,
    partial: DataFrame,
    max_retries: int = 8,
) -> int:
    """Fold one batch's partials into a VERSIONED serving table with
    the round-4 compare-and-swap commit (sources/versioned.py) instead
    of the plain-parquet overwrite: the additive merge re-reads the
    table it will commit over, pins ``expected_current``, and re-folds
    on ``ConcurrentWriteError`` — so a competing writer (another
    pipeline, a manual backfill) can interleave without either side's
    rows being lost, the multi-writer posture ``accumulate_into``
    explicitly does not have.  The partial is checkpointed once so
    retries re-merge the SAME batch data.  Returns the committed
    version."""
    from data_pipeline_for_e_commerce_shop_spark.sources import (
        versioned as V,
    )

    part_ck = partial.localCheckpoint(eager=True)
    last: Exception | None = None
    for _ in range(max_retries):
        cur = V.current_version(table_path)
        if cur == 0:
            merged = part_ck
        else:
            merged = additive_merge(
                V.read_versioned(spark, table_path),
                part_ck,
                KEY_COLS,
                SUM_COLS,
                sketch_cols=SKETCH_COLS,
            )
        try:
            return V.write_versioned(
                merged, table_path, expected_current=cur
            )
        except V.ConcurrentWriteError as e:
            last = e
            continue
    raise RuntimeError(
        f"{table_path}: additive fold lost the commit race"
        f" {max_retries} times; last: {last}"
    )


def run_incremental_kpis_versioned(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    table_path: str,
    checkpoint_dir: str,
) -> None:
    """``run_incremental_kpis`` on the CAS-versioned serving table:
    availableNow drain where every micro-batch is a versioned commit —
    exactly-once from the stream checkpoint (replayed files never
    re-fold) AND lost-update-free under concurrent writers (the CAS
    retry loop).  Each drain leaves a time-travelable version chain."""

    def fold(batch: DataFrame, _batch_id: int) -> None:
        accumulate_into_versioned(
            spark, table_path, partial_category_kpis(batch)
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
