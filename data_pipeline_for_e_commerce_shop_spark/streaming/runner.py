"""T5-T10: batch state machine + single-flight FIFO runner.

Reference: a DynamoDB ``batch_chunks`` table driven by two racing
Lambdas — a stream trigger (lambda/lab6-ttl.py:36-119) and a scheduled
controller (lambda/controller.py:38-133) — with an UNguarded
pending->processing transition (they can both launch the same chunk;
SURVEY §4.3).  Status flow: pending -> processing -> done|failed with
retry/backoff handled by Step Functions
(stepfunction/stepfunction.json:71-79,196-204).

Here the job-state table is a parquet-backed table updated with a
CONDITIONAL transition (only one claimant can move pending->processing
— the race is fixed by construction, single-writer read-modify-write;
on Delta this is ``MERGE ... WHEN MATCHED AND t.status='pending'``).
The runner loop is the controller's FIFO probe: oldest pending batch,
one in flight, N attempts with recorded history.
"""

from __future__ import annotations

import os
import traceback
from collections.abc import Callable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BATCH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("group_key", T.StringType(), True),
        T.StructField("file_paths", T.ArrayType(T.StringType()), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("processing_started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("last_error", T.StringType(), True),
    ]
)


class BatchStateTable:
    """Parquet-backed job-state table (reference DynamoDB batch_chunks,
    readme.md:113-114; Delta table in production)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], BATCH_STATE_SCHEMA)
        return self.spark.read.parquet(self.path)

    def _overwrite(self, df: DataFrame) -> None:
        rows = df.collect()  # job-state is control metadata: O(batches), tiny
        out = self.spark.createDataFrame(rows, BATCH_STATE_SCHEMA)
        out.coalesce(1).write.mode("overwrite").parquet(self.path)

    def enqueue(self, batches: DataFrame) -> None:
        """T4: append newly closed debounce windows as pending rows,
        idempotent on batch_id (re-running the debounce can't double-
        enqueue — the anti-join drops already-known ids)."""
        existing = self.read().select("batch_id")
        fresh = (
            batches.select(
                "batch_id",
                "group_key",
                "file_paths",
                F.lit("pending").alias("status"),
                F.coalesce(
                    F.col("batch_start"), F.current_timestamp()
                ).alias("created_at"),
                F.lit(None).cast("timestamp").alias("processing_started_at"),
                F.lit(None).cast("timestamp").alias("completed_at"),
                F.lit(0).alias("attempts"),
                F.lit(None).cast("string").alias("last_error"),
            )
            .join(existing, "batch_id", "left_anti")
        )
        merged = self.read().unionByName(fresh)
        self._overwrite(merged)

    def claim_next(self) -> Row | None:
        """T6: single-flight FIFO claim with a CONDITIONAL transition.

        If any batch is 'processing', claim nothing (reference
        controller probe, lambda/controller.py:52-61).  Otherwise move
        the OLDEST pending row to processing — guarded on its current
        status, so a concurrent duplicate trigger (the reference's T5/T6
        race) cannot double-claim.
        """
        state = self.read()
        if state.filter(F.col("status") == "processing").limit(1).count() > 0:
            return None
        oldest = (
            state.filter(F.col("status") == "pending")
            .orderBy(F.col("created_at").asc(), F.col("batch_id").asc())
            .limit(1)
            .collect()
        )
        if not oldest:
            return None
        bid = oldest[0]["batch_id"]
        updated = state.withColumn(
            "status",
            F.when(
                (F.col("batch_id") == bid) & (F.col("status") == "pending"),
                F.lit("processing"),
            ).otherwise(F.col("status")),
        ).withColumn(
            "processing_started_at",
            F.when(
                (F.col("batch_id") == bid)
                & (F.col("processing_started_at").isNull()),
                F.current_timestamp(),
            ).otherwise(F.col("processing_started_at")),
        ).withColumn(
            "attempts",
            F.when(F.col("batch_id") == bid, F.col("attempts") + 1).otherwise(
                F.col("attempts")
            ),
        )
        self._overwrite(updated)
        return self.read().filter(F.col("batch_id") == bid).collect()[0]

    def finish(self, batch_id: str, status: str, error: str | None = None) -> None:
        """T7: processing -> done|failed stamp (reference
        lambda/confirm_status.py:31-46)."""
        updated = self.read().withColumn(
            "status",
            F.when(F.col("batch_id") == batch_id, F.lit(status)).otherwise(
                F.col("status")
            ),
        ).withColumn(
            "completed_at",
            F.when(F.col("batch_id") == batch_id, F.current_timestamp()).otherwise(
                F.col("completed_at")
            ),
        ).withColumn(
            "last_error",
            F.when(F.col("batch_id") == batch_id, F.lit(error)).otherwise(
                F.col("last_error")
            ),
        )
        self._overwrite(updated)

    def requeue_failed(self, max_attempts: int = 3) -> int:
        """T9: failed batches under the attempt budget go back to
        pending (reference Step Functions Retry 3x,
        stepfunction.json:71-79)."""
        state = self.read()
        n = state.filter(
            (F.col("status") == "failed") & (F.col("attempts") < max_attempts)
        ).count()
        if n:
            self._overwrite(
                state.withColumn(
                    "status",
                    F.when(
                        (F.col("status") == "failed")
                        & (F.col("attempts") < max_attempts),
                        F.lit("pending"),
                    ).otherwise(F.col("status")),
                )
            )
        return n


def run_until_drained(
    table: BatchStateTable,
    process: Callable[[Row], None],
    max_attempts: int = 3,
    max_iterations: int = 1000,
) -> dict[str, int]:
    """The controller loop (reference lambda/controller.py:38-133 +
    Step Functions retry): claim oldest pending, run, stamp
    done/failed, requeue retryable failures, until nothing is pending.

    Returns {'done': n, 'failed': n} terminal counts.
    """
    for _ in range(max_iterations):
        row = table.claim_next()
        if row is None:
            if table.requeue_failed(max_attempts) == 0:
                break
            continue
        try:
            process(row)
            table.finish(row["batch_id"], "done")
        except Exception:
            table.finish(row["batch_id"], "failed", traceback.format_exc()[-2000:])
    state = table.read()
    done = state.filter(F.col("status") == "done").count()
    failed = state.filter(F.col("status") == "failed").count()
    return {"done": done, "failed": failed}
