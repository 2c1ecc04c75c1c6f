"""Sink operators S5-S7, S9-S11 (SURVEY §2.1).

No Delta Lake runtime is available in this environment, so tables are
parquet directories with Hive-style ``dt=`` partitions and sinks use
dynamic partition overwrite.  On a production cluster these map 1:1 onto
Delta/Iceberg tables (noted per function); the operator semantics —
partition-scoped overwrite, quarantine-with-reason, idempotent manifest —
are identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_col: str = "dt") -> None:
    """S5: partitioned table write with DYNAMIC partition overwrite.

    The reference's ``mode('overwrite')`` on the whole table
    (scripts/validation.py:121-129) deletes every previous day each
    batch — SURVEY §4.3.  Dynamic overwrite replaces only the partitions
    present in this batch (Delta equivalent: ``replaceWhere``).
    """
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_quarantine(
    bad_rows: DataFrame, path: str, reason: str, error_type: str
) -> None:
    """S9: quarantine failing rows with reason/provenance columns —
    replaces the copy-to-rejected/-plus-JSON flow
    (reference lambda/s3_validation.py:138-157)."""
    (
        bad_rows.withColumn("reason", F.lit(reason))
        .withColumn("error_type", F.lit(error_type))
        .withColumn("rejected_at", F.current_timestamp())
        .write.mode("append")
        .parquet(path)
    )


def write_manifest(path: str, payload: dict) -> None:
    """S6: one-row JSON result manifest
    (reference scripts/validation.py:132-142) — driver-side by design;
    it is control metadata, not data."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, sort_keys=True)


def write_alert(alerts_path: str, payload: dict) -> None:
    """S10: alert append (reference SNS publish,
    lambda/s3_validation.py:160-177) represented as an alerts table row."""
    os.makedirs(alerts_path, exist_ok=True)
    fname = f"alert_{abs(hash(json.dumps(payload, sort_keys=True)))}.json"
    with open(os.path.join(alerts_path, fname), "w") as f:
        json.dump(payload, f, sort_keys=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Hash-bucketed (and per-bucket sorted) catalog table.

    Both sides of a join bucketed on their join keys with the same
    bucket count are CO-LOCATED: the join needs no shuffle at all —
    the single biggest cost elimination available for a repeated
    fact-to-fact join at 100 TB (every query on `order_id` pays a full
    fact shuffle otherwise; bucketing pays it once, at write time).

    Repartitioning by the bucket column first keeps one file per
    bucket, which also lets Spark trust the sort order and skip the
    sort before a merge join.
    """
    w = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
