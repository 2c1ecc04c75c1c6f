"""Count-min sketch: fixed-memory frequency estimation.

The heavy-hitters problem at 100 TB: exact per-key counts need a
key-cardinality-sized shuffle, but a count-min sketch reduces the
fact table to a FIXED d x w counter grid (here 4 x 1024 = 4096 cells)
that is map-side combinable and mergeable across any partitioning —
the same reason HLL replaces exact countDistinct at scale.

Like operators/bloom.py, the sketch is deterministic (md5-derived row
hashes, bit-identical in Spark and DuckDB) and SELF-AUDITING: the
estimate is compared against the exact count for the true top-k keys,
so the overestimate (CMS never underestimates) is visible in the
output rather than silently trusted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 1024  # counters per row


def _cms_pos(row: Column, key: Column) -> Column:
    """Counter index for (row, key): first 32 md5 bits mod width."""
    s = F.concat(
        F.lit("cms"), row.cast("string"), F.lit("-"), key.cast("string")
    )
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % CMS_WIDTH
    )


def cms_heavy_hitters(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Estimate the top-k part frequencies in lineitem via a 4x1024
    count-min sketch, audited against the exact counts.

    Build: each fact row fans out to d counter increments (map-side
    explode), then ONE groupBy over at most d*w = 4096 keys — the
    partial aggregation does all the reduction, so the shuffle is
    sketch-sized no matter how large the fact table is.  Estimate:
    the true top-k keys (the audit set) probe the sketch with a
    broadcast join on (row, pos) and take min over rows.

    Output: exact count, CMS estimate, and the collision overestimate
    (estimate - exact, always >= 0) per top key.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    # materialised once: both the counter build and the audit top-k
    # read it, and two plan mentions would re-run the fact aggregate
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .localCheckpoint(eager=False)
    )
    # Counter cells are additive, so the sketch can be built from the
    # per-key partial counts instead of re-scanning raw fact rows —
    # identical cells (sum over keys hashing to the cell), one fact
    # scan total.  On a true stream the increments would apply to the
    # raw rows; the merged result is the same by additivity.
    rows = exact.select(
        "l_partkey",
        "exact_n",
        F.explode(
            F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))
        ).alias("r"),
    )
    counters = rows.groupBy(
        "r", _cms_pos(F.col("r"), F.col("l_partkey")).alias("p")
    ).agg(F.sum("exact_n").alias("cnt"))
    w = Window.orderBy(F.desc("exact_n"), F.asc("l_partkey"))
    topk = exact.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= k
    )

    probes = topk.select(
        "l_partkey",
        "exact_n",
        "rk",
        F.explode(
            F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))
        ).alias("r"),
    ).withColumn("p", _cms_pos(F.col("r"), F.col("l_partkey")))
    est = (
        probes.join(F.broadcast(counters), ["r", "p"])
        .groupBy("l_partkey", "exact_n", "rk")
        .agg(F.min("cnt").alias("cms_n"))
    )
    return est.select(
        F.col("l_partkey").alias("part_id"),
        "rk",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
    )
