"""Grouped statistical model fitting as single-pass aggregates.

Closed-form estimators (ordinary least squares, and friends) decompose
into per-group sums, so they run as ONE map-side-combinable aggregate —
the cheapest possible distributed shape: no iteration, no broadcast
model, no second pass over the fact table.

Determinism discipline: the five sufficient statistics (n, Σx, Σy,
Σxy, Σx²) are EXACT int64 sums of integer-encoded inputs (cents, day
indices); only the final slope/intercept arithmetic is double, applied
in an identical expression order on both engines, so results are
bit-identical.  (Naive per-row double accumulation would make the
result depend on partition count.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

X_EPOCH = "1992-01-01"  # day-index origin keeps Σxy comfortably in int64


def price_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category OLS trend of line-item price over ship date.

    x = days since 1992-01-01 (int), y = extended price in cents (int).
    slope/intercept come from the normal equations on exact integer
    sufficient statistics; the int64 sums are converted to double ONCE
    and combined in a fixed expression order (n*Σxy - Σx*Σy etc.), so
    Spark and DuckDB produce identical IEEE doubles.

    Plan: broadcast part dim join (category lookup) -> one grouped
    aggregate with map-side partials.  Scales as a pure scan-agg; no
    shuffle beyond the 6-row final groupBy exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    x = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit(X_EPOCH).cast("date")
    ).cast("long")
    y = F.floor(F.col("l_extendedprice") * 100).cast("long")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    suff = joined.select(
        "p_type", x.alias("x"), y.alias("y")
    ).groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return suff.select(
        F.col("p_type").alias("category"),
        "n",
        slope.alias("slope_cents_per_day"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
    )
