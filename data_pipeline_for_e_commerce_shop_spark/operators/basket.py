"""Market-basket co-occurrence over order line items (extension
surface: the reference's per-category KPIs, scripts/helperfunction.py:117,
aggregate items independently; co-occurrence is the pairwise view an
e-commerce analytics engine is asked for next).

Scale shape: ONE scan + two shuffles.  Baskets are gathered per order
(`collect_set` — baskets are small and bounded: TPC-H orders hold ≤7
lines; a real catalog caps basket size too), pairs expand IN-BUCKET
from the sorted set, then a vocabulary-sized groupBy counts them.  The
alternative — a lineitem self-join on l_orderkey — reads the fact
twice and still produces the same quadratic-in-basket-size pairs.  A
pathological mega-basket (a crawler cart with 10k items) would expand
quadratically: cap it with `slice` before the pair transform if the
domain allows such baskets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.schemas import load_table


def part_pair_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top-k part pairs by number of orders containing both.

    Pairs come from the per-order sorted part set, so (part_a <
    part_b) is guaranteed without a filter; the final top-k is
    TakeOrderedAndProject (per-partition partial top-k) with a fully
    deterministic (n_orders desc, part_a, part_b) order, and the rank
    window runs over only the k survivors.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y ->"
                " struct(x AS part_a, y AS part_b))))"
            )
        ).alias("pair")
    ).select("pair.part_a", "pair.part_b")
    counts = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    order = [
        F.col("n_orders").desc(),
        F.col("part_a").asc(),
        F.col("part_b").asc(),
    ]
    top = counts.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "part_a", "part_b", "n_orders", "rank"
    )
