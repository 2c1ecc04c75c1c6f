"""Named query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

Column names are aliased identically in Spark and SQL (the driver's
compare sorts columns by name before hashing).  Money aggregates use
exact integer cents on BOTH sides (see functions/scalars.py) so values
are bit-identical regardless of engine or parallelism.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.functions.scalars import money_sum, ratio
from data_pipeline_for_e_commerce_shop_spark.operators import kpis, windows
from data_pipeline_for_e_commerce_shop_spark.operators.merge import coalescing_merge
from data_pipeline_for_e_commerce_shop_spark.quality.gates import ri_violations
from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------- KPIs

register(
    "category_kpis",
    """
    SELECT p_type AS category,
           CAST(o_orderdate AS DATE) AS order_date,
           SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS daily_revenue,
           SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0/COUNT(l_linenumber) AS avg_order_value,
           (COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) / COUNT(l_linenumber)) AS avg_return_rate
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
    """,
)(kpis.category_kpis)

register(
    "order_kpis",
    """
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           COUNT(DISTINCT o_orderkey) AS total_orders,
           SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS total_revenue,
           COUNT(l_linenumber) AS total_items_sold,
           (COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) / COUNT(l_linenumber)) AS return_rate,
           COUNT(DISTINCT o_custkey) AS unique_customers
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)(kpis.order_kpis)

# HLL sketch internals differ across engines: rows-only check (no oracle).
register("order_kpis_approx")(kpis.order_kpis_approx)


# ------------------------------------------------- joins / predicates

@register(
    "ri_orphans",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: referential-integrity anti-join (reference
    scripts/validation.py:100-116 did distinct->collect->isin; SURVEY
    §4.3).  Customers with no orders, fully distributed."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return ri_violations(
        customer.select("c_custkey", "c_name"), "c_custkey",
        orders.select(F.col("o_custkey")), "o_custkey",
    )


@register(
    "membership_semi",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def membership_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: membership predicate as a left_semi join (the scalable form
    of the reference's collect-then-isin, scripts/validation.py:103)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        customer.join(
            finished, customer.c_custkey == finished.o_custkey, "left_semi"
        ).select("c_custkey", "c_mktsegment")
    )


@register(
    "null_gate",
    """
    SELECT COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS o_custkey_nulls,
           COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS o_orderdate_nulls,
           COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS o_totalprice_nulls,
           COUNT(*) AS total_rows
    FROM orders
    """,
)
def null_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/A5: single-pass null gate — one conditional agg for ALL gated
    columns (reference looped filter().count() per column,
    scripts/validation.py:83-91)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), True)).alias("o_custkey_nulls"),
        F.count(F.when(F.col("o_orderdate").isNull(), True)).alias("o_orderdate_nulls"),
        F.count(F.when(F.col("o_totalprice").isNull(), True)).alias("o_totalprice_nulls"),
        F.count(F.lit(1)).alias("total_rows"),
    )


@register(
    "conditional_ratio",
    """
    SELECT p_brand,
           (COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) / COUNT(*)) AS return_rate,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def conditional_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: conditional-count ratio per brand (reference
    count(when(status=='returned'))/count(id),
    scripts/transformation.py:190,201)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    n = F.count(F.lit(1))
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            ratio(F.count(F.when(F.col("l_returnflag") == "R", True)), n).alias(
                "return_rate"
            ),
            n.alias("n_items"),
        )
    )


@register(
    "distinct_statuses",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: distinct (reference select().distinct(),
    scripts/validation.py:100-115) — partial+final hash dedup."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


register(
    "ordered_head",
    """
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice
    FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_orderdate ASC, o_orderkey ASC
    LIMIT 10
    """,
)(windows.ordered_head)


@register(
    "union_by_name",
    """
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_by_name_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName + dedup (reference reduce(unionByName) over part
    files, scripts/validation.py:78)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus"
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus"
    )
    return a.unionByName(b).dropDuplicates()


# ------------------------------------------------- scalar functions

@register(
    "scalar_json",
    """
    SELECT event_id,
           CAST(ts AS DATE) AS event_date,
           EXTRACT(year FROM ts) AS event_year,
           upper(event_type) AS event_type_uc,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           split_part(event_type, 'u', 1) AS et_head,
           (event_type LIKE '%error%') AS is_error
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F9: date extraction, JSON path (reference payload JSON at
    lambda/controller.py:24-36), string split/contains routing
    (lambda/controller.py:84-86), all JVM-side expressions."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.to_date("ts").alias("event_date"),
        F.year("ts").cast("long").alias("event_year"),
        F.upper("event_type").alias("event_type_uc"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.split(F.col("event_type"), "u").getItem(0).alias("et_head"),
        F.col("event_type").contains("error").alias("is_error"),
    )


# ------------------------------------------------- window analytics

register(
    "revenue_moving_avg",
    """
    WITH kpis AS (
      SELECT p_type AS category,
             CAST(o_orderdate AS DATE) AS order_date,
             SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS daily_revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT category, order_date, daily_revenue,
           lag(daily_revenue, 1) OVER w AS prev_revenue,
           avg(daily_revenue) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS revenue_ma7
    FROM kpis
    WINDOW w AS (PARTITION BY category ORDER BY order_date)
    """,
)(windows.revenue_moving_avg)

register(
    "topk_per_group",
    """
    WITH revenue AS (
      SELECT p_type, p_partkey,
             SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT p_type, p_partkey, revenue, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY p_type
                                   ORDER BY revenue DESC, p_partkey ASC) AS rank
      FROM revenue
    ) WHERE rank <= 3
    """,
)(windows.topk_per_group)

register(
    "kpi_rollup",
    """
    SELECT p_type AS category,
           CAST(o_orderdate AS DATE) AS order_date,
           SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS revenue,
           CAST(GROUPING(p_type) * 2 + GROUPING(CAST(o_orderdate AS DATE)) AS BIGINT) AS level
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY ROLLUP(1, 2)
    """,
)(windows.kpi_rollup)


# ------------------------------------------------- coalescing merge

@register(
    "merge_coalesce",
    """
    WITH orders_side AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date,
             COUNT(*) AS total_orders,
             COUNT(DISTINCT o_custkey) AS unique_customers,
             CAST(NULL AS DOUBLE) AS total_revenue,
             'orders' AS src
      FROM orders GROUP BY 1
    ),
    items_side AS (
      SELECT CAST(l_shipdate AS DATE) AS order_date,
             CAST(NULL AS BIGINT) AS total_orders,
             CAST(NULL AS BIGINT) AS unique_customers,
             SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS total_revenue,
             'order_items' AS src
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(s.order_date, t.order_date) AS order_date,
           COALESCE(s.total_orders, t.total_orders) AS total_orders,
           COALESCE(s.unique_customers, t.unique_customers) AS unique_customers,
           COALESCE(s.total_revenue, t.total_revenue) AS total_revenue,
           array_to_string(list_sort(list_distinct(
             list_concat(
               CASE WHEN t.src IS NULL THEN [] ELSE [t.src] END,
               CASE WHEN s.src IS NULL THEN [] ELSE [s.src] END
             ))), ',') AS data_sources
    FROM orders_side t FULL OUTER JOIN items_side s
      ON t.order_date = s.order_date
    """,
)
def merge_coalesce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: the coalescing KPI merge as one set-based statement.

    Simulates the reference's partial-source branch matrix
    (scripts/transformation.py:177-248 + helperfunction.py:110-208):
    an orders-only batch merged with an items-only batch; each side
    fills only its columns, coalesce resolves, provenance accumulates.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders_side = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
        .withColumn("total_revenue", F.lit(None).cast("double"))
        .withColumn("data_sources", F.array(F.lit("orders")))
    )
    items_side = (
        lineitem.groupBy(F.to_date("l_shipdate").alias("order_date"))
        .agg(money_sum("l_extendedprice").alias("total_revenue"))
        .withColumn("total_orders", F.lit(None).cast("long"))
        .withColumn("unique_customers", F.lit(None).cast("long"))
        .withColumn("data_sources", F.array(F.lit("order_items")))
    )
    merged = coalescing_merge(
        target=orders_side,
        source=items_side,
        keys=["order_date"],
        value_cols=["total_orders", "unique_customers", "total_revenue"],
        provenance_col="data_sources",
    )
    return merged.withColumn(
        "data_sources", F.array_join("data_sources", ",")
    )
