"""Named query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

Column names are aliased identically in Spark and SQL (the driver's
compare sorts columns by name before hashing).  Money aggregates use
exact integer cents on BOTH sides (see functions/scalars.py) so values
are bit-identical regardless of engine or parallelism.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.functions.scalars import money_sum, ratio
from data_pipeline_for_e_commerce_shop_spark.operators import (
    dedup,
    events,
    kpis,
    similarity,
    text,
    windows,
)
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


@register("category_kpis_sql", ORACLES["category_kpis"])
def category_kpis_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query through the OTHER front door: plain Spark SQL
    over registered temp views — proving the SQL entry point produces
    the identical plan and values as the DataFrame build (same oracle).
    """
    for t in ("lineitem", "orders", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT p_type AS category,
               to_date(o_orderdate) AS order_date,
               -- 100.0D: a bare 100.0 literal is DECIMAL in Spark SQL
               -- (unlike lit(100.0)), which would switch the division
               -- to decimal arithmetic and drift from the oracle.
               SUM(FLOOR(l_extendedprice * 100)) / 100.0D AS daily_revenue,
               SUM(FLOOR(l_extendedprice * 100)) / 100.0D
                 / COUNT(l_linenumber) AS avg_order_value,
               COUNT(IF(l_returnflag = 'R', 1, NULL))
                 / COUNT(l_linenumber) AS avg_return_rate
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
        """
    )


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


# ------------------------------------------------- dedup (charter)

# Shared oracle CTE: word 3-gram shingles per doc (matches
# operators/dedup._shingles; DuckDB slice toks[i:i+2] is 1-based
# inclusive == Spark slice(toks, i, 3)).
_SHINGLE_CTE = """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(string_split(text, ' ')) >= 3 THEN
          list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
            i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
        ELSE [] END)) AS shingle
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             MIN((h * 769169 + 12289) % 1000000007) AS mh0,
             MIN((h * 394913 + 52501) % 1000000007) AS mh1,
             MIN((h * 860273 + 86969) % 1000000007) AS mh2,
             MIN((h * 519787 + 23131) % 1000000007) AS mh3,
             MIN((h * 943237 + 65537) % 1000000007) AS mh4,
             MIN((h * 627433 + 41947) % 1000000007) AS mh5,
             MIN((h * 285377 + 91193) % 1000000007) AS mh6,
             MIN((h * 736061 + 33599) % 1000000007) AS mh7
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_no, concat_ws('-', mh0, mh1) AS band_hash FROM sig
      UNION ALL SELECT doc_id, 1, concat_ws('-', mh2, mh3) FROM sig
      UNION ALL SELECT doc_id, 2, concat_ws('-', mh4, mh5) FROM sig
      UNION ALL SELECT doc_id, 3, concat_ws('-', mh6, mh7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
"""

register(
    "dedup_exact",
    """
    SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)(dedup.exact_duplicates)

register(
    "dedup_minhash_lsh",
    _SHINGLE_CTE + "SELECT doc_a, doc_b FROM cand",
)(dedup.lsh_candidate_pairs)

# Connected components over the candidate-pair graph; the oracle is
# the same graph's transitive closure via a recursive CTE, so the
# iterative Spark propagation is value-checked end-to-end.
# Transitive-closure CTE chain shared by the clusters query and the
# dedup-aware split (one definition -> the two cannot drift).
_CLOSURE_CTES = (
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION SELECT doc_b, doc_a FROM cand
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    """
)

register(
    "dedup_clusters",
    _CLOSURE_CTES
    + """
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
    FROM reach GROUP BY src
    """,
)(dedup.duplicate_clusters)

register(
    "dedup_near_jaccard",
    _SHINGLE_CTE
    + """
    , sets AS (
      SELECT doc_id, list_sort(list(DISTINCT shingle)) AS sh_set
      FROM sh GROUP BY doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
             (len(list_intersect(sa.sh_set, sb.sh_set)) /
              len(list_distinct(list_concat(sa.sh_set, sb.sh_set)))) AS jaccard
      FROM cand
      JOIN sets sa ON cand.doc_a = sa.doc_id
      JOIN sets sb ON cand.doc_b = sb.doc_id
    ) WHERE jaccard >= 0.5
    """,
)(dedup.near_duplicates_jaccard)

# Signature-estimate calibration: replay BOTH the k=8 signatures and
# the exact shingle sets from the same CTE, then compare per candidate
# pair.  All ratios divide small exact integers, so est/exact/abs_err
# hash bit-identically.
register(
    "dedup_minhash_estimate",
    _SHINGLE_CTE
    + """
    , sets AS (
      SELECT doc_id, list_sort(list(DISTINCT shingle)) AS sh_set
      FROM sh GROUP BY doc_id
    )
    SELECT doc_a, doc_b, n_match_components,
           n_match_components / 8 AS est_jaccard, jaccard,
           abs(n_match_components / 8 - jaccard) AS abs_err
    FROM (
      SELECT doc_a, doc_b,
             CAST((sga.mh0 = sgb.mh0)::INT + (sga.mh1 = sgb.mh1)::INT
                + (sga.mh2 = sgb.mh2)::INT + (sga.mh3 = sgb.mh3)::INT
                + (sga.mh4 = sgb.mh4)::INT + (sga.mh5 = sgb.mh5)::INT
                + (sga.mh6 = sgb.mh6)::INT + (sga.mh7 = sgb.mh7)::INT
               AS BIGINT) AS n_match_components,
             (len(list_intersect(sta.sh_set, stb.sh_set)) /
              len(list_distinct(list_concat(sta.sh_set, stb.sh_set))))
               AS jaccard
      FROM cand
      JOIN sig sga ON cand.doc_a = sga.doc_id
      JOIN sig sgb ON cand.doc_b = sgb.doc_id
      JOIN sets sta ON cand.doc_a = sta.doc_id
      JOIN sets stb ON cand.doc_b = stb.doc_id
    )
    """,
)(dedup.minhash_estimate_quality)

# Simhash signature CTE, shared by the signature query and the pair
# query: ends with table sigt(doc_id, simhash).
_SIMHASH_SIG_CTE = (
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(string_split(text, ' ')) >= 3 THEN
          list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
            i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
        ELSE [] END)) AS shingle
      FROM documents
    ),
    hb AS (SELECT doc_id, md5(shingle) AS h FROM sh),
    votes AS (
      SELECT doc_id,
    """
    + ",\n".join(
        "SUM(((strpos('0123456789abcdef', substr(h, %d, 1)) - 1) %% 2) * 2 - 1) AS v%d"
        % (b + 1, b)
        for b in range(16)
    )
    + """
      FROM hb GROUP BY doc_id
    ),
    sigt AS (
      SELECT doc_id, CAST("""
    + " + ".join(
        "(CASE WHEN v%d > 0 THEN %d ELSE 0 END)" % (b, 1 << b) for b in range(16)
    )
    + """ AS BIGINT) AS simhash
      FROM votes
    )
"""
)

register(
    "dedup_simhash",
    _SIMHASH_SIG_CTE + "SELECT doc_id, simhash FROM sigt",
)(dedup.simhash_signatures)

# Half-blocking pair search: a Hamming<=3 pair shares an 8-bit half
# whenever one half is clean; the bucket join and the XOR popcount
# verify are both plain SQL, so this graduates from rows-only to a
# full hash-checked oracle.
register(
    "dedup_simhash_pairs",
    _SIMHASH_SIG_CTE
    + """
    , blocks AS (
      SELECT doc_id, simhash, 0 AS block_no, simhash % 256 AS block_key FROM sigt
      UNION ALL
      SELECT doc_id, simhash, 1, simhash // 256 FROM sigt
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM blocks a JOIN blocks b
      ON a.block_no = b.block_no AND a.block_key = b.block_key
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)(dedup.simhash_near_pairs)


# Day-2 dedup: a new batch (doc_id % 5 == 4) gated against the corpus
# via exact-fingerprint and LSH-band semi joins; the oracle replays the
# same split, probes, and decision CASE.
register(
    "dedup_incremental",
    _SHINGLE_CTE
    + """
    , fps AS (
      SELECT doc_id, md5(text) AS fp, (doc_id % 5 = 4) AS is_new
      FROM documents
    ),
    exact AS (
      SELECT DISTINCT b.doc_id
      FROM fps b JOIN fps c ON b.fp = c.fp
      WHERE b.is_new AND NOT c.is_new
    ),
    near AS (
      SELECT DISTINCT nb.doc_id
      FROM bands nb
      JOIN fps fn ON fn.doc_id = nb.doc_id AND fn.is_new
      JOIN bands cb ON nb.band_no = cb.band_no
                   AND nb.band_hash = cb.band_hash
      JOIN fps fc ON fc.doc_id = cb.doc_id AND NOT fc.is_new
    )
    SELECT f.doc_id,
           (e.doc_id IS NOT NULL) AS is_exact_dup,
           (nr.doc_id IS NOT NULL) AS is_near_dup,
           CASE WHEN e.doc_id IS NOT NULL THEN 'drop_exact'
                WHEN nr.doc_id IS NOT NULL THEN 'drop_near'
                ELSE 'keep' END AS decision
    FROM fps f
    LEFT JOIN exact e ON f.doc_id = e.doc_id
    LEFT JOIN near nr ON f.doc_id = nr.doc_id
    WHERE f.is_new
    """,
)(dedup.incremental_dedup)


# The LSH planes come from ONE source of truth —
# similarity.plane_signs — embedded here as SQL literal arrays, so the
# bucketing, multi-probe fan-out, and verify are reproduced in plain
# SQL and the seed rule cannot drift between the Spark and oracle
# sides.
def _plane_literal(p: int, dim: int = 64) -> str:
    return (
        "["
        + ", ".join(f"{s}.0" for s in similarity.plane_signs(p, dim))
        + "]"
    )


_EMB_BUCKET_EXPR = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_plane_literal(p)}) > 0"
    f" THEN {1 << p} ELSE 0 END)"
    for p in range(similarity.N_PLANES)
)

_EMB_PROBES = ", ".join(
    ["bucket"] + [f"xor(bucket, {1 << p})" for p in range(similarity.N_PLANES)]
)


# Pair scoring runs on MICRO-UNIT QUANTIZED vectors (floor(x*1e6) as
# int64): every dot is exact in int64 AND float64 (max 6.4e13 < 2^53),
# so numpy's matmul in the applyInPandas stage and list_dot_product
# here produce the same number; only the norm divide is IEEE.
@register(
    "dedup_embedding_cosine",
    f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bk AS (
      SELECT vec_id,
             CAST(list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT))
                  AS DOUBLE[]) AS m,
             {_EMB_BUCKET_EXPR} AS bucket
      FROM e
    ),
    probes AS (
      SELECT vec_id, m, unnest([{_EMB_PROBES}]) AS probe FROM bk
    )
    SELECT vec_a, vec_b, cosine FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_dot_product(a.m, b.m)
                   / (sqrt(list_dot_product(a.m, a.m))
                      * sqrt(list_dot_product(b.m, b.m))), 9) AS cosine
      FROM probes a JOIN bk b ON a.probe = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.3
    """,
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_near_duplicates(spark, sf_dir, threshold=0.3)


# ------------------------------------------- similarity search (charter)

_COSINE_TOPK_ORACLE = """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
      SELECT query_id, corpus_id,
             round(list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 9) AS cosine
      FROM q CROSS JOIN c WHERE query_id != corpus_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
"""

register("ann_brute_topk", _COSINE_TOPK_ORACLE)(similarity.brute_force_topk)

# LSH-bucketed top-k: the md5-derived hyperplanes are recomputed as
# literal ±1 arrays (_plane_literal above) so the bucketing, the
# Hamming-1 multi-probe fan-out, and the in-bucket exact re-scoring are
# all reproduced in SQL — a full hash-checked oracle, not rows-only.
_LSH_TOPK_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bk AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
             {_EMB_BUCKET_EXPR} AS bucket
      FROM e
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, nrm AS qn,
             unnest([{_EMB_PROBES}]) AS probe
      FROM bk WHERE vec_id < 5
    ),
    scored AS (
      SELECT query_id, c.vec_id AS corpus_id,
             round(list_dot_product(qv, c.v) / (qn * c.nrm), 9) AS cosine
      FROM q JOIN bk c ON q.probe = c.bucket
      WHERE query_id != c.vec_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """

register("ann_lsh_topk", _LSH_TOPK_ORACLE)(similarity.lsh_topk)

# IVF-bucketed top-k (scale path #2): inverted centroid lists + n_probe
# re-scoring.  EVERYTHING is deterministic — the centroid "training
# sample" is a Knuth-hash order LIMIT, assignment is a window over a
# cross join — so the whole pipeline replays in SQL: full value-hash
# oracle.
_IVF_TOPK_ORACLE = """
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cluster_id, v AS cv, nrm AS cn
      FROM n
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
      LIMIT 8
    ),
    corpus AS (
      SELECT corpus_id, c_emb, c_norm, cluster_id FROM (
        SELECT n.vec_id AS corpus_id, n.v AS c_emb, n.nrm AS c_norm,
               cent.cluster_id,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC,
                          cent.cluster_id ASC) AS pr
        FROM n CROSS JOIN cent
      ) WHERE pr <= 1
    ),
    q AS (
      SELECT query_id, q_emb, q_norm, cluster_id FROM (
        SELECT n.vec_id AS query_id, n.v AS q_emb, n.nrm AS q_norm,
               cent.cluster_id,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC,
                          cent.cluster_id ASC) AS pr
        FROM n CROSS JOIN cent
        WHERE n.vec_id < 5
      ) WHERE pr <= 2
    ),
    scored AS (
      SELECT query_id, corpus_id,
             round(list_dot_product(q_emb, c_emb) / (q_norm * c_norm), 9) AS cosine
      FROM q JOIN corpus USING (cluster_id)
      WHERE query_id != corpus_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """

register("ann_ivf_topk", _IVF_TOPK_ORACLE)(similarity.ivf_topk)

# Recall gauge: |approx ∩ brute| / k per query — the quality dial every
# ANN deployment needs next to its latency dial.  All three pipelines
# are md5/Knuth-deterministic, so the recall itself is hash-checkable:
# the oracle simply composes the three top-k oracles as CTE subqueries.
register(
    "ann_recall",
    f"""
    WITH brute AS ({_COSINE_TOPK_ORACLE}),
         lsh AS ({_LSH_TOPK_ORACLE}),
         ivf AS ({_IVF_TOPK_ORACLE})
    SELECT query_id, lsh_hits / 5.0 AS lsh_recall, ivf_hits / 5.0 AS ivf_recall
    FROM (
      SELECT b.query_id, COUNT(l.corpus_id) AS lsh_hits
      FROM brute b LEFT JOIN lsh l USING (query_id, corpus_id) GROUP BY 1
    ) JOIN (
      SELECT b.query_id, COUNT(v.corpus_id) AS ivf_hits
      FROM brute b LEFT JOIN ivf v USING (query_id, corpus_id) GROUP BY 1
    ) USING (query_id)
    """,
)(similarity.ann_recall)


# ------------------------------------------------- text analysis (charter)

register(
    "text_lang_id",
    """
    WITH scores AS (
      SELECT doc_id, lang AS labeled_lang,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','fast','order','key'], t))) AS score_en,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['data','merge','window','batch'], t))) AS score_de,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['join','filter','row','table'], t))) AS score_es,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['spark','query','stream','vector'], t))) AS score_fr
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE
             WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
             WHEN score_es >= score_fr THEN 'es'
             ELSE 'fr'
           END AS pred_lang,
           CAST(greatest(score_en, score_de, score_es, score_fr) AS BIGINT) AS pred_score
    FROM scores
    """,
)(text.language_id)

register(
    "text_quality",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           (len(list_distinct(toks)) / len(toks)) AS type_token_ratio,
           (len(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) / len(toks)) AS stopword_ratio,
           ((n_chars - (len(toks) - 1)) / len(toks)) AS mean_token_len,
           ((len(list_distinct(toks)) / len(toks)) * 0.5 +
            (len(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) / len(toks)) * 0.25 +
            0.25) AS quality_score
    FROM t
    """,
)(text.quality_scores)

register(
    "text_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
           CAST(ceil(length(text) / 4) AS BIGINT) AS len4_token_estimate
    FROM documents
    """,
)(text.token_counts)

register(
    "text_tfidf_topk",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term, tf,
             round(tf * ln((n + 1.0) / (df + 1.0)), 9) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)(text.tfidf_top_terms)

register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
           CAST(('0x' || substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS fp60
    FROM documents
    """,
)(text.fingerprints)


register(
    "text_stratified_sample",
    """
    SELECT doc_id, lang, bucket FROM (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('sample-' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    WHERE bucket < CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 40
                             WHEN 'es' THEN 60 WHEN 'fr' THEN 80
                             WHEN 'zh' THEN 90 ELSE 0 END
    """,
)(text.stratified_sample)

register(
    "text_zipf_topk",
    """
    WITH freq AS (
      SELECT term, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
      ) GROUP BY 1
    )
    SELECT term, n, rank FROM (
      SELECT term, n,
             row_number() OVER (ORDER BY n DESC, term ASC) AS rank
      FROM freq
    ) WHERE rank <= 20
    """,
)(text.zipf_top_terms)

# Rare-token (LM-filter proxy) score: the rarity test is the integer
# cross-product n*vocab < corpus_tokens — no division, so Spark and
# DuckDB agree bit-for-bit; rare_frac divides two exact integers.
register(
    "text_rare_tokens",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS corpus_tokens,
             COUNT(*) AS vocab_size
      FROM freq
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(COUNT(*) FILTER (f.n * tot.vocab_size < tot.corpus_tokens)
             AS BIGINT) AS n_rare_tokens,
           CAST(COUNT(*) FILTER (f.n * tot.vocab_size < tot.corpus_tokens)
             AS BIGINT) / COUNT(*) AS rare_frac,
           MIN(f.n) AS min_token_freq
    FROM toks t JOIN freq f USING (token) CROSS JOIN tot
    GROUP BY doc_id
    """,
)(text.rare_token_scores)


# ------------------------------------------------------------ PII scan
# The testdata carries no organic PII, so the query derives a
# deterministic PII-bearing column from event/user ids (both engines
# build the identical string), then applies the GENERIC privacy
# operator.  Patterns are single-sourced from privacy.PII_PATTERNS into
# the oracle, so Spark and DuckDB run the same regexes.

def _pii_oracle() -> str:
    from data_pipeline_for_e_commerce_shop_spark.quality.privacy import (
        PII_PATTERNS,
    )

    counts = ",\n             ".join(
        f"len(regexp_extract_all(contact_blob, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "contact_blob"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    sums = ",\n           ".join(
        f"CAST(SUM(n_{name}) AS BIGINT) AS n_{name}s"
        for name, _, _ in PII_PATTERNS
    )
    return f"""
    WITH derived AS (
      SELECT event_type,
             concat('uid ', user_id, ' mail u', user_id,
                    '@shop.example.com ip 10.', user_id % 200, '.',
                    event_id % 250, '.7 call 555-',
                    lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0'))
               AS contact_blob
      FROM events
    ),
    scanned AS (
      SELECT event_type,
             {counts},
             {red} AS redacted_text
      FROM derived
    )
    SELECT event_type, COUNT(*) AS n_events,
           {sums},
           CAST(SUM(length(redacted_text)) AS BIGINT) AS n_redacted_chars
    FROM scanned GROUP BY event_type
    """


@register(
    "customer_k_anonymity",
    """
    SELECT c_nationkey, c_mktsegment, class_size, below_k FROM (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
             COUNT(*) < 5 AS below_k
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    """,
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table over the
    (nation, market-segment) quasi-identifier pair — the generic
    quality.privacy.k_anonymity operator applied to the demographic
    columns a release review would flag."""
    from data_pipeline_for_e_commerce_shop_spark.quality.privacy import (
        k_anonymity,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    )
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=5)


@register("events_pii_scan", _pii_oracle())
def events_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over a derived contact blob, rolled up by
    event_type: per-type match counts and total redacted length (the
    byte-level check that redaction produced identical text in both
    engines).  The scan itself is quality.privacy.pii_scan — pure
    projections, no shuffle beyond the final small rollup."""
    from data_pipeline_for_e_commerce_shop_spark.quality.privacy import (
        PII_PATTERNS,
        pii_scan,
    )

    ev = load_table(spark, sf_dir, "events")
    derived = ev.select(
        "event_type",
        F.concat(
            F.lit("uid "),
            F.col("user_id").cast("string"),
            F.lit(" mail u"),
            F.col("user_id").cast("string"),
            F.lit("@shop.example.com ip 10."),
            (F.col("user_id") % 200).cast("string"),
            F.lit("."),
            (F.col("event_id") % 250).cast("string"),
            F.lit(".7 call 555-"),
            F.lpad((F.col("event_id") % 10000).cast("string"), 4, "0"),
        ).alias("contact_blob"),
    )
    scanned = pii_scan(derived, "contact_blob")
    sums = [
        F.sum(f"n_{name}").alias(f"n_{name}s") for name, _, _ in PII_PATTERNS
    ]
    return scanned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        *sums,
        F.sum(F.length("redacted_text")).alias("n_redacted_chars"),
    )

register(
    "text_quality_gate",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    f AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) / len(toks) AS ttr,
             len(list_filter(toks,
                 x -> list_contains(['the','a','and','of','to'], x)))
               / len(toks) AS stop_ratio
      FROM t
    )
    SELECT doc_id,
           (reasons = '') AS keep,
           reasons
    FROM (
      SELECT doc_id,
             concat_ws(',',
               CASE WHEN n_tokens < 8 THEN 'short' END,
               CASE WHEN ttr < 0.45 THEN 'low_ttr' END,
               CASE WHEN stop_ratio > 0.35 THEN 'stopword_heavy' END
             ) AS reasons
      FROM f
    )
    """,
)(text.quality_gate)

register(
    "embedding_stats",
    """
    SELECT label,
           COUNT(*) AS n_vecs,
           (SUM(CAST(FLOOR(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[])))
                           * 1000000) AS BIGINT)) / 1000000.0) / COUNT(*) AS mean_norm,
           (SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT))
             / 1000000.0) / COUNT(*) AS mean_c0
    FROM embeddings
    GROUP BY label
    """,
)(similarity.embedding_stats)


# ------------------------------------------------- event analytics

register(
    "events_hourly",
    """
    SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS hour_epoch,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)(events.hourly_window)

# Shared by the batch sessionizer, its streaming session_window dual,
# and the applyInPandasWithState dual (three engines' algorithms, one
# oracle).  The running SUM(new_session) OVER is CAST to BIGINT: DuckDB
# projects windowed integer SUMs as HUGEINT, which pandas materializes
# as float64 — the driver would hash 2.0 vs Spark's 2 (CORRECTNESS_r02
# root cause; same class guarded in cumulative_active_users and
# survival_km below).
_SESSIONIZE_ORACLE = """
    WITH marked AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
                         OVER (PARTITION BY user_id ORDER BY epoch_sec, event_id) > 90
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                                            ORDER BY epoch_sec, event_id
                                            ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_no
      FROM marked
    )
    SELECT user_id, session_no,
           MIN(epoch_sec) AS session_start,
           MAX(epoch_sec) AS session_end,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM numbered GROUP BY 1, 2
    """

register("events_sessionize", _SESSIONIZE_ORACLE)(events.sessionize)

from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (  # noqa: E402
    stream_hourly_kpis,
)

# A REAL Structured Streaming job (readStream -> watermark -> tumbling
# window -> availableNow drain): decomposable aggregates make the
# streamed result bit-identical to the batch dual, so it gets a full
# value-hash oracle — the stream/batch duality gate.
register(
    "events_stream_hourly",
    """
    SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS hour_epoch,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)(stream_hourly_kpis)

from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (  # noqa: E402
    stream_sessionize,
)

# Streaming sessionization (session_window + availableNow drain) held
# to the IDENTICAL oracle as the batch lag/running-sum form — the
# strongest stream/batch duality statement in the suite: two different
# engines' algorithms (stateful window merge vs window functions) and
# a third engine's SQL all land on the same value hash.
register("events_stream_sessionize", _SESSIONIZE_ORACLE)(stream_sessionize)

from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (  # noqa: E402
    stream_interval_join,
)

# Shared by the batch interval join (registered below) and its
# stream-stream dual: one oracle, two engines' algorithms.
_INTERVAL_JOIN_ORACLE = """
    SELECT p.event_id,
           p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS p_sec,
           COUNT(c.ts) AS n_clicks,
           COALESCE(SUM(CAST(FLOOR(c.value*100) AS BIGINT)), 0)/100.0 AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND floor(epoch(c.ts)) >= floor(epoch(p.ts)) - 3600
     AND floor(epoch(c.ts)) <  floor(epoch(p.ts))
    GROUP BY 1, 2, 3
    """

# Stream-STREAM join (two watermarked readStream sources, equi key +
# event-time range predicate) — the stateful join capability itself,
# held to the SAME oracle as the batch interval join.
register(
    "events_stream_interval_join", _INTERVAL_JOIN_ORACLE
)(stream_interval_join)

from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (  # noqa: E402
    stream_enriched_kpis,
)

# Stream-STATIC broadcast enrichment (dim re-read per micro-batch) —
# the third streaming join shape; decomposable aggregates give it the
# same full value-hash oracle as a batch join+agg.
register(
    "events_stream_enriched",
    """
    SELECT c_mktsegment AS segment,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)(stream_enriched_kpis)

register(
    "events_funnel",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events GROUP BY 1
    """,
)(events.event_type_funnel)


# ------------------------------------------------- multimodal (charter)

from data_pipeline_for_e_commerce_shop_spark.operators.multimodal import (  # noqa: E402
    multimodal_features,
)

# Arrow-batched mapInPandas feature extraction.  The stubbed features
# are deterministic byte statistics of the utf-8 payload, so the whole
# output IS SQL-expressible: DuckDB recomputes every byte from
# hex(encode(text)) digit pairs — a full value-hash oracle around the
# Python mapInPandas stage (plumbing also covered by
# tests/test_multimodal.py).
register(
    "multimodal_features",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    ),
    b AS (
      SELECT media_id, modality, nb, hx,
             CASE WHEN nb > 0 THEN
               list_transform(generate_series(1, nb),
                 i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1))
             ELSE [] END AS bytes
      FROM m
    )
    SELECT media_id, modality,
           CAST(nb AS BIGINT) AS n_bytes,
           CASE WHEN nb > 0 THEN CAST(list_sum(bytes) AS DOUBLE) / nb
                ELSE 0.0 END AS byte_mean,
           CAST(len(list_distinct(bytes)) AS INT) AS distinct_bytes,
           lower(substr(hx, 1, 8)) AS head_hex
    FROM b
    """,
)(multimodal_features)

from data_pipeline_for_e_commerce_shop_spark.operators.multimodal import (  # noqa: E402
    multimodal_frames,
)

# The 1:N frame-sampling mapInPandas shape (fixed 64-byte frames, every
# 2nd kept).  Frames are slices of the utf-8 payload, so DuckDB replays
# the sampling as hex-substring arithmetic — full value-hash oracle
# around a cardinality-changing Python stage.
register(
    "multimodal_frames",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    ),
    fr AS (
      SELECT media_id, hx, nb,
             unnest(range(0, CAST(ceil(nb / 64.0) AS BIGINT), 2)) AS frame_no
      FROM m WHERE nb > 0
    ),
    s AS (
      SELECT media_id, frame_no,
             least(64, nb - frame_no * 64) AS frame_len,
             substr(hx, frame_no * 128 + 1, 128) AS fhx
      FROM fr
    )
    SELECT media_id,
           CAST(frame_no AS BIGINT) AS frame_no,
           CAST(frame_len AS BIGINT) AS frame_len,
           CAST(list_sum(list_transform(generate_series(1, frame_len),
                 i -> (strpos('0123456789ABCDEF', substr(fhx, 2*i-1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF', substr(fhx, 2*i, 1)) - 1)))
                AS BIGINT) AS byte_sum,
           lower(substr(fhx, 1, 8)) AS head_hex
    FROM s
    """,
)(multimodal_frames)


# ------------------------------------------------- as-of join (extension)

from data_pipeline_for_e_commerce_shop_spark.operators.asof import (  # noqa: E402
    purchases_last_click,
)

register(
    "asof_purchase_click",
    """
    SELECT a.event_id,
           a.user_id,
           CAST(floor(epoch(a.ts)) AS BIGINT) AS purchase_epoch,
           FLOOR(a.value * 100) / 100.0 AS value,
           -- -1 sentinel keeps the column null-free BIGINT on both
           -- sides (NULL-bearing int -> float64 under pandas).
           COALESCE(b.event_id, -1) AS click_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)(purchases_last_click)


# ------------------------------------------------- cube rollup (extension)

@register(
    "brand_category_cube",
    """
    SELECT p_brand, p_type,
           SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS revenue,
           COUNT(*) AS n_items,
           CAST(GROUPING(p_brand) * 2 + GROUPING(p_type) AS BIGINT) AS level
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY CUBE(p_brand, p_type)
    """,
)
def brand_category_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(brand, category): all four aggregation levels in one Expand
    + single hash agg (SURVEY §2.4 extension — the KPI hierarchy the
    reference recomputes per level)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .cube("p_brand", "p_type")
        .agg(
            money_sum("l_extendedprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            F.grouping_id("p_brand", "p_type").alias("level"),
        )
    )


# --------------------------------------------- interval join (extension)

register(
    "events_interval_join", _INTERVAL_JOIN_ORACLE
)(events.purchase_click_window)


# ------------------------------------------ string parsing (F8/P9 family)

@register(
    "priority_parse",
    """
    SELECT CAST(regexp_extract(o_orderpriority, '([0-9]+)-(.*)', 1) AS BIGINT)
             AS priority_rank,
           lower(regexp_extract(o_orderpriority, '([0-9]+)-(.*)', 2))
             AS priority_label,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY 1, 2
    """,
)
def priority_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-string parsing (the reference's filename parser
    pattern, lambda/s3_validation.py:115-125, applied to a data
    column): regexp_extract of '<rank>-<LABEL>' into typed parts, then
    a grouped profile.  All JVM-side string expressions.

    The parse happens ABOVE the aggregation: grouping on the raw
    5-value string (which functionally determines the parsed pair)
    keeps the regexp out of the countDistinct expand, so it runs 5
    times instead of per input row — ~3x faster at sf0.1.
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    return agg.select(
        F.regexp_extract("o_orderpriority", r"([0-9]+)-(.*)", 1)
        .cast("long")
        .alias("priority_rank"),
        F.lower(F.regexp_extract("o_orderpriority", r"([0-9]+)-(.*)", 2))
        .alias("priority_label"),
        "n_orders",
        "n_customers",
    )


# -------------------------------------------- quantiles (extension)

@register(
    "segment_price_quantiles",
    """
    SELECT c_mktsegment,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def segment_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete quantiles of order value per market segment.

    percentile_disc picks an actual data value (no interpolation), so
    Spark and the oracle agree bit-exactly on doubles.  customer is
    dim-sized -> broadcast; the agg is a single shuffle on segment.
    At 100 TB swap in approx_percentile(...) for one-pass sketching.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p25"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ------------------------------------------- set operations (U-family)

@register(
    "customer_retention_setops",
    """
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1996)
    SELECT 'retained' AS cohort, o_custkey
    FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'churned' AS cohort, o_custkey
    FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    """,
)
def customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (SURVEY §2.7 — absent in the reference):
    customers active in 1995 split into retained (also in 1996) vs
    churned.  Both set ops hash-partition on the key; the two cohort
    branches reuse the same year-filtered scans."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = (
        orders.where(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
    )
    y96 = (
        orders.where(F.year("o_orderdate") == 1996)
        .select("o_custkey")
        .distinct()
    )
    retained = y95.intersect(y96).select(
        F.lit("retained").alias("cohort"), "o_custkey"
    )
    churned = y95.exceptAll(y96).select(
        F.lit("churned").alias("cohort"), "o_custkey"
    )
    return retained.unionByName(churned)


# ------------------------------------ multi-hop dimensional join (J-chain)

@register(
    "regional_revenue",
    """
    SELECT r_name AS region, n_name AS nation,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))/100.0
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
    GROUP BY 1, 2
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table star chain: fact ⋈ 5 dims with a
    local-supplier residual predicate (c_nationkey = s_nationkey).

    The reference never joins more than 3 tables
    (scripts/transformation.py:180-184); this exercises chained
    broadcasts: customer, supplier, nation, region are all broadcast,
    so the fact side shuffles only for the lineitem⋈orders equi join
    (both fact-sized at scale — a shuffle join is the right plan) and
    for the final groupBy on (region, nation), 125 groups.  Discounted
    revenue uses exact integer cents (the product is computed
    identically left-to-right on both engines)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# ------------------------------------------ rank-family windows (§2.5)

register(
    "customer_spend_quartiles",
    """
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT))/100.0 AS total_spend,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT o_custkey, total_spend, n_orders,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 9) AS pct_rank
    FROM spend
    WINDOW w AS (ORDER BY total_spend DESC, o_custkey ASC)
    """,
)(windows.customer_spend_quartiles)


# ------------------------------------------ grouping sets (§2.4)

register(
    "grouping_sets_kpis",
    """
    SELECT p_brand, p_type,
           SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))/100.0 AS revenue,
           COUNT(*) AS n_items,
           CAST(GROUPING(p_brand) * 2 + GROUPING(p_type) AS BIGINT) AS level
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY GROUPING SETS ((p_brand), (p_type), ())
    """,
)(windows.grouping_sets_kpis)


# --------------------------------------------- skew mitigation (§4.4)

from data_pipeline_for_e_commerce_shop_spark.operators.skew import (  # noqa: E402
    event_type_salted_kpis,
)

register(
    "event_type_salted_kpis",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value*100) AS BIGINT))/100.0 AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)(event_type_salted_kpis)


# --------------------------------------- cohort / retention (extension)

from data_pipeline_for_e_commerce_shop_spark.operators import (  # noqa: E402
    retention,
)

register(
    "cohort_retention",
    """
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ),
    c AS (
      SELECT o_custkey, MIN(date_trunc('month', d)) AS cohort_month
      FROM o GROUP BY 1
    )
    SELECT cohort_month,
           CAST((year(date_trunc('month', d)) - year(cohort_month)) * 12
                + (month(date_trunc('month', d)) - month(cohort_month))
                AS BIGINT) AS month_offset,
           COUNT(DISTINCT o.o_custkey) AS n_customers
    FROM o JOIN c USING (o_custkey)
    GROUP BY 1, 2
    """,
)(retention.cohort_retention)

register(
    "cumulative_active_users",
    """
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
    ),
    d AS (SELECT day, COUNT(*) AS n_new_users FROM fs GROUP BY 1)
    SELECT day, n_new_users,
           -- BIGINT cast: windowed integer SUM projects HUGEINT in
           -- DuckDB -> float64 via pandas (see _SESSIONIZE_ORACLE).
           CAST(SUM(n_new_users) OVER (ORDER BY day
                                       ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_users
    FROM d
    """,
)(retention.cumulative_active_users)

register(
    "rolling_active_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    contrib AS (
      SELECT du.user_id, d.day
      FROM du JOIN days d ON d.day >= du.day AND d.day <= du.day + 6
    )
    SELECT day, COUNT(DISTINCT user_id) AS active_7d
    FROM contrib GROUP BY 1
    """,
)(retention.rolling_active_users)


# ------------------------------------------------ basket / conversion

from data_pipeline_for_e_commerce_shop_spark.operators import (  # noqa: E402
    basket,
)

register(
    "basket_pairs",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    c AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_orders
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders, rank FROM (
      SELECT *, row_number() OVER (ORDER BY n_orders DESC, part_a, part_b)
                  AS rank
      FROM c
    ) WHERE rank <= 20
    """,
)(basket.part_pair_topk)

register(
    "monthly_status_pivot",
    """
    SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
           SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(FLOOR(o_totalprice*100) AS BIGINT) END)/100.0
             AS revenue_f,
           SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(FLOOR(o_totalprice*100) AS BIGINT) END)/100.0
             AS revenue_o,
           SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(FLOOR(o_totalprice*100) AS BIGINT) END)/100.0
             AS revenue_p
    FROM orders GROUP BY 1
    """,
)(kpis.monthly_status_pivot)

register(
    "time_to_conversion",
    """
    WITH pu AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS c,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS p
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    )
    SELECT CAST(FLOOR((p - c) / 3600.0) AS BIGINT) AS hours_to_convert,
           COUNT(*) AS n_users
    FROM pu
    WHERE c IS NOT NULL AND p >= c
    GROUP BY 1
    """,
)(events.time_to_conversion)

# Dup-rate by PREDICTED language: the oracle replays the lexicon argmax
# (same CASE as text_lang_id), the fp-family window, and the rollup.
register(
    "dup_rate_by_language",
    """
    WITH s AS (
      SELECT md5(text) AS fp,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','fast','order','key'], t))) AS score_en,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['data','merge','window','batch'], t))) AS score_de,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['join','filter','row','table'], t))) AS score_es,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['spark','query','stream','vector'], t))) AS score_fr
      FROM documents
    ),
    tagged AS (
      SELECT CASE
               WHEN score_de >= score_en AND score_de >= score_es
                    AND score_de >= score_fr THEN 'de'
               WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
               WHEN score_es >= score_fr THEN 'es'
               ELSE 'fr'
             END AS pred_lang,
             fp
      FROM s
    ),
    flagged AS (
      SELECT pred_lang,
             COUNT(*) OVER (PARTITION BY fp) > 1 AS is_dup
      FROM tagged
    )
    SELECT pred_lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN is_dup THEN 1 END) AS n_dup_docs,
           COUNT(CASE WHEN is_dup THEN 1 END) / COUNT(*) AS dup_rate
    FROM flagged GROUP BY 1
    """,
)(dedup.dup_rate_by_language)

register(
    "text_bigram_topk",
    """
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t WHERE len(toks) >= 2
    ),
    freq AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1)
    SELECT bigram, n, rank FROM (
      SELECT bigram, n,
             row_number() OVER (ORDER BY n DESC, bigram ASC) AS rank
      FROM freq
    ) WHERE rank <= 20
    """,
)(text.bigram_top_terms)

register(
    "text_repetition",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    freq AS (
      SELECT doc_id, max(c) AS top_word_count FROM (
        SELECT doc_id, w, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(ws) AS w FROM base
        ) GROUP BY 1, 2
      ) GROUP BY 1
    ),
    tri AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                            i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]) AS tg
      FROM base
    )
    SELECT b.doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
           (1.0 - len(list_distinct(ws)) / len(ws)) AS word_rep_ratio,
           CAST(top_word_count AS BIGINT) AS top_word_count,
           (top_word_count / len(ws)) AS top_word_ratio,
           CAST(len(tg) AS BIGINT) AS n_trigrams,
           CASE WHEN len(tg) > 0
                THEN 1.0 - len(list_distinct(tg)) / len(tg)
                ELSE 0.0 END AS trigram_dup_ratio
    FROM base b JOIN freq USING (doc_id) JOIN tri USING (doc_id)
    """,
)(text.repetition_scores)


# --------------------------------------- chunking / quantization / anomaly

from data_pipeline_for_e_commerce_shop_spark.operators import (  # noqa: E402
    outliers,
)

register(
    "text_chunks",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
           array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text,
           len(toks[s + 1 : s + 32]) AS n_tokens
    FROM t CROSS JOIN UNNEST(range(0, len(toks), 24)) AS u(s)
    WHERE len(toks) > 0
    """,
)(text.chunk_documents)

register(
    "embedding_quantize",
    """
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
    SELECT vec_id, i, CAST(floor(v[i] / nrm * 127 + 0.5) AS BIGINT) AS q
    FROM n CROSS JOIN UNNEST(range(1, len(v) + 1)) AS u(i)
    """,
)(similarity.quantize_embeddings)

register(
    "price_outliers",
    """
    WITH f AS (
      SELECT o_orderkey, c_mktsegment,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    st AS (
      SELECT c_mktsegment, COUNT(*) AS n,
             SUM(cents) AS s, SUM(cents * cents) AS ss
      FROM f GROUP BY 1
    ),
    seg AS (
      SELECT c_mktsegment,
             CAST(s AS DOUBLE) / n AS mean_cents,
             sqrt((CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / n))
                  / (n - 1)) AS std_cents
      FROM st
    )
    SELECT o_orderkey, f.c_mktsegment AS segment, cents / 100.0 AS price,
           round((cents - mean_cents) / std_cents, 6) AS z
    FROM f JOIN seg USING (c_mktsegment)
    WHERE abs(round((cents - mean_cents) / std_cents, 6)) >= 1.7
    """,
)(outliers.price_outliers)

# Ordered funnel: the Spark side walks each user's sorted event array
# with a fold; the oracle is an INDEPENDENT algorithm (3-level min
# chain) that must land on the same three counts.
register(
    "funnel_ordered",
    """
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (SELECT user_id, MIN(s) AS fv FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(s) AS fc FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND s >= fv GROUP BY 1),
    p AS (SELECT e.user_id, MIN(s) AS fp FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND s >= fc GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)(events.ordered_funnel)


# ------------------------------------------- reconciliation / range frame

register(
    "order_reconciliation",
    """
    WITH li AS (
      SELECT l_orderkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) * 100) AS BIGINT))
               AS recomputed_cents
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o_orderkey, o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS booked_cents,
             recomputed_cents
      FROM orders JOIN li ON o_orderkey = l_orderkey
    )
    SELECT o_orderkey, status,
           booked_cents / 100.0 AS booked,
           recomputed_cents / 100.0 AS recomputed,
           (booked_cents - recomputed_cents) / 100.0 AS drift,
           rank
    FROM (
      SELECT *, row_number() OVER (
               ORDER BY abs(booked_cents - recomputed_cents) DESC,
                        o_orderkey ASC) AS rank
      FROM j
    ) WHERE rank <= 20
    """,
)(kpis.order_reconciliation)

register(
    "trailing_30d_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day_i
      FROM orders GROUP BY 1, 3
    )
    SELECT day, cents / 100.0 AS revenue,
           SUM(cents) OVER (ORDER BY day_i
                            RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
             / 100.0 AS revenue_30d
    FROM daily
    """,
)(windows.trailing_30d_revenue)


# 100 TB twin of segment_price_quantiles: one-pass mergeable sketch
# (GK/KLL-style approx_percentile) — sketch internals are engine-
# specific, so rows-only by contract (like order_kpis_approx).
def segment_price_quantiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 10000).alias(
            "quartiles_approx"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


register("segment_price_quantiles_approx")(segment_price_quantiles_approx)


# applyInPandas grouped-Arrow centroid, exposed long-form (scalar
# columns) so the value-hash stays engine-portable; the fixed-point
# micro-unit sums make the mean exact and the norm is a sequential
# fold on both sides.
def _label_centroids_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = similarity.label_centroids_pandas(spark, sf_dir)
    return df.select(
        "label",
        "n_vectors",
        "dim",
        F.posexplode("centroid").alias("pos", "c"),
        "centroid_norm",
    ).select(
        "label",
        "n_vectors",
        "dim",
        (F.col("pos") + 1).alias("i"),
        "c",
        "centroid_norm",
    )


register(
    "embedding_label_centroids",
    """
    WITH v AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    m AS (
      SELECT label, i,
             SUM(CAST(FLOOR(v[i] * 1000000) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM v CROSS JOIN UNNEST(range(1, len(v) + 1)) AS u(i)
      GROUP BY 1, 2
    ),
    c AS (
      SELECT label, CAST(i AS INT) AS i, n,
             (CAST(s AS DOUBLE) / 1000000.0) / n AS c
      FROM m
    ),
    nrm AS (
      SELECT label, round(sqrt(list_dot_product(cl, cl)), 9) AS centroid_norm
      FROM (SELECT label, list(c ORDER BY i) AS cl FROM c GROUP BY 1)
      GROUP BY 1, cl
    )
    SELECT c.label, n AS n_vectors, CAST(64 AS INT) AS dim, i, c,
           centroid_norm
    FROM c JOIN nrm ON c.label = nrm.label
    """,
)(_label_centroids_long)


# Decontamination vs the benchmark slice (doc_id % 20 == 0): the oracle
# replays the shingling CTE, the distinct benchmark set, and the semi
# probe.
register(
    "benchmark_contamination",
    _SHINGLE_CTE
    + """
    , bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0
    ),
    cdocs AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 != 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM cdocs GROUP BY 1),
    hit AS (
      SELECT doc_id, COUNT(*) AS n_contaminated
      FROM cdocs WHERE shingle IN (SELECT shingle FROM bench)
      GROUP BY 1
    )
    SELECT t.doc_id, n_shingles,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           COALESCE(n_contaminated, 0) / n_shingles AS contamination,
           (COALESCE(n_contaminated, 0) / n_shingles >= 0.5) AS flagged
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
)(dedup.benchmark_contamination)


register(
    "new_vs_returning",
    """
    WITH o AS (
      SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS month
      FROM orders
    ),
    act AS (
      SELECT month, COUNT(*) AS n_active FROM (SELECT DISTINCT * FROM o)
      GROUP BY 1
    ),
    fs AS (SELECT o_custkey, MIN(month) AS month FROM o GROUP BY 1),
    nw AS (SELECT month, COUNT(*) AS n_new FROM fs GROUP BY 1)
    SELECT act.month, n_active,
           COALESCE(n_new, 0) AS n_new,
           n_active - COALESCE(n_new, 0) AS n_returning
    FROM act LEFT JOIN nw ON act.month = nw.month
    """,
)(retention.new_vs_returning)

register(
    "category_revenue_share",
    """
    WITH m AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
             p_type AS category,
             SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    )
    SELECT month, category,
           cents / 100.0 AS revenue,
           cents / SUM(cents) OVER (PARTITION BY month) AS share
    FROM m
    """,
)(kpis.category_revenue_share)

from data_pipeline_for_e_commerce_shop_spark.operators import scd  # noqa: E402

# One oracle string for the SCD2-history family: the full rebuild IS
# the specification the incremental apply must reproduce bit-for-bit.
_SCD2_HISTORY_ORACLE = """
    WITH log AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate,
             o_orderkey, o_orderpriority
      FROM orders
    ),
    flagged AS (
      SELECT *,
             CASE WHEN lag(o_orderpriority) OVER w IS NULL
                    OR lag(o_orderpriority) OVER w != o_orderpriority
                  THEN 1 ELSE 0 END AS chg
      FROM log
      WINDOW w AS (PARTITION BY o_custkey ORDER BY odate, o_orderkey)
    ),
    islands AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY odate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    hist AS (
      SELECT o_custkey, island, o_orderpriority,
             min(odate) AS valid_from, max(odate) AS last_seen,
             COUNT(*) AS n_orders
      FROM islands GROUP BY 1, 2, 3
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY island)
             AS valid_to,
           last_seen,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(island AS BIGINT) AS version
    FROM hist
    """

register("scd2_priority_history", _SCD2_HISTORY_ORACLE)(scd.priority_history)

# Incremental SCD2 apply (delta batch folded into existing history by
# a seeded islands recompute over affected keys only) — held to the
# IDENTICAL full-rebuild oracle: base+delta merge == full recompute,
# the same law kpi_incremental_refresh asserts for aggregates.
register("scd2_incremental_apply", _SCD2_HISTORY_ORACLE)(
    scd.incremental_apply
)

from data_pipeline_for_e_commerce_shop_spark.quality import gates  # noqa: E402


def _dq_oracle() -> str:
    """Build the expectation-suite oracle from the SAME rule table the
    Spark operator evaluates (quality/gates.EXPECTATIONS) — the two
    sides cannot drift."""
    ctes, rows = [], []
    for table in sorted({t for t, _, _ in gates.EXPECTATIONS}):
        rules = [(r, p) for t, r, p in gates.EXPECTATIONS if t == table]
        uniq = [(r, k) for t, r, k in gates.UNIQUE_KEYS if t == table]
        cols = ", ".join(
            f"SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS {r}" for r, p in rules
        )
        if uniq:
            cols += ", " + ", ".join(
                f"COUNT({k}) - COUNT(DISTINCT {k}) AS {r}" for r, k in uniq
            )
        ctes.append(f"{table}_w AS (SELECT {cols}, COUNT(*) AS _n FROM {table})")
        for r, _ in rules + uniq:
            rows.append(
                f"SELECT '{table}' AS table_name, '{r}' AS rule, "
                f"CAST(_n AS BIGINT) AS n_rows, "
                f"CAST({r} AS BIGINT) AS n_violations, "
                f"CAST({r} AS DOUBLE) / _n AS violation_rate, "
                f"CAST(CASE WHEN {r} = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed "
                f"FROM {table}_w"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


register("dq_expectations", _dq_oracle())(gates.expectation_summary)


# --------------------------------------------------- corpus assembly
# Sequence packing, deterministic shuffle/split, source mixing — the
# corpus-prep stages between "cleaned documents" and "training
# batches" (operators/corpus.py).

from data_pipeline_for_e_commerce_shop_spark.operators import corpus  # noqa: E402

register(
    "corpus_pack_sequences",
    """
    WITH sized AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM sized
    )
    SELECT source, doc_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS offset_in_shard,
           CAST(floor((cum - n_tokens) / 256) AS BIGINT) AS pack_id,
           CAST(floor((cum - 1) / 256)
                - floor((cum - n_tokens) / 256) + 1 AS BIGINT)
             AS n_packs_spanned
    FROM c
    """,
)(corpus.pack_sequences)

register(
    "corpus_shuffle_split",
    """
    SELECT doc_id,
           md5('shuffle-' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(CAST(('0x' || substr(md5('shuffle-' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1024 AS INT) AS shuffle_bucket,
           CASE WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)(corpus.shuffle_split)

register(
    "corpus_source_mix",
    r"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs,
             1 + (CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 3)
               AS weight
      FROM documents GROUP BY source
    ),
    star AS (
      SELECT n_docs AS n_star, weight AS w_star
      FROM counts
      ORDER BY CAST(floor(n_docs * 1000000 / weight) AS BIGINT), source
      LIMIT 1
    ),
    cuts AS (
      SELECT source,
             CAST(floor((1000000 * weight * n_star) / (w_star * n_docs))
                  AS BIGINT) AS cut_ppm
      FROM counts CROSS JOIN star
    )
    SELECT d.doc_id, d.source, cut_ppm
    FROM documents d JOIN cuts USING (source)
    WHERE CAST(('0x' || substr(md5('mix-' || CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000000 < cut_ppm
    """,
)(corpus.source_mix)


# Representative election over the duplicate clusters: recursive-CTE
# closure (as dedup_clusters) + the text_quality score formula + a
# per-cluster argmax — the oracle replays the WHOLE pipeline.
register(
    "dedup_cluster_reps",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION SELECT doc_b, doc_a FROM cand
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clusters AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    q AS (
      SELECT doc_id,
             ((len(list_distinct(toks)) / len(toks)) * 0.5 +
              (len(list_filter(toks,
                 x -> list_contains(['the','a','and','of','to'], x)))
               / len(toks)) * 0.25 + 0.25) AS quality_score
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    SELECT cluster_id, rep_doc_id, n_members FROM (
      SELECT cluster_id, doc_id AS rep_doc_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY quality_score DESC, doc_id ASC)
               AS pos,
             COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
      FROM clusters JOIN q USING (doc_id)
    ) WHERE pos = 1
    """,
)(dedup.cluster_representatives)


# Random-projection reduction: 16 planes seeded plane-100..115 (same
# md5 seed rule as the LSH planes), replayed as SQL literals; integer
# micro-unit dots are exact on both engines.
register(
    "embedding_random_projection",
    "WITH e AS (\n"
    "  SELECT vec_id,\n"
    "         CAST(list_transform(CAST(embedding AS DOUBLE[]),\n"
    "              x -> CAST(floor(x * 1000000) AS BIGINT)) AS DOUBLE[]) AS q\n"
    "  FROM embeddings\n"
    ")\n"
    + "\nUNION ALL\n".join(
        f"SELECT vec_id, CAST({j} AS INT) AS dim_no,"
        f" CAST(list_dot_product(q, {_plane_literal(100 + j)}) AS BIGINT) AS r"
        " FROM e"
        for j in range(16)
    ),
)(similarity.random_projection_reduce)


def _kmeans_oracle(
    k: int = 8, n_iter: int = 3, dim: int = 64, as_cte: bool = False
) -> str:
    """Unrolled Lloyd trajectory: each iteration is an argmin-assignment
    CTE + a floor(mean) centroid CTE (LEFT JOIN + COALESCE keeps empty
    clusters on their previous centroid, mirroring the Spark driver
    loop).  All distances are integers carried exactly in doubles
    (< 2^53), so every iteration is bit-identical to the operator.

    ``as_cte=True`` ends the chain with an ``asg_final`` CTE (vec_id,
    cluster_id, sq_dist) plus the quantized ``q`` (vec_id, v) still in
    scope, so downstream oracles (semantic dedup) can compose on the
    identical trajectory instead of pasting it."""
    sq = (
        "CAST(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b}) AS BIGINT)"
    )
    parts = [
        f"""
    WITH q AS (
      SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
             x -> CAST(floor(x * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    cent0 AS (
      SELECT vec_id AS cluster_id, v
      FROM q ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
      LIMIT {k}
    )"""
    ]
    for t in range(1, n_iter + 1):
        d = sq.format(a="q.v", b="c.v")
        parts.append(
            f""",
    asg{t} AS (
      SELECT vec_id, v, cluster_id FROM (
        SELECT q.vec_id, q.v, c.cluster_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {d} ASC, c.cluster_id ASC) AS rk
        FROM q CROSS JOIN cent{t - 1} c
      ) WHERE rk = 1
    ),
    mean{t} AS (
      SELECT cluster_id, i,
             CAST(floor(SUM(v[i]) * 1.0 / COUNT(*)) AS BIGINT) AS m
      FROM asg{t} CROSS JOIN generate_series(1, {dim}) AS g(i)
      GROUP BY cluster_id, i
    ),
    cent{t} AS (
      SELECT p.cluster_id, COALESCE(mm.mv, p.v) AS v
      FROM cent{t - 1} p
      LEFT JOIN (SELECT cluster_id, list(m ORDER BY i) AS mv
                 FROM mean{t} GROUP BY cluster_id) mm
        USING (cluster_id)
    )"""
        )
    d = sq.format(a="q.v", b="c.v")
    if as_cte:
        parts.append(
            f""",
    asg_final AS (
      SELECT vec_id, cluster_id, sq_dist FROM (
        SELECT q.vec_id, c.cluster_id, {d} AS sq_dist,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {d} ASC, c.cluster_id ASC) AS rk
        FROM q CROSS JOIN cent{n_iter} c
      ) WHERE rk = 1
    )"""
        )
    else:
        parts.append(
            f"""
    SELECT vec_id, cluster_id, sq_dist FROM (
      SELECT q.vec_id, c.cluster_id, {d} AS sq_dist,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {d} ASC, c.cluster_id ASC) AS rk
      FROM q CROSS JOIN cent{n_iter} c
    ) WHERE rk = 1
    """
        )
    return "".join(parts)


register("embedding_kmeans", _kmeans_oracle())(similarity.kmeans_lloyd)


# SemDeDup: the kmeans trajectory CTE (identical to embedding_kmeans)
# + within-cluster quantized-cosine pairs + the greedy priority sweep
# (keep the member closest to its centroid).  Cosine parity follows
# dedup_embedding_cosine: exact int64 dots, IEEE norms, round-9.
register(
    "dedup_semantic",
    _kmeans_oracle(as_cte=True)
    + f""",
    spts AS (
      SELECT a.vec_id, a.cluster_id, a.sq_dist, q.v
      FROM asg_final a JOIN q USING (vec_id)
    ),
    sprs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             a.sq_dist AS da, b.sq_dist AS db,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 9) AS cosine
      FROM spts a JOIN spts b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    ),
    slosers AS (
      SELECT DISTINCT CASE WHEN (da < db) OR (da = db AND va < vb)
                           THEN vb ELSE va END AS vec_id
      FROM sprs WHERE cosine >= {dedup.SEMDEDUP_TAU}
    )
    SELECT p.vec_id, p.cluster_id, p.sq_dist,
           l.vec_id IS NULL AS keep
    FROM spts p LEFT JOIN slosers l USING (vec_id)
    """,
)(dedup.semantic_dedup)


def _pagerank_oracle(n_iter: int = 2) -> str:
    """Unrolled damped PageRank trajectory over the co-purchase graph;
    all transfers are positive-integer floor divisions (DuckDB `//` ==
    Spark `div` here), so every round is bit-identical."""
    from data_pipeline_for_e_commerce_shop_spark.operators.graph import (
        PR_D_DEN,
        PR_D_NUM,
        PR_SCALE,
    )

    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // PR_D_DEN
    parts = [
        f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS w
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT part_a AS src, part_b AS dst, w FROM und
      UNION ALL SELECT part_b, part_a, w FROM und
    ),
    outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
    e AS (SELECT edges.src, dst, w, outw
          FROM edges JOIN outw USING (src)),
    pr0 AS (SELECT src AS part_id, CAST({PR_SCALE} AS BIGINT) AS pr
            FROM outw)"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f""",
    c{t} AS (
      SELECT dst, SUM((pr * w) // outw) AS inflow
      FROM e JOIN pr{t - 1} p ON e.src = p.part_id
      GROUP BY dst
    ),
    pr{t} AS (
      SELECT n.part_id,
             CAST({base} + ({PR_D_NUM} * COALESCE(c.inflow, 0))
                  // {PR_D_DEN} AS BIGINT) AS pr
      FROM pr0 n LEFT JOIN c{t} c ON n.part_id = c.dst
    )"""
        )
    parts.append(f"\n    SELECT part_id, pr FROM pr{n_iter}\n    ")
    return "".join(parts)


from data_pipeline_for_e_commerce_shop_spark.operators import graph  # noqa: E402

register("part_pagerank", _pagerank_oracle())(graph.part_pagerank)


def _pq_oracle() -> str:
    """Unrolled PQ pipeline: hash-bounded sample, PQ_M independent
    integer-Lloyd codebook trainings (PQ_ITER rounds each), full-corpus
    encode, ADC scoring, per-query top-k — every stage integer-exact,
    so the oracle replays the operator's whole trajectory."""
    from data_pipeline_for_e_commerce_shop_spark.operators.similarity import (
        PQ_ITER,
        PQ_KSUB,
        PQ_M,
        PQ_SUBDIM,
        PQ_TRAIN,
    )

    dist = (
        "CAST(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b}) AS BIGINT)"
    )
    hash_order = "(vec_id * 2654435761) % 4294967296, vec_id"
    parts = [
        f"""
    WITH q AS (
      SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
             x -> CAST(floor(x * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    samp AS (
      SELECT vec_id, v FROM q ORDER BY {hash_order} LIMIT {PQ_TRAIN}
    )"""
    ]
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        d = dist.format(a="t.sub", b="c.c")
        parts.append(
            f""",
    sub{s} AS (SELECT vec_id, v[{lo}:{hi}] AS sub FROM samp),
    cents{s}_0 AS (
      SELECT rn - 1 AS cid, v[{lo}:{hi}] AS c FROM (
        SELECT vec_id, v,
               row_number() OVER (ORDER BY {hash_order}) AS rn
        FROM samp
      ) WHERE rn <= {PQ_KSUB}
    )"""
        )
        for t in range(1, PQ_ITER + 1):
            parts.append(
                f""",
    asg{s}_{t} AS (
      SELECT vec_id, sub, cid FROM (
        SELECT t.vec_id, t.sub, c.cid,
               row_number() OVER (PARTITION BY t.vec_id
                 ORDER BY {d} ASC, c.cid ASC) AS rk
        FROM sub{s} t CROSS JOIN cents{s}_{t - 1} c
      ) WHERE rk = 1
    ),
    mean{s}_{t} AS (
      SELECT cid, i,
             CAST(floor(SUM(sub[i]) * 1.0 / COUNT(*)) AS BIGINT) AS m
      FROM asg{s}_{t} CROSS JOIN generate_series(1, {PQ_SUBDIM}) AS g(i)
      GROUP BY cid, i
    ),
    cents{s}_{t} AS (
      SELECT p.cid, COALESCE(mm.mv, p.c) AS c
      FROM cents{s}_{t - 1} p
      LEFT JOIN (SELECT cid, list(m ORDER BY i) AS mv
                 FROM mean{s}_{t} GROUP BY cid) mm
        USING (cid)
    )"""
            )
        parts.append(
            f""",
    enc{s} AS (
      SELECT vec_id, cid AS c{s} FROM (
        SELECT t.vec_id, c.cid,
               row_number() OVER (PARTITION BY t.vec_id
                 ORDER BY {d} ASC, c.cid ASC) AS rk
        FROM (SELECT vec_id, v[{lo}:{hi}] AS sub FROM q) t
        CROSS JOIN cents{s}_{PQ_ITER} c
      ) WHERE rk = 1
    )"""
        )
    enc_joins = " ".join(
        f"JOIN enc{s} USING (vec_id)" for s in range(PQ_M)
    )
    adc_terms = []
    cb_joins = []
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        adc_terms.append(
            dist.format(a=f"qv.v[{lo}:{hi}]", b=f"k{s}.c")
        )
        cb_joins.append(f"JOIN cents{s}_{PQ_ITER} k{s} ON k{s}.cid = codes.c{s}")
    parts.append(
        f""",
    codes AS (
      SELECT q.vec_id, c0, c1, c2, c3 FROM q {enc_joins}
    ),
    qv AS (SELECT vec_id AS query_id, v FROM q WHERE vec_id < 5),
    adc AS (
      SELECT query_id, codes.vec_id AS corpus_id,
             CAST({" + ".join(adc_terms)} AS BIGINT) AS approx_sq_dist
      FROM qv CROSS JOIN codes
      {" ".join(cb_joins)}
      WHERE query_id != codes.vec_id
    )
    SELECT query_id, corpus_id, approx_sq_dist, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY approx_sq_dist ASC, corpus_id ASC) AS rank
      FROM adc
    ) WHERE rank <= 5
    """
    )
    return "".join(parts)


register("ann_pq_topk", _pq_oracle())(similarity.pq_topk)

# Arrow grouped-aggregate pandas UDAF: the §2.11 surface's third leg
# (mapInPandas feature extraction and applyInPandas centroids are the
# other two).  Median = linear interpolation — pandas' Series.median
# and DuckDB's quantile_cont(0.5) compute the identical IEEE midpoint,
# so even the Python-aggregated column is value-hash-checked.
@register(
    "segment_acctbal_median",
    """
    SELECT c_mktsegment,
           quantile_cont(c_acctbal, 0.5) AS median_acctbal,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def segment_acctbal_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment median account balance via a GROUPED_AGG pandas UDAF
    (Arrow-batched — the vectorized aggregation path for logic with no
    built-in equivalent; exact percentile_disc / approx_percentile are
    the JVM-side twins in segment_price_quantiles*).

    Scale: same shuffle as any groupBy(segment); each group's balances
    stream to ONE Arrow batch per group — fine for bounded groups
    (segments), the wrong tool for unbounded ones (use the sketch twin
    there)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: this module runs under `from __future__
    # import annotations`, which stringifies the hints the decorator
    # form would otherwise infer the eval type from
    median_udaf = pandas_udf(
        lambda v: float(v.median()), "double", PandasUDFType.GROUPED_AGG
    )
    # JVM aggregates can't share an agg with a GROUPED_AGG pandas UDF
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a second
    # pandas aggregate over the same Arrow batch
    count_udaf = pandas_udf(
        lambda v: len(v), "long", PandasUDFType.GROUPED_AGG
    )

    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        median_udaf("c_acctbal").alias("median_acctbal"),
        count_udaf("c_acctbal").alias("n_customers"),
    )


# User-journey transition matrix: per-user event sequences (ordered by
# ts, event_id tie-break) reduced to (from, to) transition counts with
# integer-ppm row shares — the Markov view a product-analytics /
# session-modeling pipeline derives from the event stream.
@register(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    rowtot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_n
      FROM trans GROUP BY from_type
    )
    SELECT from_type, to_type, n AS n_transitions,
           n * 1000000 // row_n AS share_ppm
    FROM trans JOIN rowtot USING (from_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from, to) event-type transition counts over per-user ordered
    sequences, with each row's share of its from-type in exact integer
    ppm.  One shuffle on user_id for the lead window (the sessionize
    partitioning), then a |types|²-sized aggregate; the row-total join
    is vocabulary-sized."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(
        F.floor(F.unix_timestamp("ts")).cast("long"), F.col("event_id")
    )
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    trans = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rowtot = trans.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return trans.join(F.broadcast(rowtot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").alias("n_transitions"),
        F.expr("n * 1000000 div row_n").alias("share_ppm"),
    )


# Classic pricing-summary scan-aggregate (the TPC-H Q1 shape): one
# fact scan, grouped by the two flag columns, every money/percent
# quantity carried as exact integers (cents, percent points) and
# divided ONCE at the end — identical doubles on both engines.
@register(
    "lineitem_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty) AS BIGINT) AS sum_qty,
           CAST(SUM(price_c) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(SUM(price_c * (100 - disc_p)) AS BIGINT) / 10000.0
             AS sum_disc_price,
           CAST(SUM(price_c * (100 - disc_p) * (100 + tax_p)) AS BIGINT)
             / 1000000.0 AS sum_charge,
           CAST(SUM(qty) AS BIGINT) * 1.0 / COUNT(*) AS avg_qty,
           CAST(SUM(price_c) AS BIGINT) * 1.0 / (COUNT(*) * 100)
             AS avg_price,
           CAST(SUM(disc_p) AS BIGINT) * 1.0 / (COUNT(*) * 100)
             AS avg_disc,
           COUNT(*) AS count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_quantity) AS BIGINT) AS qty,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(round(l_discount * 100) AS BIGINT) AS disc_p,
             CAST(round(l_tax * 100) AS BIGINT) AS tax_p
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
    )
    GROUP BY l_returnflag, l_linestatus
    """,
)
def lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report — the canonical whole-scan aggregate
    (TPC-H Q1 shape): group the shipped fact by return flag and line
    status; sums/averages of quantity, base price, discounted price,
    and charge.  Cents/percent-point integer arithmetic end-to-end,
    one division per output column (functions/scalars.py discipline).

    Plan: scan → partial agg → 6-row final agg; the filter and the
    4-column read schema push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-08-06 00:00:00").cast("timestamp")
    )
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.floor("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc_p"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax_p"),
    )
    cnt = F.count(F.lit(1))
    return pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        (F.sum("price_c") / 100.0).alias("sum_base_price"),
        (F.sum(F.col("price_c") * (100 - F.col("disc_p"))))
        .cast("long")
        .alias("_sdp"),
        (
            F.sum(
                F.col("price_c")
                * (100 - F.col("disc_p"))
                * (100 + F.col("tax_p"))
            )
        )
        .cast("long")
        .alias("_sc"),
        (F.sum("qty") * 1.0 / cnt).alias("avg_qty"),
        (F.sum("price_c") * 1.0 / (cnt * 100)).alias("avg_price"),
        (F.sum("disc_p") * 1.0 / (cnt * 100)).alias("avg_disc"),
        cnt.alias("count_order"),
    ).select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        (F.col("_sdp") / 10000.0).alias("sum_disc_price"),
        (F.col("_sc") / 1000000.0).alias("sum_charge"),
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    )


# Shuffle-key skew diagnostic over the event stream: shares in exact
# integer ppm; the hottest event_type keys vs the uniform share.
@register(
    "events_key_skew",
    """
    WITH freq AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total_rows, COUNT(*) AS n_keys
      FROM freq
    )
    SELECT rank, key_value, n_rows, share_ppm, n_keys, uniform_ppm
    FROM (
      SELECT row_number() OVER (ORDER BY n DESC, event_type ASC) AS rank,
             CAST(event_type AS VARCHAR) AS key_value,
             n AS n_rows,
             n * 1000000 // total_rows AS share_ppm,
             n_keys,
             1000000 // n_keys AS uniform_ppm
      FROM freq CROSS JOIN tot
    ) WHERE rank <= 5
    """,
)
def events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report for the event_type shuffle key — the diagnostic
    behind the salted-agg decision (operators/skew.py)."""
    from data_pipeline_for_e_commerce_shop_spark.operators.skew import (
        key_skew_report,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type")
    return key_skew_report(ev, "event_type", top=5)


# Trailing-window z-score anomaly flags: the variance numerator is an
# exact integer (cnt·Σn² − (Σn)²), so the one double division + sqrt +
# final division are the identical IEEE ops on both engines; z rounds
# to 9 decimals (the tfidf device).
register(
    "events_rate_anomaly",
    """
    WITH hourly AS (
      SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT)
               AS hour_epoch,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, hour_epoch, n_events,
             COUNT(*) OVER w AS trail_cnt,
             SUM(n_events) OVER w AS trail_sum,
             SUM(n_events * n_events) OVER w AS trail_sumsq
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_epoch, n_events, trail_cnt,
           CASE WHEN ok THEN z END AS z_score,
           COALESCE(CASE WHEN ok THEN abs(z) >= 3.0 END, FALSE)
             AS is_anomaly
    FROM (
      SELECT *,
             round((trail_cnt * n_events - trail_sum) /
                   (trail_cnt * sqrt(
                     (trail_cnt * trail_sumsq - trail_sum * trail_sum)
                     * 1.0 / (trail_cnt * trail_cnt))), 9) AS z,
             trail_cnt >= 12 AND
               (trail_cnt * trail_sumsq - trail_sum * trail_sum) > 0
               AS ok
      FROM stats
    )
    """,
)(events.rate_anomaly)


# Custom stateful streaming operator (applyInPandasWithState) held to
# the IDENTICAL oracle as the batch lag/running-sum sessionizer and
# the session_window streaming form — three execution strategies, one
# value hash.
from data_pipeline_for_e_commerce_shop_spark.streaming.stateful import (  # noqa: E402
    stateful_sessionize,
)

register("events_stateful_sessionize", ORACLES["events_sessionize"])(
    stateful_sessionize
)


# Crawl-over-crawl delta: snapshots derived deterministically from the
# corpus (doc_id slicing, same device as benchmark_contamination) so
# added/removed/changed classification is fully replayable.
register(
    "corpus_snapshot_diff",
    """
    WITH prev AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0
                      THEN substr(text, 1, length(text) - 5)
                      ELSE text END) AS fp_prev
      FROM documents WHERE doc_id % 7 != 3
    ),
    curr AS (
      SELECT doc_id, md5(text) AS fp_curr
      FROM documents WHERE doc_id % 13 != 5
    )
    SELECT doc_id, status FROM (
      SELECT COALESCE(prev.doc_id, curr.doc_id) AS doc_id,
             CASE WHEN fp_prev IS NULL THEN 'added'
                  WHEN fp_curr IS NULL THEN 'removed'
                  WHEN fp_prev != fp_curr THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM prev FULL OUTER JOIN curr ON prev.doc_id = curr.doc_id
    ) WHERE status != 'unchanged'
    """,
)(corpus.snapshot_diff)

register(
    "corpus_quality_sample",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    q AS (
      SELECT doc_id,
             ((len(list_distinct(toks)) / len(toks)) * 0.5 +
              (len(list_filter(toks,
                 x -> list_contains(['the','a','and','of','to'], x)))
               / len(toks)) * 0.25 + 0.25) AS quality_score
      FROM t
    )
    SELECT doc_id, quality_score, cut_ppm FROM (
      SELECT doc_id, quality_score,
             CAST(floor(quality_score * 500000) AS BIGINT) AS cut_ppm,
             CAST(('0x' || substr(md5('qsample-' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000000 AS draw
      FROM q
    ) WHERE draw < cut_ppm
    """,
)(corpus.quality_weighted_sample)


# End-to-end funnel: the oracle replays the ENTIRE pipeline — quality
# gate formula, exact-dup canonical election, recursive-CTE cluster
# closure — and must land on the same per-language survivor counts.
register(
    "corpus_pipeline_funnel",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION SELECT doc_b, doc_a FROM cand
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clusters AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    feats AS (
      SELECT doc_id, lang, md5(text) AS fp,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             (len(toks) >= 8
              AND (len(list_distinct(toks)) / len(toks)) >= 0.45
              AND (len(list_filter(toks,
                     x -> list_contains(['the','a','and','of','to'], x)))
                   / len(toks)) <= 0.35) AS gated
      FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
            FROM documents)
    ),
    canon AS (SELECT fp, MIN(doc_id) AS keep_id FROM feats GROUP BY fp),
    per_doc AS (
      SELECT f.lang, f.n_tokens, f.gated,
             (f.doc_id = c.keep_id) AS exact_keep,
             (cl.cluster_id IS NULL OR cl.cluster_id = f.doc_id)
               AS near_keep
      FROM feats f
      JOIN canon c ON f.fp = c.fp
      LEFT JOIN clusters cl ON f.doc_id = cl.doc_id
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN gated THEN 1 END) AS n_gated,
           COUNT(CASE WHEN gated AND exact_keep THEN 1 END)
             AS n_after_exact,
           COUNT(CASE WHEN gated AND exact_keep AND near_keep THEN 1 END)
             AS n_final,
           CAST(COALESCE(SUM(CASE WHEN gated AND exact_keep AND near_keep
                                  THEN n_tokens END), 0) AS BIGINT)
             AS n_tokens_final
    FROM per_doc GROUP BY lang
    """,
)(corpus.pipeline_funnel)


# Sub-document dedup: non-overlapping 32-token chunk fingerprints,
# corpus-wide frequency, per-doc boilerplate rate.
register(
    "dedup_chunk_level",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    ch AS (
      SELECT doc_id,
             md5(array_to_string(toks[s + 1 : s + 32], ' ')) AS fp
      FROM t CROSS JOIN UNNEST(range(0, len(toks), 32)) AS u(s)
      WHERE len(toks) > 0
    ),
    cnt AS (SELECT fp, COUNT(*) AS n FROM ch GROUP BY fp)
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           COUNT(CASE WHEN n > 1 THEN 1 END) AS n_dup_chunks,
           COUNT(CASE WHEN n > 1 THEN 1 END) / COUNT(*) AS dup_chunk_rate
    FROM ch JOIN cnt USING (fp)
    GROUP BY doc_id
    """,
)(dedup.chunk_level_duplicates)


# Cross-split leakage: LSH near-dup pairs that straddle the
# train/val/test assignment — the oracle replays the banding CTE and
# the split hash draw.
register(
    "corpus_split_leakage",
    _SHINGLE_CTE
    + """
    , sp AS (
      SELECT doc_id,
             CASE WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) % 100 < 80 THEN 'train'
                  WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT doc_a, sa.split AS split_a, doc_b, sb.split AS split_b
    FROM cand
    JOIN sp sa ON cand.doc_a = sa.doc_id
    JOIN sp sb ON cand.doc_b = sb.doc_id
    WHERE sa.split != sb.split
    """,
)(corpus.split_leakage)


# Z-order clustering key: the oracle replays the 5-step bit-spreading
# chain as generated BIGINT expressions (identical shift/or/mask
# semantics in DuckDB).
from data_pipeline_for_e_commerce_shop_spark.operators import layout  # noqa: E402


def _spread_sql(expr: str) -> str:
    e = f"({expr} & 4294967295)"
    for shift, mask in layout._SPREAD_STEPS:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


register(
    "layout_morton_codes",
    f"""
    SELECT l_orderkey, l_partkey, l_linenumber,
           ({_spread_sql('l_orderkey')}
            | ({_spread_sql('l_partkey')} << 1)) AS morton
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)(layout.morton_codes)


# ------------------------------------------------- round-2 continuation

from data_pipeline_for_e_commerce_shop_spark.operators import (  # noqa: E402
    linkage,
    stats,
)

# Gaps-and-islands: per-user consecutive-day streaks.  The oracle
# replays the identical day_index - row_number island key.
register(
    "user_activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    idx AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', d)
             - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    st AS (SELECT user_id, grp, COUNT(*) AS len FROM idx GROUP BY 1, 2)
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS n_active_days
    FROM st GROUP BY user_id
    """,
)(events.activity_streaks)


# Time-series resample + forward-fill: dense hour spine x event types,
# gaps imputed with last(ignorenulls).  DuckDB replays the spine with
# generate_series and LAST_VALUE(... IGNORE NULLS).
register(
    "events_gap_fill",
    f"""
    WITH b AS (
      SELECT CAST(floor(epoch(MIN(ts))) AS BIGINT) // 3600 AS lo,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) // 3600 AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi)) AS hour_epoch FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT * FROM spine CROSS JOIN types),
    obs AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_epoch,
             COUNT(*) AS n_observed
      FROM events WHERE value >= {events.GAP_FILL_MIN_VALUE} GROUP BY 1, 2
    )
    SELECT event_type, hour_epoch,
           CAST(COALESCE(
             LAST_VALUE(n_observed IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             0) AS BIGINT) AS n_filled,
           n_observed IS NULL AS is_gap
    FROM grid LEFT JOIN obs USING (event_type, hour_epoch)
    """,
)(events.gap_fill_hourly)


# Blocked fuzzy entity resolution: vocabulary-first levenshtein pairs
# (identical classic edit distance in both engines).
register(
    "part_fuzzy_names",
    f"""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts,
             split_part(p_name, ' ', 1) AS blk
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {linkage.FUZZY_MAX_DIST}
    """,
)(linkage.fuzzy_name_pairs)


# Grouped OLS price trend: exact int64 sufficient statistics, one
# double combination in a fixed expression order on both engines.
register(
    "category_price_trend",
    """
    WITH s AS (
      SELECT p_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM (
        SELECT p_type,
               datediff('day', DATE '1992-01-01',
                        CAST(l_shipdate AS DATE)) AS x,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey
      )
      GROUP BY p_type
    )
    SELECT p_type AS category, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS slope_cents_per_day,
           (CAST(sy AS DOUBLE)
            - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept_cents
    FROM s
    """,
)(stats.price_trend_ols)


# Bloom-filter semi-join pruning: md5 double-hashed k=4 probes into a
# 2048-word filter table; the oracle replays the identical bit
# arithmetic, including the false-positive audit.
from data_pipeline_for_e_commerce_shop_spark.operators import bloom  # noqa: E402

_BLOOM_H = (
    "CAST(('0x' || substr(md5('bl-' || CAST({k} AS VARCHAR)), {off}, 8)) "
    "AS BIGINT)"
)

register(
    "bloom_prune_orders",
    f"""
    WITH hv AS (
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7500
    ),
    bpos AS (
      SELECT ({_BLOOM_H.format(k='k', off=1)}
              + i.i * (2 * {_BLOOM_H.format(k='k', off=9)} + 1))
             % 65536 AS pos
      FROM hv CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
    ),
    words AS (
      SELECT pos // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER))
               AS word
      FROM bpos GROUP BY 1
    ),
    opos AS (
      SELECT o_orderkey, o_orderstatus, o_custkey,
             ({_BLOOM_H.format(k='o_custkey', off=1)}
              + i.i * (2 * {_BLOOM_H.format(k='o_custkey', off=9)} + 1))
             % 65536 AS pos
      FROM orders CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
    ),
    hits AS (
      SELECT o_orderkey, o_orderstatus, o_custkey,
             CASE WHEN word IS NOT NULL
                   AND (word & (CAST(1 AS BIGINT)
                                << CAST(pos % 32 AS INTEGER))) != 0
                  THEN 1 ELSE 0 END AS hit
      FROM opos LEFT JOIN words ON opos.pos // 32 = words.word_idx
    ),
    per_order AS (
      SELECT o_orderkey, o_orderstatus, o_custkey,
             SUM(hit) = 4 AS bloom_pass
      FROM hits GROUP BY 1, 2, 3
    ),
    member AS (
      SELECT o_orderstatus, bloom_pass, k IS NOT NULL AS is_member
      FROM per_order LEFT JOIN hv ON per_order.o_custkey = hv.k
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_member,
           CAST(SUM(CASE WHEN bloom_pass AND NOT is_member
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positive
    FROM member GROUP BY o_orderstatus
    """,
)(bloom.bloom_prune_orders)


# Incremental MV maintenance: base + delta partial aggregates merged;
# the oracle is the full recompute (the maintenance identity).
register(
    "kpi_incremental_refresh",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) / 100.0 AS total_revenue,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) / (COUNT(*) * 100.0) AS avg_order_value
    FROM orders GROUP BY o_orderstatus
    """,
)(kpis.incremental_kpi_refresh)


# Equi-width histogram on integer cents; global bounds ride the plan
# as a 1-row broadcast crossJoin (scalar-subquery shape).
register(
    "part_price_histogram",
    """
    WITH pre AS (
      SELECT p_type,
             CAST(floor(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM pre)
    SELECT p_type,
           (cents - lo) * 10 // (hi - lo + 1) AS bucket,
           COUNT(*) AS n_parts,
           MIN(cents) / 100.0 AS bucket_min_price,
           MAX(cents) / 100.0 AS bucket_max_price
    FROM pre CROSS JOIN b
    GROUP BY 1, 2
    """,
)(kpis.price_histogram)


# Triangle participation per node over the support-pruned co-purchase
# graph (ordered-edge enumeration — each triangle confirmed once).
register(
    "part_triangles",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {graph.MIN_SUPPORT}
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    nodes AS (
      SELECT a AS part_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT part_id, COUNT(*) AS n_triangles
    FROM nodes GROUP BY part_id
    """,
)(graph.triangle_count)


# Count-min sketch heavy hitters with exact-count audit; the oracle
# replays the md5 row hashes, the 4x1024 counter build, and the
# min-over-rows estimate.
from data_pipeline_for_e_commerce_shop_spark.operators import sketch  # noqa: E402

register(
    "cms_heavy_hitters",
    f"""
    WITH rows_ AS (
      SELECT l_partkey, i.i AS r,
             CAST(('0x' || substr(md5('cms' || CAST(i.i AS VARCHAR)
                   || '-' || CAST(l_partkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1024 AS p
      FROM lineitem CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
    ),
    counters AS (
      SELECT r, p, COUNT(*) AS cnt FROM rows_ GROUP BY r, p
    ),
    exact AS (
      SELECT l_partkey, COUNT(*) AS exact_n FROM lineitem GROUP BY 1
    ),
    topk AS (
      SELECT l_partkey, exact_n,
             row_number() OVER (ORDER BY exact_n DESC, l_partkey) AS rk
      FROM exact QUALIFY rk <= {sketch.CMS_TOPK}
    ),
    probes AS (
      SELECT l_partkey, exact_n, rk, i.i AS r,
             CAST(('0x' || substr(md5('cms' || CAST(i.i AS VARCHAR)
                   || '-' || CAST(l_partkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1024 AS p
      FROM topk CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
    )
    SELECT l_partkey AS part_id, rk, exact_n,
           MIN(cnt) AS cms_n,
           MIN(cnt) - exact_n AS overestimate
    FROM probes JOIN counters USING (r, p)
    GROUP BY 1, 2, 3
    """,
)(sketch.cms_heavy_hitters)


# Stopword cleaning with byte-exact fingerprint oracle.
register(
    "text_stopword_clean",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             list_filter(string_split(text, ' '),
                         x -> x NOT IN ('the', 'a', 'and', 'of', 'to'))
               AS kept
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(kept) AS BIGINT) AS n_kept,
           md5(array_to_string(kept, ' ')) AS clean_fp
    FROM t
    """,
)(text.stopword_clean)


# Cogroup reconciliation (4th Arrow shape): oracle is the SQL
# full-outer join of the two date aggregates.
register(
    "cogroup_reconciliation",
    """
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    i AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(o.d, i.d) AS d,
           COALESCE(o.cents, 0) / 100.0 AS orders_total,
           COALESCE(i.cents, 0) / 100.0 AS items_total,
           (COALESCE(o.cents, 0) - COALESCE(i.cents, 0)) / 100.0 AS gap,
           COALESCE(o.n, 0) AS n_orders,
           COALESCE(i.n, 0) AS n_items
    FROM o FULL OUTER JOIN i ON o.d = i.d
    """,
)(kpis.cogroup_date_reconciliation)


# Exact prefix-filter similarity join (recall-1.0 dedup): the oracle
# replays the rarest-first global ordering, the prefix emission, and
# the integer Jaccard verify.
register(
    "dedup_prefix_filter",
    f"""
    WITH sh0 AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(string_split(text, ' ')) >= 3 THEN
          list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
            i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
        ELSE [] END)) AS shingle
      FROM documents
    ),
    hx AS (
      SELECT DISTINCT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh0
    ),
    dfq AS (SELECT h, COUNT(*) AS df FROM hx GROUP BY 1),
    sized AS (
      SELECT doc_id,
             list(h ORDER BY df, h) AS toks,
             COUNT(*) AS s
      FROM hx JOIN dfq USING (h)
      GROUP BY doc_id
    ),
    pre AS (
      SELECT doc_id, s,
             unnest(toks[1 : CAST(s - ((({dedup.PREFIX_FILTER_TAU_PCT} * s) + 99) // 100) + 1
                               AS BIGINT)]) AS ptok
      FROM sized
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pre a JOIN pre b
        ON a.ptok = b.ptok AND a.doc_id < b.doc_id
       AND b.s * 100 >= {dedup.PREFIX_FILTER_TAU_PCT} * a.s
       AND a.s * 100 >= {dedup.PREFIX_FILTER_TAU_PCT} * b.s
    ),
    v AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT)
               AS n_inter,
             CAST(sa.s + sb.s - len(list_intersect(sa.toks, sb.toks))
                  AS BIGINT) AS n_union
      FROM cand
      JOIN sized sa ON doc_a = sa.doc_id
      JOIN sized sb ON doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b, n_inter, n_union,
           n_inter * 100 // n_union AS jac_pct
    FROM v WHERE n_inter * 100 >= {dedup.PREFIX_FILTER_TAU_PCT} * n_union
    """,
)(dedup.prefix_filter_pairs)


# Deterministic sampled quantiles: the md5-hash Bernoulli draw makes
# sampling-based approximation REPRODUCIBLE (and thus oracle-checked,
# unlike sketch-internal approx_percentile): same sample, same
# percentile_disc, any engine, any partitioning.
@register(
    "segment_price_quantiles_sampled",
    """
    WITH s AS (
      SELECT o_custkey, o_totalprice
      FROM orders
      WHERE CAST(('0x' || substr(md5('q-' || CAST(o_orderkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 100 < 10
    )
    SELECT c_mktsegment,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75,
           COUNT(*) AS n_sampled
    FROM s JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def segment_price_quantiles_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-segment quantiles on a 10% deterministic hash sample.

    The scale path when exact per-group sort-based quantiles are too
    hot and sketch internals (approx_percentile) are not replayable:
    an md5-keyed Bernoulli draw is pushed to the scan (sample BEFORE
    the join/shuffle — the whole win), and the downstream exact
    percentile runs on 10% of the rows.  Error bounds are the standard
    sampling ones; reproducibility is exact, which keeps the operator
    inside the correctness gate.
    """
    orders = load_table(spark, sf_dir, "orders")
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    draw = portable_hash32(F.col("o_orderkey"), prefix="q-") % 100
    sample = orders.where(draw < 10).select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer")
    joined = sample.join(
        F.broadcast(customer),
        sample.o_custkey == customer.c_custkey,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p25"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p75"),
        F.count(F.lit(1)).alias("n_sampled"),
    )


# mapInArrow byte stats (5th Arrow shape): plain length/strlen oracle.
from data_pipeline_for_e_commerce_shop_spark.operators import (  # noqa: E402
    multimodal,
)

register(
    "arrow_byte_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)(multimodal.arrow_byte_stats)


# Window compendium: row_number / cume_dist / nth_value / full-frame
# range, key-tiebroken ordering on both engines.
register(
    "segment_balance_profile",
    """
    WITH a AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER w AS rk,
             cume_dist() OVER w AS cd,
             nth_value(c_acctbal, 2) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS second_lowest,
             MAX(c_acctbal) OVER (PARTITION BY c_mktsegment)
             - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment)
               AS bal_range
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey)
    )
    SELECT * FROM a WHERE rk <= 3
    """,
)(windows.segment_balance_profile)


# Pivot -> unpivot round trip: wide status-per-month counts melted
# back to long; the oracle is the dense month x status grid.
@register(
    "status_unpivot_roundtrip",
    """
    WITH months AS (
      SELECT DISTINCT date_trunc('month', CAST(o_orderdate AS DATE)) AS m
      FROM orders
    ),
    statuses AS (SELECT unnest(['O', 'F', 'P']) AS status),
    counts AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             o_orderstatus AS status, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(months.m AS DATE) AS m, statuses.status,
           COALESCE(n, 0) AS n
    FROM months CROSS JOIN statuses
    LEFT JOIN counts ON months.m = counts.m
                    AND statuses.status = counts.status
    """,
)
def status_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide (statuses as columns), then unpivot back to long —
    the melt/stack pair a reporting layer round-trips through.  Nulls
    from missing combinations are densified to 0 BEFORE the unpivot so
    the long form is the complete month x status grid.

    Pivot with an EXPLICIT value list compiles to one aggregate (no
    distinct-values pre-query); unpivot is a zero-shuffle Expand.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(
            F.trunc(F.to_date("o_orderdate"), "month").alias("m")
        )
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )
    return wide.unpivot("m", ["O", "F", "P"], "status", "n")


# Python UDTF chunker (LATERAL table function): byte-exact md5 chunk
# fingerprints; oracle replays the 16-token slicing.
register(
    "udtf_doc_chunks",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(s / 16 AS INTEGER) AS chunk_no,
           CAST(len(toks[s + 1 : s + 16]) AS INTEGER) AS n_tokens,
           md5(array_to_string(toks[s + 1 : s + 16], ' ')) AS chunk_fp
    FROM t CROSS JOIN UNNEST(range(0, len(toks), 16)) AS u(s)
    WHERE len(toks) > 0
    """,
)(text.udtf_doc_chunks)


# Deterministic HLL: the oracle replays buckets, rho via bin-length,
# integer-scaled harmonic sum, and the single closed-form division.
register(
    "hll_distinct_users",
    """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    hx AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM d
    ),
    b AS (
      SELECT event_type, h // 4194304 AS bucket, h % 4194304 AS rem
      FROM hx
    ),
    regs AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN rem = 0 THEN 23
                      ELSE 23 - length(bin(rem)) END) AS m_reg,
             COUNT(*) AS n_in_bucket
      FROM b GROUP BY 1, 2
    ),
    pt AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(23 - m_reg AS INTEGER))
                  AS BIGINT) AS present_scaled,
             COUNT(*) AS n_buckets,
             CAST(SUM(n_in_bucket) AS BIGINT) AS n_exact
      FROM regs GROUP BY 1
    )
    SELECT event_type, n_exact,
           present_scaled + (1024 - n_buckets) * 8388608 AS sum_scaled,
           CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
             + CAST(1.079 AS DOUBLE) / CAST(1024 AS DOUBLE))
           * CAST(1024 AS DOUBLE) * CAST(1024 AS DOUBLE)
           * CAST(8388608 AS DOUBLE)
           / CAST(present_scaled + (1024 - n_buckets) * 8388608
                  AS DOUBLE) AS hll_estimate
    FROM pt
    """,
)(sketch.hll_distinct_users)


# Sketch mergeability law, bit-exact: registers over two disjoint
# slices merged by max == registers over the whole stream.
register(
    "hll_merge_identity",
    """
    WITH src AS (
      SELECT event_type, user_id,
             EXTRACT(day FROM ts) <= 15 AS first_half
      FROM events
    ),
    regs_l AS (
      SELECT event_type, h // 4194304 AS bucket,
             MAX(CASE WHEN h % 4194304 = 0 THEN 23
                      ELSE 23 - length(bin(h % 4194304)) END) AS m_reg
      FROM (SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) AS h
            FROM src WHERE first_half)
      GROUP BY 1, 2
    ),
    regs_r AS (
      SELECT event_type, h // 4194304 AS bucket,
             MAX(CASE WHEN h % 4194304 = 0 THEN 23
                      ELSE 23 - length(bin(h % 4194304)) END) AS m_reg
      FROM (SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) AS h
            FROM src WHERE NOT first_half)
      GROUP BY 1, 2
    ),
    merged AS (
      SELECT event_type, bucket, MAX(m_reg) AS m_reg
      FROM (SELECT * FROM regs_l UNION ALL SELECT * FROM regs_r)
      GROUP BY 1, 2
    ),
    direct AS (
      SELECT event_type, h // 4194304 AS bucket,
             MAX(CASE WHEN h % 4194304 = 0 THEN 23
                      ELSE 23 - length(bin(h % 4194304)) END) AS m_reg
      FROM (SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) AS h
            FROM src)
      GROUP BY 1, 2
    ),
    sm AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(23 - m_reg AS INTEGER))
                  AS BIGINT) AS sum_scaled_merged
      FROM merged GROUP BY 1
    ),
    sd AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(23 - m_reg AS INTEGER))
                  AS BIGINT) AS sum_scaled_direct
      FROM direct GROUP BY 1
    )
    SELECT event_type, sum_scaled_merged, sum_scaled_direct,
           sum_scaled_merged = sum_scaled_direct AS identical
    FROM sm JOIN sd USING (event_type)
    """,
)(sketch.hll_merge_identity)


# Recursive CTE front door (Spark 4 WITH RECURSIVE): exponential
# moving average — the canonical computation SQL cannot express
# without recursion.  Integer-scaled (alpha = 0.3 as 3/10 with //) so
# every step is exact in both engines; depth = |days|, each step a
# vocabulary-sized join.
@register(
    "events_ema_recursive",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, d, n,
             row_number() OVER (PARTITION BY event_type ORDER BY d) - 1
               AS i
      FROM daily
    ),
    ema(event_type, i, d, n, ema_scaled) AS (
      SELECT event_type, i, d, n, CAST(n * 1000 AS BIGINT)
      FROM idx WHERE i = 0
      UNION ALL
      SELECT x.event_type, x.i, x.d, x.n,
             CAST((3 * x.n * 1000 + 7 * e.ema_scaled) // 10 AS BIGINT)
      FROM ema e
      JOIN idx x ON x.event_type = e.event_type AND x.i = e.i + 1
    )
    SELECT event_type, d AS day_epoch, CAST(n AS BIGINT) AS n_events,
           ema_scaled, ema_scaled / 1000.0 AS ema
    FROM ema
    """,
)
def events_ema_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA of daily event counts per type via WITH RECURSIVE — Spark
    4's recursive CTE executed distributed (each recursion level is a
    plan iteration, not a driver loop).  ema_i = (3*n_i*1000 +
    7*ema_{i-1}) div 10 keeps the whole trajectory in exact integers;
    the one division to double happens at output.

    Note Spark recursion is UNION ALL-only (no fixpoint dedup), so
    this shape fits MONOTONE recursions — sequences, hierarchies,
    DAGs; cyclic closure stays with the dataframe-loop operator
    (dedup.connected_components).  Each level is a scheduled job, so
    depth costs ~100ms/level regardless of data size — for per-key
    sequence folds where the sequence fits a row, an
    aggregate()-HOF over a collected array is the cheap twin; the
    recursive form wins when levels must stay distributed."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    daily = ev.groupBy(
        "event_type",
        F.expr("unix_timestamp(ts) div 86400").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # materialise the |types|x|days| table BEFORE the recursion: each
    # recursion level re-executes its source subtree, so an unchecked
    # fact aggregate would rescan events once per day of depth (the
    # pagerank plan lesson applied to WITH RECURSIVE)
    idx = daily.withColumn(
        "i",
        F.row_number().over(
            _W.partitionBy("event_type").orderBy("d")
        )
        - 1,
    ).localCheckpoint(eager=False)
    idx.createOrReplaceTempView("ema_idx")
    return spark.sql(
        """
        WITH RECURSIVE ema(event_type, i, d, n, ema_scaled) AS (
          SELECT event_type, i, d, n, CAST(n * 1000 AS BIGINT)
          FROM ema_idx WHERE i = 0
          UNION ALL
          SELECT x.event_type, x.i, x.d, x.n,
                 CAST((3 * x.n * 1000 + 7 * e.ema_scaled) div 10
                      AS BIGINT)
          FROM ema e
          JOIN ema_idx x ON x.event_type = e.event_type
                        AND x.i = e.i + 1
        )
        SELECT event_type, d AS day_epoch, CAST(n AS BIGINT) AS n_events,
               ema_scaled, ema_scaled / 1000.0 AS ema
        FROM ema
        """
    )


# Correlated EXISTS + scalar subquery front door; the average is an
# exact integer-cents floor division on both engines.
@register(
    "sql_exists_subqueries",
    """
    SELECT c_custkey, c_name,
           CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
      AND CAST(floor(c_acctbal * 100) AS BIGINT) >
          (SELECT CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT))
                       AS BIGINT) // COUNT(*)
           FROM customer)
    """,
)
def sql_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (compiles to a left-semi join) plus a scalar
    subquery (1-row broadcast) — the declarative front door for the
    membership gates the reference does with collect+isin.  The
    global average is an integer floor-division of exact cents, so
    the predicate is engine-exact."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sq_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sq_orders"
    )
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM sq_customer c
        WHERE EXISTS (
                SELECT 1 FROM sq_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
          AND CAST(floor(c_acctbal * 100) AS BIGINT) >
              (SELECT CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT))
                           AS BIGINT) div COUNT(*)
               FROM sq_customer)
        """
    )


# Column profiler: per-column row/null/distinct counts in ONE scan
# (count_distinct x6 compiles to a single Expand + two-phase agg);
# the long form is a zero-shuffle stack of the 1-row wide aggregate.
@register(
    "lineitem_column_profile",
    """
    SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_orderkey) AS n_null,
           COUNT(DISTINCT l_orderkey) AS n_distinct FROM lineitem
    UNION ALL
    SELECT 'l_partkey', COUNT(*), COUNT(*) - COUNT(l_partkey),
           COUNT(DISTINCT l_partkey) FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', COUNT(*), COUNT(*) - COUNT(l_suppkey),
           COUNT(DISTINCT l_suppkey) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
           COUNT(DISTINCT l_quantity) FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag) FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
           COUNT(DISTINCT l_shipdate) FROM lineitem
    """,
)
def lineitem_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiler (the ANALYZE-statistics shape): row count, null
    count, and EXACT distinct count for six lineitem columns, computed
    in one scan — the multi-count-distinct compiles to a single
    Expand + two-phase aggregate, and the wide 1-row result melts to
    long with a stack() projection (no second scan, no shuffle).

    The cardinality ratios drive engine decisions a 100 TB deployment
    cares about: dictionary-encodability, bucketing-key choice,
    broadcast-side detection.  (min/max are omitted: double-to-string
    formatting is engine-specific, and the profiler contract is
    engine-exact output.)"""
    cols = [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_returnflag",
        "l_shipdate",
    ]
    li = load_table(spark, sf_dir, "lineitem").select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " as (column_name, n_null, n_distinct)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct")


# PIT join: facts look up the SCD2 interval in force on their date;
# the oracle replays the interval build + the range-residual join.
register(
    "scd2_point_in_time_join",
    """
    WITH log AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate,
             o_orderkey, o_orderpriority
      FROM orders
    ),
    flagged AS (
      SELECT *,
             CASE WHEN lag(o_orderpriority) OVER w IS NULL
                    OR lag(o_orderpriority) OVER w != o_orderpriority
                  THEN 1 ELSE 0 END AS chg
      FROM log
      WINDOW w AS (PARTITION BY o_custkey ORDER BY odate, o_orderkey)
    ),
    islands AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY odate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    hist AS (
      SELECT o_custkey AS custkey, island, o_orderpriority,
             min(odate) AS valid_from
      FROM islands GROUP BY 1, 2, 3
    ),
    intervals AS (
      SELECT custkey, o_orderpriority AS regime_priority, valid_from,
             lead(valid_from) OVER (PARTITION BY custkey
                                    ORDER BY island) AS valid_to,
             CAST(island AS BIGINT) AS version
      FROM hist
    ),
    facts AS (
      SELECT l_orderkey, l_linenumber, o_custkey AS custkey,
             CAST(l_shipdate AS DATE) AS ship_date
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.ship_date,
           i.regime_priority,
           -- -1 sentinel: NULL-bearing BIGINT -> float64 under pandas.
           COALESCE(i.version, -1) AS version
    FROM facts f
    LEFT JOIN intervals i
      ON f.custkey = i.custkey
     AND f.ship_date >= i.valid_from
     AND (i.valid_to IS NULL OR f.ship_date < i.valid_to)
    """,
)(scd.point_in_time_join)


# Watermark-sizing diagnostic: per-user event-time frontier vs
# arrival order (event_id), aggregated per type in whole seconds.
register(
    "events_out_of_order",
    """
    WITH scored AS (
      SELECT event_type,
             MAX(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - CAST(floor(epoch(ts)) AS BIGINT) AS late_s
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s,
           CAST(SUM(late_s) AS BIGINT) AS total_late_s
    FROM scored GROUP BY event_type
    """,
)(events.out_of_order_report)


# HLL inclusion-exclusion overlap: three labeled register builds +
# the exact semi-join audit, replayed fully in SQL.
def _hll_sum_sql(pred: str, name: str) -> str:
    return f"""
    {name} AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << CAST(23 - m_reg AS INTEGER))
                  AS BIGINT)
             + (1024 - COUNT(*)) * 8388608 AS sum_scaled
      FROM (
        SELECT h // 4194304 AS bucket,
               MAX(CASE WHEN h % 4194304 = 0 THEN 23
                        ELSE 23 - length(bin(h % 4194304)) END) AS m_reg
        FROM (
          SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                      1, 8)) AS BIGINT) AS h
          FROM events WHERE {pred})
        GROUP BY 1)
    )"""


_HLL_EST = (
    "CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
    " + CAST(1.079 AS DOUBLE) / CAST(1024 AS DOUBLE))"
    " * CAST(1024 AS DOUBLE) * CAST(1024 AS DOUBLE)"
    " * CAST(8388608 AS DOUBLE) / CAST({s} AS DOUBLE)"
)

register(
    "hll_overlap",
    "WITH "
    + ",".join(
        [
            _hll_sum_sql("event_type = 'click'", "sa"),
            _hll_sum_sql("event_type = 'purchase'", "sb"),
            _hll_sum_sql("event_type IN ('click', 'purchase')", "su"),
        ]
    )
    + f""",
    ex AS (
      SELECT COUNT(*) AS exact_overlap FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase')
    )
    SELECT {_HLL_EST.format(s='sa.sum_scaled')} AS est_a,
           {_HLL_EST.format(s='sb.sum_scaled')} AS est_b,
           {_HLL_EST.format(s='su.sum_scaled')} AS est_union,
           {_HLL_EST.format(s='sa.sum_scaled')}
           + {_HLL_EST.format(s='sb.sum_scaled')}
           - {_HLL_EST.format(s='su.sum_scaled')} AS est_overlap,
           exact_overlap
    FROM sa, sb, su, ex
    """,
)(sketch.hll_overlap_estimate)


# Magic-bytes sniffing: identical binary synthesis + hex-prefix CASE
# in DuckDB (blob concat with ||, hex, substr on the hex string).
register(
    "media_type_sniff",
    """
    WITH p AS (
      SELECT doc_id,
             (CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN unhex('89504E470D0A1A0A')
                WHEN 1 THEN unhex('FFD8FFE000104A46')
                WHEN 2 THEN unhex('524946460000000057415645')
                ELSE unhex('') END) || encode(text) AS payload
      FROM documents
    ),
    sniffed AS (
      SELECT doc_id,
             CASE WHEN substr(hex(payload), 1, 8) = '89504E47' THEN 'png'
                  WHEN substr(hex(payload), 1, 6) = 'FFD8FF' THEN 'jpeg'
                  WHEN substr(hex(payload), 1, 8) = '52494646' THEN 'riff'
                  ELSE 'unknown' END AS media_type,
             CAST(octet_length(payload) AS BIGINT) AS n_bytes
      FROM p
    )
    SELECT media_type, COUNT(*) AS n_files,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
    FROM sniffed GROUP BY media_type
    """,
)(multimodal.media_type_sniff)


_AB_TAIL_SQL = """
    arms AS (
      SELECT arm, COUNT(*) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM u GROUP BY arm
    ),
    w AS (
      SELECT
        MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
        MAX(CASE WHEN arm = 0 THEN conv END) AS conv_a,
        MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
        MAX(CASE WHEN arm = 1 THEN conv END) AS conv_b
      FROM arms
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
           - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS uplift,
           CASE WHEN conv_a + conv_b = 0
                  OR conv_a + conv_b = n_a + n_b THEN NULL
           ELSE
           (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
            - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
           / sqrt(
               (CAST(conv_a + conv_b AS DOUBLE)
                / CAST(n_a + n_b AS DOUBLE))
               * (CAST(1 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE)
                  / CAST(n_a + n_b AS DOUBLE))
               * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
                  + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))
             ) END AS z_score
    FROM w
"""


# Deterministic A/B experiment report: hash-assigned arms, conversion
# from the event stream, pooled two-proportion z-score.  sqrt is
# IEEE-754 correctly rounded in BOTH engines (unlike ln/pow), so even
# the test statistic is oracle-exact.
@register(
    "ab_test_report",
    """
    WITH u AS (
      SELECT user_id,
             CAST(('0x' || substr(md5('ab-' || CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
""" + _AB_TAIL_SQL,
)
def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: users hash-assigned to two arms (the
    reproducible split every experimentation platform needs — re-runs
    and backfills must agree), conversion = a high-value purchase
    (value >= 150 — the threshold that keeps both outcomes present in
    the synthetic stream), and
    the pooled two-proportion z-score computed in a FIXED expression
    order from exact integer counts.  sqrt is correctly rounded under
    IEEE 754, so the statistic — not just the counts — passes the
    bit-exact oracle gate.  One shuffle (user groupBy); everything
    after is 2 rows."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(_ab_arm(), "converted")
    return _two_proportion_report(u)
def _two_proportion_report(u: DataFrame) -> DataFrame:
    """Shared experiment-report tail: (arm, converted) rows -> one-row
    pooled two-proportion z report (fixed expression order; sqrt is
    IEEE-correctly-rounded, so the statistic is oracle-exact)."""
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    degenerate = (
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b"))
    )
    z = F.when(
        ~degenerate,
        (p_b - p_a)
        / F.sqrt(
            pool
            * (F.lit(1).cast("double") - pool)
            * (
                F.lit(1).cast("double") / F.col("n_a").cast("double")
                + F.lit(1).cast("double") / F.col("n_b").cast("double")
            )
        ),
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        (p_b - p_a).alias("uplift"),
        z.alias("z_score"),
    )


def _ab_arm(user_col: str = "user_id"):
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    return (portable_hash32(F.col(user_col), prefix="ab-") % 2).alias(
        "arm"
    )


# Timeline alignment oracle: the islands build runs twice (priority,
# status), boundaries union per key, PIT join each segment start.
def _scd2_cte(attr: str, label: str) -> str:
    return f"""
    flg_{label} AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate, o_orderkey,
             {attr},
             CASE WHEN lag({attr}) OVER w IS NULL
                    OR lag({attr}) OVER w != {attr}
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    ),
    isl_{label} AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY odate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM flg_{label}
    ),
    hist_{label} AS (
      SELECT o_custkey AS custkey, island, {attr} AS val,
             min(odate) AS valid_from
      FROM isl_{label} GROUP BY 1, 2, 3
    ),
    iv_{label} AS (
      SELECT custkey, val, valid_from,
             lead(valid_from) OVER (PARTITION BY custkey
                                    ORDER BY island) AS valid_to
      FROM hist_{label}
    )"""


register(
    "scd2_timeline_alignment",
    "WITH "
    + ",".join(
        [_scd2_cte("o_orderpriority", "p"), _scd2_cte("o_orderstatus", "s")]
    )
    + """,
    bounds AS (
      SELECT DISTINCT custkey, b FROM (
        SELECT custkey, valid_from AS b FROM iv_p
        UNION ALL SELECT custkey, valid_from FROM iv_s)
    ),
    segs AS (
      SELECT custkey, b AS seg_from,
             lead(b) OVER (PARTITION BY custkey ORDER BY b) AS seg_to
      FROM bounds
    )
    SELECT segs.custkey, seg_from, seg_to,
           p.val AS priority, s.val AS status
    FROM segs
    LEFT JOIN iv_p p
      ON segs.custkey = p.custkey AND seg_from >= p.valid_from
     AND (p.valid_to IS NULL OR seg_from < p.valid_to)
    LEFT JOIN iv_s s
      ON segs.custkey = s.custkey AND seg_from >= s.valid_from
     AND (s.valid_to IS NULL OR seg_from < s.valid_to)
    """,
)(scd.timeline_alignment)


# CMS join-size estimation: per-row inner products of two counter
# grids, min over rows; exact product-sum audit.
register(
    "cms_join_size",
    """
    WITH ka AS (
      SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1
    ),
    kb AS (
      SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1
    ),
    ca AS (
      SELECT i.i AS r,
             CAST(('0x' || substr(md5('cms' || CAST(i.i AS VARCHAR)
                   || '-' || CAST(k AS VARCHAR)), 1, 8))
                  AS BIGINT) % 65536 AS p,
             CAST(SUM(n) AS BIGINT) AS na
      FROM ka CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
      GROUP BY 1, 2
    ),
    cb AS (
      SELECT i.i AS r,
             CAST(('0x' || substr(md5('cms' || CAST(i.i AS VARCHAR)
                   || '-' || CAST(k AS VARCHAR)), 1, 8))
                  AS BIGINT) % 65536 AS p,
             CAST(SUM(n) AS BIGINT) AS nb
      FROM kb CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
      GROUP BY 1, 2
    ),
    pr AS (
      SELECT r, CAST(SUM(na * nb) AS BIGINT) AS ip
      FROM ca JOIN cb USING (r, p) GROUP BY r
    ),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM pr),
    ex AS (
      SELECT CAST(SUM(ka.n * kb.n) AS BIGINT) AS exact_join_size
      FROM ka JOIN kb USING (k)
    )
    SELECT est_join_size, exact_join_size,
           est_join_size - exact_join_size AS overestimate
    FROM est, ex
    """,
)(sketch.cms_join_size)


# Hierarchical sketch rollup oracle: leaf registers once, coarser
# levels by MAX-merge in SQL.
_HLL_EST_OF = (
    "CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
    " + CAST(1.079 AS DOUBLE) / CAST(1024 AS DOUBLE))"
    " * CAST(1024 AS DOUBLE) * CAST(1024 AS DOUBLE)"
    " * CAST(8388608 AS DOUBLE)"
    " / CAST(present_scaled + (1024 - n_buckets) * 8388608 AS DOUBLE)"
)

register(
    "hll_rollup",
    f"""
    WITH d AS (
      SELECT DISTINCT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_epoch,
             user_id
      FROM events
    ),
    hx AS (
      SELECT event_type, day_epoch,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM d
    ),
    leaf_regs AS (
      SELECT event_type, day_epoch, h // 4194304 AS bucket,
             MAX(CASE WHEN h % 4194304 = 0 THEN 23
                      ELSE 23 - length(bin(h % 4194304)) END) AS m_reg,
             COUNT(*) AS n_in_bucket
      FROM hx GROUP BY 1, 2, 3
    ),
    leaf AS (
      SELECT event_type, day_epoch,
             CAST(SUM(CAST(1 AS BIGINT)
                      << CAST(23 - m_reg AS INTEGER)) AS BIGINT)
               AS present_scaled,
             COUNT(*) AS n_buckets,
             CAST(SUM(n_in_bucket) AS BIGINT) AS n_exact
      FROM leaf_regs GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, bucket, MAX(m_reg) AS m_reg
      FROM leaf_regs GROUP BY 1, 2
    ),
    by_type AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT)
                      << CAST(23 - m_reg AS INTEGER)) AS BIGINT)
               AS present_scaled,
             COUNT(*) AS n_buckets
      FROM tr GROUP BY 1
    ),
    gr AS (
      SELECT bucket, MAX(m_reg) AS m_reg FROM leaf_regs GROUP BY 1
    ),
    top AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT)
                      << CAST(23 - m_reg AS INTEGER)) AS BIGINT)
               AS present_scaled,
             COUNT(*) AS n_buckets
      FROM gr
    )
    SELECT 'type_day' AS level, event_type, day_epoch,
           {_HLL_EST_OF} AS hll_estimate, n_exact
    FROM leaf
    UNION ALL
    -- -1 sentinels (not NULL) at rolled-up levels: NULL-bearing BIGINT
    -- columns coerce to float64 under pandas and type-diverge.
    SELECT 'type', event_type, CAST(-1 AS BIGINT),
           {_HLL_EST_OF}, CAST(-1 AS BIGINT)
    FROM by_type
    UNION ALL
    SELECT 'global', CAST(NULL AS VARCHAR), CAST(-1 AS BIGINT),
           {_HLL_EST_OF}, CAST(-1 AS BIGINT)
    FROM top
    """,
)(sketch.hll_rollup)


# A/B uplift on FUNNEL COMPLETION (min-chain view < click < purchase)
# — composition of the experiment tail with the funnel definition.

@register(
    "ab_funnel_uplift",
    """
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS tv,
             MIN(CASE WHEN event_type = 'click'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS tc,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS tp
      FROM events GROUP BY user_id
    ),
    u AS (
      SELECT CAST(('0x' || substr(md5('ab-' || CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 2 AS arm,
             CASE WHEN tv IS NOT NULL AND tc IS NOT NULL
                   AND tp IS NOT NULL AND tv < tc AND tc < tp
                  THEN 1 ELSE 0 END AS converted
      FROM stages
    ),
    """
    + _AB_TAIL_SQL,
)
def ab_funnel_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift of strict funnel completion (first view before first
    click before first purchase, the min-chain formulation the funnel
    operator is property-tested against) between the hash-assigned
    experiment arms — the composition an experimentation platform
    runs for every launch.  Same shared two-proportion tail as
    ab_test_report (one code path, two conversion definitions)."""
    ev = load_table(spark, sf_dir, "events")
    e = F.floor(F.unix_timestamp("ts")).cast("long")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", e)).alias("tv"),
        F.min(F.when(F.col("event_type") == "click", e)).alias("tc"),
        F.min(F.when(F.col("event_type") == "purchase", e)).alias("tp"),
    )
    conv = (
        F.col("tv").isNotNull()
        & F.col("tc").isNotNull()
        & F.col("tp").isNotNull()
        & (F.col("tv") < F.col("tc"))
        & (F.col("tc") < F.col("tp"))
    )
    u = stages.select(
        _ab_arm(), conv.cast("int").alias("converted")
    )
    return _two_proportion_report(u)


# Sliding-sketch rolling distinct: daily registers fan to trailing
# windows, max-merged per target day; exact trailing countDistinct
# audit.
from data_pipeline_for_e_commerce_shop_spark.operators.sketch import (  # noqa: E402
    HLL_ROLLING_DAYS as _ROLL_D,
)

register(
    "hll_rolling_users",
    f"""
    WITH du AS (
      SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    hx AS (
      SELECT d,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM du
    ),
    daily_regs AS (
      SELECT d, h // 4194304 AS bucket,
             MAX(CASE WHEN h % 4194304 = 0 THEN 23
                      ELSE 23 - length(bin(h % 4194304)) END) AS m_reg
      FROM hx GROUP BY 1, 2
    ),
    fan AS (
      SELECT u.td, bucket, m_reg
      FROM daily_regs
      CROSS JOIN UNNEST(range(d, d + {_ROLL_D})) AS u(td)
      WHERE u.td IN (SELECT d FROM days)
    ),
    merged AS (
      SELECT td, bucket, MAX(m_reg) AS m_reg FROM fan GROUP BY 1, 2
    ),
    sums AS (
      SELECT td,
             CAST(SUM(CAST(1 AS BIGINT)
                      << CAST(23 - m_reg AS INTEGER)) AS BIGINT)
               AS present_scaled,
             COUNT(*) AS n_buckets
      FROM merged GROUP BY td
    ),
    ex AS (
      SELECT u.td, COUNT(DISTINCT user_id) AS n_exact
      FROM du CROSS JOIN UNNEST(range(d, d + {_ROLL_D})) AS u(td)
      WHERE u.td IN (SELECT d FROM days)
      GROUP BY u.td
    )
    SELECT td AS day_epoch,
           CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
             + CAST(1.079 AS DOUBLE) / CAST(1024 AS DOUBLE))
           * CAST(1024 AS DOUBLE) * CAST(1024 AS DOUBLE)
           * CAST(8388608 AS DOUBLE)
           / CAST(present_scaled + (1024 - n_buckets) * 8388608
                  AS DOUBLE) AS hll_estimate,
           n_exact
    FROM sums JOIN ex USING (td)
    """,
)(sketch.hll_rolling_users)


# Benford first-digit audit: digit from the integer-cents STRING (no
# double formatting), expected shares as literal constants (log10
# values baked in — no libm in either engine), chi-square in fixed
# expression order.
_BENFORD = {
    1: "0.30102999566398120", 2: "0.17609125905568124",
    3: "0.12493873660829993", 4: "0.09691001300805642",
    5: "0.07918124604762482", 6: "0.06694678963061322",
    7: "0.05799194697768673", 8: "0.05115252244738129",
    9: "0.04575749056067514",
}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD.items()
)

@register(
    "benford_digit_audit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ),
    counts AS (
      SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
    SELECT digit, n,
           CAST(total AS DOUBLE)
           * (CASE digit {_BENFORD_CASE} END) AS expected,
           (CAST(n AS DOUBLE) - CAST(total AS DOUBLE)
            * (CASE digit {_BENFORD_CASE} END))
           * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE)
              * (CASE digit {_BENFORD_CASE} END))
           / (CAST(total AS DOUBLE)
              * (CASE digit {_BENFORD_CASE} END)) AS chi2_term
    FROM counts CROSS JOIN tot
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals — the classic fraud /
    data-fabrication screen.  The leading digit comes from the
    INTEGER-CENTS string (double formatting is engine-specific; bigint
    formatting is not), the nine Benford shares are literal constants
    (log10 baked in at authoring time — no libm call in either
    engine), and each digit's chi-square term is one fixed-order
    double expression.  Scan -> 9-key agg -> 1-row total riding as a
    broadcast crossJoin."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 0
    )
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"),
        1,
        1,
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("total"))
    expected_case = "CASE digit " + _BENFORD_CASE + " END"
    joined = counts.crossJoin(F.broadcast(tot))
    expected = F.expr(
        f"CAST(total AS DOUBLE) * ({expected_case})"
    )
    diff = F.col("n").cast("double") - expected
    return joined.select(
        "digit",
        "n",
        expected.alias("expected"),
        (diff * diff / expected).alias("chi2_term"),
    )


# Wilson 95% score interval per event type — interval estimation with
# only +-*/ and sqrt (IEEE-correctly-rounded), so the bounds
# hash-match; z = 1.96 as an explicit DOUBLE literal.
_WILSON_Z = "CAST(1.96 AS DOUBLE)"

@register(
    "event_rate_wilson_ci",
    f"""
    WITH c AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CASE WHEN value >= 4.5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
           (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            + {_WILSON_Z} * {_WILSON_Z} / (CAST(2 AS DOUBLE)
                                           * CAST(n AS DOUBLE))
            - {_WILSON_Z} * sqrt(
                (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(1 AS DOUBLE)
                   - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
                + {_WILSON_Z} * {_WILSON_Z}
                  / (CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n AS DOUBLE))))
           / (CAST(1 AS DOUBLE)
              + {_WILSON_Z} * {_WILSON_Z} / CAST(n AS DOUBLE))
             AS ci_low,
           (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            + {_WILSON_Z} * {_WILSON_Z} / (CAST(2 AS DOUBLE)
                                           * CAST(n AS DOUBLE))
            + {_WILSON_Z} * sqrt(
                (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(1 AS DOUBLE)
                   - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
                + {_WILSON_Z} * {_WILSON_Z}
                  / (CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n AS DOUBLE))))
           / (CAST(1 AS DOUBLE)
              + {_WILSON_Z} * {_WILSON_Z} / CAST(n AS DOUBLE))
             AS ci_high
    FROM c
    """,
)
def event_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-value-event rate per type with a Wilson 95% score
    interval — the CI that behaves at extreme rates and small n,
    computed from exact integer counts with only arithmetic and sqrt
    (both IEEE-exact), in the same expression order as the oracle.
    One scan, |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("value") >= 4.5, 1).otherwise(0)
        ).cast("long").alias("k"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    z = F.lit(1.96).cast("double")
    p = k / n
    center = p + z * z / (F.lit(2).cast("double") * n)
    half = z * F.sqrt(
        p * (F.lit(1).cast("double") - p) / n
        + z * z / (F.lit(4).cast("double") * n * n)
    )
    denom = F.lit(1).cast("double") + z * z / n
    return c.select(
        "event_type",
        "n",
        "k",
        p.alias("rate"),
        ((center - half) / denom).alias("ci_low"),
        ((center + half) / denom).alias("ci_high"),
    )


# Kaplan-Meier oracle: identical window cumsum + an identically
# ordered left fold (list_reduce is seedless but 1.0*f1 == f1, so the
# multiplication sequence matches Spark's aggregate(init=1.0)).
register(
    "survival_km",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                 THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END) AS tv,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END) AS tp,
             MAX(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_seen
      FROM events GROUP BY user_id
    ),
    cohort AS (SELECT * FROM per_user WHERE tv IS NOT NULL),
    h AS (SELECT MAX(last_seen) AS horizon FROM cohort),
    timed AS (
      SELECT COALESCE(CASE WHEN tp IS NOT NULL AND tp >= tv
                           THEN tp - tv END,
                      horizon - tv) AS t,
             CASE WHEN tp IS NOT NULL AND tp >= tv THEN 1 ELSE 0 END
               AS is_event
      FROM cohort CROSS JOIN h
    ),
    risk AS (
      SELECT t, CAST(SUM(is_event) AS BIGINT) AS d,
             COUNT(*) AS leaving
      FROM timed GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(leaving) AS BIGINT) AS total FROM risk),
    ar AS (
      -- BIGINT cast: the windowed SUM makes the whole expression
      -- HUGEINT in DuckDB -> float64 via pandas (_SESSIONIZE_ORACLE).
      SELECT t, d,
             CAST(total - (SUM(leaving) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - leaving)
                  AS BIGINT) AS n_at_risk
      FROM risk CROSS JOIN tot
    ),
    ev_rows AS (
      SELECT t, d, n_at_risk,
             CAST(n_at_risk - d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
               AS f
      FROM ar WHERE d > 0
    ),
    packed AS (
      SELECT list(struct_pack(t := t, d := d, n_at_risk := n_at_risk, f := f) ORDER BY t) AS arr
      FROM ev_rows
    ),
    folded AS (
      SELECT unnest(list_transform(generate_series(1, len(arr)),
        j -> struct_pack(
          t := arr[j].t, d := arr[j].d, n_at_risk := arr[j].n_at_risk,
          s := list_reduce(list_transform(arr[1:j], x -> x.f),
                           (a, b) -> a * b)))) AS e
      FROM packed
    )
    SELECT e.t AS t_days, e.d AS n_events, e.n_at_risk AS n_at_risk,
           e.s AS survival
    FROM folded
    """,
)(stats.km_survival)


# Log-rank oracle: identical at-risk tables per arm and the same
# t-ordered fold for the E/V sums (list_reduce over structs; the
# seedless first element equals 0+first exactly).
register(
    "ab_logrank",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                 THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END) AS tv,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END) AS tp,
             MAX(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_seen
      FROM events GROUP BY user_id
    ),
    cohort AS (SELECT * FROM per_user WHERE tv IS NOT NULL),
    h AS (SELECT MAX(last_seen) AS horizon FROM cohort),
    timed AS (
      SELECT CAST(('0x' || substr(md5('ab-' || CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 2 AS arm,
             COALESCE(CASE WHEN tp IS NOT NULL AND tp >= tv
                           THEN tp - tv END,
                      horizon - tv) AS t,
             CASE WHEN tp IS NOT NULL AND tp >= tv THEN 1 ELSE 0 END
               AS is_event
      FROM cohort CROSS JOIN h
    ),
    risk AS (
      SELECT t, CAST(SUM(is_event) AS BIGINT) AS d,
             CAST(SUM(is_event * arm) AS BIGINT) AS d1,
             COUNT(*) AS leaving,
             CAST(SUM(arm) AS BIGINT) AS leaving1
      FROM timed GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(leaving) AS BIGINT) AS total,
                   CAST(SUM(leaving1) AS BIGINT) AS total1 FROM risk),
    ar AS (
      SELECT t, d, d1,
             total - (SUM(leaving) OVER w - leaving) AS n,
             total1 - (SUM(leaving1) OVER w - leaving1) AS n1
      FROM risk CROSS JOIN tot
      WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    rows_ AS (
      SELECT t, d1,
             CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)
               AS e1,
             CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(1 AS DOUBLE)
                - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
             / (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE)) AS v
      FROM ar WHERE d > 0 AND n > 1
    ),
    packed AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             list(struct_pack(e1 := e1, v := v) ORDER BY t) AS arr
      FROM rows_
    ),
    folded AS (
      SELECT o1,
             list_reduce(arr, (a, b) -> struct_pack(
               e1 := a.e1 + b.e1, v := a.v + b.v)) AS sums
      FROM packed
    )
    SELECT o1, sums.e1 AS e1_total, sums.v AS v_total,
           (CAST(o1 AS DOUBLE) - sums.e1) / sqrt(sums.v) AS z_logrank
    FROM folded
    """,
)(stats.ab_logrank)


# Category-distribution drift between the two half-months: the
# monitoring check an ML pipeline runs on every feature; chi-square
# terms summed by an ordered fold (deterministic double addition).
@register(
    "events_drift_chi2",
    """
    WITH lab AS (
      SELECT event_type,
             CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 0 ELSE 1 END
               AS half
      FROM events
    ),
    c AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM lab GROUP BY event_type
    ),
    t AS (SELECT CAST(SUM(n0) AS BIGINT) AS t0,
                 CAST(SUM(n1) AS BIGINT) AS t1 FROM c),
    terms AS (
      SELECT event_type, n0, n1,
             -- expected under pooled distribution, exact-ratio doubles
             (CAST(n1 AS DOUBLE)
              - CAST(n0 + n1 AS DOUBLE) * CAST(t1 AS DOUBLE)
                / CAST(t0 + t1 AS DOUBLE))
             * (CAST(n1 AS DOUBLE)
                - CAST(n0 + n1 AS DOUBLE) * CAST(t1 AS DOUBLE)
                  / CAST(t0 + t1 AS DOUBLE))
             / (CAST(n0 + n1 AS DOUBLE) * CAST(t1 AS DOUBLE)
                / CAST(t0 + t1 AS DOUBLE)) AS term1,
             (CAST(n0 AS DOUBLE)
              - CAST(n0 + n1 AS DOUBLE) * CAST(t0 AS DOUBLE)
                / CAST(t0 + t1 AS DOUBLE))
             * (CAST(n0 AS DOUBLE)
                - CAST(n0 + n1 AS DOUBLE) * CAST(t0 AS DOUBLE)
                  / CAST(t0 + t1 AS DOUBLE))
             / (CAST(n0 + n1 AS DOUBLE) * CAST(t0 AS DOUBLE)
                / CAST(t0 + t1 AS DOUBLE)) AS term0
      FROM c CROSS JOIN t
    ),
    packed AS (
      SELECT list(struct_pack(x := term0 + term1)
                  ORDER BY event_type) AS arr,
             COUNT(*) AS n_categories
      FROM terms
    )
    SELECT n_categories,
           list_reduce(arr, (a, b) -> struct_pack(x := a.x + b.x)).x
             AS chi2
    FROM packed
    """,
)
def events_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample chi-square drift check on the event-type
    distribution between the first and second half of the month — the
    feature-monitoring gate of an ML data pipeline.  Expected counts
    under the pooled distribution are exact-ratio doubles; the
    per-category terms are summed by a category-ORDERED fold (plain
    SUM over doubles is partition-order dependent).  Output: one row,
    category count + chi-square statistic."""
    ev = load_table(spark, sf_dir, "events")
    half = F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1)
    c = ev.select("event_type", half.alias("half")).groupBy(
        "event_type"
    ).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    t = c.agg(
        F.sum("n0").alias("t0"), F.sum("n1").alias("t1")
    )
    joined = c.crossJoin(F.broadcast(t))
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    tot = d("t0") + d("t1")
    row_n = d("n0") + d("n1")
    e1 = row_n * d("t1") / tot
    e0 = row_n * d("t0") / tot
    term = (d("n1") - e1) * (d("n1") - e1) / e1 + (
        d("n0") - e0
    ) * (d("n0") - e0) / e0
    packed = joined.select(
        F.struct(F.col("event_type"), term.alias("x")).alias("row")
    ).agg(
        F.sort_array(F.collect_list("row")).alias("arr"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    return packed.select(
        "n_categories",
        F.expr(
            "aggregate(arr, CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x.x)"
        ).alias("chi2"),
    )


# Binned two-sample KS statistic: cumulative exact-ratio fractions
# over a 64-bucket integer-cents histogram; max(|F1-F0|) is
# order-insensitive, so no fold gymnastics needed.
@register(
    "events_ks_drift",
    """
    WITH v AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
             CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 0 ELSE 1 END
               AS half
      FROM events
    ),
    b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM v),
    binned AS (
      SELECT (cents - lo) * 64 // (hi - lo + 1) AS bucket, half
      FROM v CROSS JOIN b
    ),
    c AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM binned GROUP BY bucket
    ),
    t AS (SELECT CAST(SUM(n0) AS BIGINT) AS t0,
                 CAST(SUM(n1) AS BIGINT) AS t1 FROM c),
    cum AS (
      SELECT bucket,
             SUM(n0) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS c0,
             SUM(n1) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS c1
      FROM c
    )
    SELECT COUNT(*) AS n_buckets,
           MAX(abs(CAST(c0 AS DOUBLE) / CAST(t0 AS DOUBLE)
                   - CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)))
             AS ks_stat
    FROM cum CROSS JOIN t
    """,
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift check on the event-value
    distribution between month halves — the continuous-feature
    complement to the chi-square gate.  Values bin to a 64-bucket
    integer-cents histogram (global bounds ride as a 1-row
    broadcast), cumulative counts are integers, the CDF fractions are
    exact-ratio doubles, and MAX — unlike SUM — is associative over
    doubles, so the statistic needs no ordered fold."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("half"),
    )
    b = v.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = v.crossJoin(F.broadcast(b)).select(
        F.expr("(cents - lo) * 64 div (hi - lo + 1)").alias("bucket"),
        "half",
    )
    c = binned.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    from pyspark.sql import Window

    t = c.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = c.select(
        "bucket",
        F.sum("n0").over(w).alias("c0"),
        F.sum("n1").over(w).alias("c1"),
    )
    return cum.crossJoin(F.broadcast(t)).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max(
            F.abs(
                F.col("c0").cast("double") / F.col("t0").cast("double")
                - F.col("c1").cast("double") / F.col("t1").cast("double")
            )
        ).alias("ks_stat"),
    )


# Revenue Gini: whale-concentration metric from exact integer sums
# (Σ i·x_i and Σ x_i stay in int64), one double combination at the
# end in fixed order.  Ranking runs on the KEY-REDUCED per-customer
# table (dim-sized window, same contract as segment_balance_profile).
@register(
    "revenue_gini",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i
      FROM per_cust
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx,
             CAST(SUM(i * cents) AS BIGINT) AS six
      FROM ranked
    )
    SELECT n, sx AS total_cents,
           (CAST(2 AS DOUBLE) * CAST(six AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
           - (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE))
             / CAST(n AS DOUBLE) AS gini
    FROM s
    """,
)
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — how concentrated sales
    are in whales.  Per-customer cents (fact-sized shuffle, dim-sized
    output), ascending rank with a key tiebreak, then
    G = 2·Σi·x_i/(n·Σx) − (n+1)/n from exact int64 sums in one fixed
    double expression — bit-exact without folds."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = per_cust.select(
        "cents", F.row_number().over(w).alias("i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("i") * F.col("cents")).alias("six"),
    )
    two = F.lit(2).cast("double")
    one = F.lit(1).cast("double")
    n = F.col("n").cast("double")
    return s.select(
        "n",
        F.col("sx").alias("total_cents"),
        (
            two * F.col("six").cast("double")
            / (n * F.col("sx").cast("double"))
            - (n + one) / n
        ).alias("gini"),
    )


# Association rules over co-purchase pairs: support / confidence /
# lift as exact integer ratios (lift kept as a ppm-scaled integer
# division on both engines), top-20 by confidence.
@register(
    "basket_rules",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li),
    item AS (SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    rules AS (
      SELECT part_a AS antecedent, part_b AS consequent, n_ab,
             ia.n_item AS n_ante, ib.n_item AS n_cons
      FROM pairs
      JOIN item ia ON part_a = ia.l_partkey
      JOIN item ib ON part_b = ib.l_partkey
      UNION ALL
      SELECT part_b, part_a, n_ab, ib.n_item, ia.n_item
      FROM pairs
      JOIN item ia ON part_a = ia.l_partkey
      JOIN item ib ON part_b = ib.l_partkey
    ),
    scored AS (
      SELECT antecedent, consequent, n_ab, n_ante, n_cons,
             n_ab * 1000000 // n_ante AS conf_ppm,
             n_ab * n_baskets * 1000000 // (n_ante * n_cons)
               AS lift_ppm
      FROM rules CROSS JOIN nb
    )
    SELECT * FROM scored
    ORDER BY conf_ppm DESC, lift_ppm DESC, antecedent, consequent
    LIMIT 20
    """,
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules (the apriori output tier): both rule
    directions from each support-pruned co-purchase pair, with
    confidence and lift as EXACT ppm integers, top-20 by (confidence,
    lift, keys) — fully ordered, so LIMIT is deterministic.  Item
    counts join is vocabulary-sized; the basket total rides as a 1-row
    broadcast.

    Magnitude bound: lift_ppm's intermediate is n_ab·n_baskets·10^6,
    exact while n_ab·n_baskets < 9.2e12 (int64 div 10^6) — holds up to
    ~1e6 pair support on a ~1e7-basket corpus; beyond that BOTH engines
    fail loudly rather than drift (Spark runs ANSI mode, DuckDB raises
    on BIGINT overflow), so the exactness claim degrades to an error,
    never a wrong number.  For larger corpora switch the lift factors
    to DECIMAL(38,0) on both sides."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nb = li.agg(
        F.countDistinct("l_orderkey").alias("n_baskets")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)), y ->"
                    " struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb_")
    )
    joined = pairs.join(F.broadcast(ia), "part_a").join(
        F.broadcast(ib), "part_b"
    )
    fwd = joined.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "n_ab",
        F.col("na").alias("n_ante"),
        F.col("nb_").alias("n_cons"),
    )
    rev = joined.select(
        F.col("part_b").alias("antecedent"),
        F.col("part_a").alias("consequent"),
        "n_ab",
        F.col("nb_").alias("n_ante"),
        F.col("na").alias("n_cons"),
    )
    scored = fwd.unionByName(rev).crossJoin(F.broadcast(nb)).select(
        "antecedent",
        "consequent",
        "n_ab",
        "n_ante",
        "n_cons",
        F.expr("n_ab * 1000000 div n_ante").alias("conf_ppm"),
        F.expr(
            "n_ab * n_baskets * 1000000 div (n_ante * n_cons)"
        ).alias("lift_ppm"),
    )
    return scored.orderBy(
        F.desc("conf_ppm"), F.desc("lift_ppm"), "antecedent", "consequent"
    ).limit(20)


# Classifier evaluation inside the engine: language-ID confusion
# matrix against the ground-truth lang column, with per-class
# precision/recall as exact ppm integers.
@register(
    "lang_confusion_matrix",
    """
    WITH scores AS (
      SELECT lang AS true_lang,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','fast','order','key'], t))) AS score_en,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['data','merge','window','batch'], t))) AS score_de,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['join','filter','row','table'], t))) AS score_es,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['spark','query','stream','vector'], t))) AS score_fr
      FROM documents
    ),
    scored AS (
      SELECT true_lang,
             CASE
               WHEN score_de >= score_en AND score_de >= score_es
                    AND score_de >= score_fr THEN 'de'
               WHEN score_en >= score_es AND score_en >= score_fr
                    THEN 'en'
               WHEN score_es >= score_fr THEN 'es'
               ELSE 'fr'
             END AS pred_lang
      FROM scores
    ),
    cm AS (
      SELECT true_lang, pred_lang, COUNT(*) AS n
      FROM scored GROUP BY 1, 2
    ),
    truth AS (SELECT true_lang, CAST(SUM(n) AS BIGINT) AS n_true
              FROM cm GROUP BY 1),
    preds AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS n_pred
              FROM cm GROUP BY 1)
    SELECT cm.true_lang, cm.pred_lang, n,
           n * 1000000 // n_true AS recall_ppm,
           n * 1000000 // n_pred AS precision_ppm
    FROM cm JOIN truth USING (true_lang) JOIN preds USING (pred_lang)
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the language-ID operator against the ground-truth
    `lang` column: full confusion matrix with per-cell recall (share
    of the true class) and precision (share of the predicted class)
    as exact ppm integers — classifier evaluation as a first-class
    engine query.  The oracle reimplements the argmax as a CASE chain
    checking de, then en, then es, then fr with >= comparisons — the
    effective tie-break is ALPHABETICAL ASCENDING (de > en > es > fr
    wins ties), exactly matching pred_lang_over_scores.  One scan +
    vocabulary-sized joins."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        lang_score_cols,
        pred_lang_over_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(F.col("lang").alias("true_lang"), *lang_score_cols())
    pred, _ = pred_lang_over_scores()
    cm = scored.select("true_lang", pred.alias("pred_lang")).groupBy(
        "true_lang", "pred_lang"
    ).agg(F.count(F.lit(1)).alias("n"))
    truth = cm.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    preds = cm.groupBy("pred_lang").agg(F.sum("n").alias("n_pred"))
    return (
        cm.join(F.broadcast(truth), "true_lang")
        .join(F.broadcast(preds), "pred_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.expr("n * 1000000 div n_true").alias("recall_ppm"),
            F.expr("n * 1000000 div n_pred").alias("precision_ppm"),
        )
    )


# ABC (Pareto) classification: cumulative revenue share thresholds as
# pure integer comparisons — no rounding at the class boundaries.
@register(
    "part_abc_classes",
    """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per_part),
    ranked AS (
      SELECT cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM per_part
    ),
    classed AS (
      SELECT cents,
             CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked CROSS JOIN tot
    )
    SELECT abc, COUNT(*) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents,
           CAST(SUM(cents) AS BIGINT) * 1000000
             // (SELECT total FROM tot) AS share_ppm
    FROM classed GROUP BY abc
    """,
)
def part_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B to 95%, C the
    tail.  Boundaries are integer comparisons (cum·100 ≤ total·80) —
    no double rounding can flip a part's class.  The ranking window
    runs on the KEY-REDUCED part table; output is 3 rows."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cents")
    )
    tot = per_part.agg(F.sum("cents").alias("total"))
    w = Window.orderBy(F.desc("cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_part.select(
        "cents", F.sum("cents").over(w).alias("cum")
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "cents",
        "total",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").alias("class_cents"),
        F.expr(
            "CAST(SUM(cents) * 1000000 div MAX(total) AS BIGINT)"
        ).alias("share_ppm"),
    )


# RFM segmentation: quintile codes over the key-reduced customer
# table (ntile fills earlier buckets first in both engines given the
# same key-tiebroken ORDER BY), integer-cents monetary.
@register(
    "customer_rfm",
    """
    WITH base AS (
      SELECT o_custkey,
             datediff('day', MAX(CAST(o_orderdate AS DATE)),
                      DATE '1998-12-31') AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    coded AS (
      SELECT o_custkey, monetary_cents,
             ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey)
               AS m
      FROM base
    )
    SELECT r, f, m, COUNT(*) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) / 100.0
             AS segment_revenue
    FROM coded GROUP BY r, f, m
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency/frequency/monetary quintiles per
    customer (1 = best), the classic CRM cut.  All three ntiles order
    with a key tiebreak, so bucket assignment is deterministic and
    identical in both engines; the fact shuffles once to the
    key-reduced base, and the windows run dim-sized.  Output: one row
    per occupied (r, f, m) cell with count and exact revenue."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-31").cast("date"),
            F.max(F.to_date("o_orderdate")),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100).cast("long")
        ).alias("monetary_cents"),
    )
    coded = base.select(
        "monetary_cents",
        F.ntile(5)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .alias("r"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("frequency"), "o_custkey"))
        .alias("f"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("monetary_cents"), "o_custkey"))
        .alias("m"),
    )
    return coded.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("monetary_cents") / 100.0).alias("segment_revenue"),
    )


# Seasonal-naive forecast evaluation: y_hat(d) = y(d-7); per-type MAE
# and bias in exact integer ratios — forecast backtesting as a query.
@register(
    "forecast_seasonal_naive",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT a.event_type, a.d, a.y AS actual, b.y AS forecast
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d = b.d + 7
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           CAST(SUM(abs(actual - forecast)) AS BIGINT) AS abs_err_sum,
           CAST(SUM(abs(actual - forecast)) AS BIGINT) * 1000000
             // CAST(SUM(actual) AS BIGINT) AS wape_ppm,
           CAST(SUM(actual - forecast) AS BIGINT) AS bias
    FROM joined GROUP BY event_type
    """,
)
def forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive baseline (forecast = same
    weekday last week) on daily event counts: per type, WAPE in exact
    ppm (Σ|err|·10^6 div Σactual) and signed bias — the benchmark any
    real forecasting model must beat, and the evaluation harness
    shape either way.  Self-join on the key-reduced daily table; all
    integers."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_timestamp(ts) div 86400").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    a = daily.alias("a")
    b = daily.select(
        F.col("event_type").alias("bt"),
        (F.col("d") + 7).alias("bd"),
        F.col("y").alias("forecast"),
    )
    joined = a.join(
        b, (F.col("a.event_type") == F.col("bt")) & (F.col("a.d") == F.col("bd"))
    ).select("a.event_type", F.col("a.y").alias("actual"), "forecast")
    err = F.col("actual") - F.col("forecast")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(err)).alias("abs_err_sum"),
        F.expr(
            "CAST(SUM(abs(actual - forecast)) * 1000000"
            " div SUM(actual) AS BIGINT)"
        ).alias("wape_ppm"),
        F.sum(err).alias("bias"),
    )


# Bounce-rate report composed over the gap sessionizer: single-event
# sessions per day, exact ppm shares.
@register(
    "session_bounce_rate",
    """
    WITH marked AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
             event_id,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                       > 90
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY epoch_sec, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    sessions AS (
      SELECT user_id, session_no,
             MIN(epoch_sec) // 86400 AS day_epoch,
             COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, session_no
    )
    SELECT day_epoch,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) * 1000000 // COUNT(*) AS bounce_ppm
    FROM sessions GROUP BY day_epoch
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate — share of gap-sessions containing exactly
    one event — composed directly over the sessionize operator (the
    90 s debounce semantics, one user_id shuffle); a session is dated
    by its first event.  Exact ppm shares; |days|-sized output."""
    sess = events.sessionize(spark, sf_dir)  # session-level rollup
    per_session = sess.select(
        F.expr("session_start div 86400").alias("day_epoch"),
        "n_events",
    )
    bounce = (F.col("n_events") == 1).cast("long")
    return per_session.groupBy("day_epoch").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(bounce).alias("n_bounces"),
        F.expr(
            "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("bounce_ppm"),
    )


# Category cross-sell matrix: distinct category pairs per order (the
# 6x6 merchandising view of the basket graph), integer-ppm shares.
@register(
    "category_cross_sell",
    """
    WITH cats AS (
      SELECT DISTINCT l_orderkey, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    pairs AS (
      SELECT a.p_type AS cat_a, b.p_type AS cat_b, COUNT(*) AS n_orders
      FROM cats a JOIN cats b
        ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      GROUP BY 1, 2
    ),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM cats)
    SELECT cat_a, cat_b, n_orders,
           n_orders * 1000000 // n_baskets AS basket_share_ppm
    FROM pairs CROSS JOIN tot
    """,
)
def category_cross_sell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-level cross-sell matrix: how often two product
    categories appear in the same order.  The pair expansion runs on
    the per-order SORTED CATEGORY SET (≤ |categories| = 6 entries —
    the same in-basket expansion as basket_pairs, but bounded by the
    category vocabulary, so the blow-up is at most 15 pairs/order at
    any scale).  Shares in exact ppm of all baskets."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cats = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    baskets = cats.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("p_type")).alias("cs")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(cs, (x, i) ->"
                    " transform(slice(cs, i + 2, size(cs)), y ->"
                    " struct(x AS cat_a, y AS cat_b))))"
                )
            ).alias("p")
        )
        .select("p.cat_a", "p.cat_b")
        .groupBy("cat_a", "cat_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = cats.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    return pairs.crossJoin(F.broadcast(tot)).select(
        "cat_a",
        "cat_b",
        "n_orders",
        F.expr("n_orders * 1000000 div n_baskets").alias(
            "basket_share_ppm"
        ),
    )


# Largest-remainder (Hamilton) apportionment: allocate an integer
# budget across categories proportional to revenue with the parts
# summing EXACTLY to the budget — floor shares + integer-remainder
# ranked top-ups, no floating point anywhere.
@register(
    "budget_allocation",
    """
    WITH rev AS (
      SELECT p_type,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS r FROM rev),
    base AS (
      -- Staged multiplier: floor(10^6 c / r) = 1000 q1 + (1000 r1)//r
      -- with q1 = (1000 c)//r, r1 = (1000 c)%r — identical values, but
      -- the largest intermediate is 1000·r instead of 10^6·c, so the
      -- int64 bound moves from r <= 9.2e12 cents (~$92B, hit near
      -- TPC-H SF1) to r <= 9.2e15 (~$92T).  Same form on both sides.
      SELECT p_type, cents,
             1000 * ((1000 * cents) // r)
               + (1000 * ((1000 * cents) % r)) // r AS floor_alloc,
             (1000 * ((1000 * cents) % r)) % r AS remainder
      FROM rev CROSS JOIN tot
    ),
    short AS (
      SELECT CAST(1000000 - SUM(floor_alloc) AS BIGINT) AS shortfall
      FROM base
    ),
    ranked AS (
      SELECT p_type, cents, floor_alloc,
             row_number() OVER (ORDER BY remainder DESC, p_type) AS rk
      FROM base
    )
    SELECT p_type, cents AS revenue_cents,
           floor_alloc
           + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS allocation
    FROM ranked CROSS JOIN short
    """,
)
def budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment: split a 1,000,000-unit
    budget across categories proportional to exact revenue cents so
    that the integer parts sum EXACTLY to the budget — floor shares,
    then +1 to the largest integer remainders (key tiebreak).  The
    allocation problem every billing/attribution system has, solved
    without a single floating-point operation.  Scale: one scan-agg
    to the category vocabulary; everything after is |categories|
    rows."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    tot = rev.agg(F.sum("cents").alias("r"))
    # Staged multiplier — see the oracle comment: identical values,
    # int64-safe to ~$92T total revenue instead of ~$92B.
    base = rev.crossJoin(F.broadcast(tot)).select(
        "p_type",
        "cents",
        F.expr(
            "1000 * ((1000 * cents) div r)"
            " + (1000 * ((1000 * cents) % r)) div r"
        ).alias("floor_alloc"),
        F.expr("(1000 * ((1000 * cents) % r)) % r").alias("remainder"),
    )
    short = base.agg(
        (F.lit(1000000) - F.sum("floor_alloc")).alias("shortfall")
    )
    w = Window.orderBy(F.desc("remainder"), "p_type")
    ranked = base.select(
        "p_type",
        "cents",
        "floor_alloc",
        F.row_number().over(w).alias("rk"),
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "p_type",
        F.col("cents").alias("revenue_cents"),
        (
            F.col("floor_alloc")
            + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0)
        ).alias("allocation"),
    )


# Robust outlier gate: median + MAD via percentile_disc (actual data
# values — deterministic where mean/stddev moments would need care);
# the 3-MAD fence as an integer-cents comparison.
@register(
    "events_mad_outliers",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT event_type,
             quantile_disc(cents, 0.5) AS med_cents
      FROM v GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, cents, med_cents,
             abs(cents - med_cents) AS adev
      FROM v JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             quantile_disc(adev, 0.5) AS mad_cents
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           COUNT(*) AS n_events,
           CAST(MAX(med_cents) AS BIGINT) AS med_cents,
           CAST(MAX(mad_cents) AS BIGINT) AS mad_cents,
           CAST(SUM(CASE WHEN abs(cents - med_cents) > 3 * mad_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: median and MAD (median absolute
    deviation) per event type via percentile_disc — both statistics
    are ACTUAL data values, so unlike mean/stddev there is no
    accumulation-order question at all — and the 3-MAD fence as a
    pure integer-cents comparison.  Two grouped passes (median, then
    MAD over deviations), both keyed on event_type; the robust
    complement to the z-score outlier operator."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    # percentile_disc picks an ACTUAL cents value but Spark types it
    # DOUBLE; cast back to long (exact — it's a data value) so the
    # output matches the oracle's BIGINT, not 2449.0-vs-2449.
    med = v.groupBy("event_type").agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)"
            " AS LONG)"
        ).alias("med_cents")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "cents",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)"
            " AS LONG)"
        ).alias("mad_cents")
    )
    return dev.join(F.broadcast(mad), "event_type").groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("med_cents").alias("med_cents"),
        F.max("mad_cents").alias("mad_cents"),
        F.sum(
            (
                F.abs(F.col("cents") - F.col("med_cents"))
                > 3 * F.col("mad_cents")
            ).cast("long")
        ).alias("n_outliers"),
    )


# Holt linear smoothing via recursive CTE — COUPLED state (level +
# trend) carried through the recursion, all integer-scaled floor
# divisions; the one-step-ahead forecast rides each row.
@register(
    "events_holt_recursive",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, d, n,
             row_number() OVER (PARTITION BY event_type ORDER BY d) - 1
               AS i
      FROM daily
    ),
    holt(event_type, i, d, n, lvl, trd) AS (
      SELECT event_type, i, d, n,
             CAST(n * 1000 AS BIGINT), CAST(0 AS BIGINT)
      FROM idx WHERE i = 0
      UNION ALL
      SELECT x.event_type, x.i, x.d, x.n,
             CAST((3 * x.n * 1000 + 7 * (h.lvl + h.trd)) // 10
                  AS BIGINT),
             CAST((2 * ((3 * x.n * 1000 + 7 * (h.lvl + h.trd)) // 10
                        - h.lvl)
                   + 8 * h.trd) // 10 AS BIGINT)
      FROM holt h
      JOIN idx x ON x.event_type = h.event_type AND x.i = h.i + 1
    )
    SELECT event_type, d AS day_epoch, CAST(n AS BIGINT) AS n_events,
           lvl AS level_scaled, trd AS trend_scaled,
           (lvl + trd) / 1000.0 AS forecast_next
    FROM holt
    """,
)
def events_holt_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (level + trend) smoothing of daily event counts —
    the COUPLED-state recursion the EMA query generalizes to: each
    level carries a two-component state vector, with alpha = 0.3 and
    beta = 0.2 as integer-scaled floor divisions (x1000), so the whole
    trajectory is engine-exact (integer // truncates identically in
    both engines, including the negative trends a declining series
    produces).  Same materialise-before-recursion discipline as the
    EMA (the base table is checkpointed; each recursion level joins a
    |types|x|days| table, never the fact)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    daily = ev.groupBy(
        "event_type",
        F.expr("unix_timestamp(ts) div 86400").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    idx = daily.withColumn(
        "i",
        F.row_number().over(
            _W.partitionBy("event_type").orderBy("d")
        )
        - 1,
    ).localCheckpoint(eager=False)
    idx.createOrReplaceTempView("holt_idx")
    return spark.sql(
        """
        WITH RECURSIVE holt(event_type, i, d, n, lvl, trd) AS (
          SELECT event_type, i, d, n,
                 CAST(n * 1000 AS BIGINT), CAST(0 AS BIGINT)
          FROM holt_idx WHERE i = 0
          UNION ALL
          SELECT x.event_type, x.i, x.d, x.n,
                 CAST((3 * x.n * 1000 + 7 * (h.lvl + h.trd)) div 10
                      AS BIGINT),
                 CAST((2 * ((3 * x.n * 1000 + 7 * (h.lvl + h.trd))
                            div 10 - h.lvl)
                       + 8 * h.trd) div 10 AS BIGINT)
          FROM holt h
          JOIN holt_idx x ON x.event_type = h.event_type
                         AND x.i = h.i + 1
        )
        SELECT event_type, d AS day_epoch, CAST(n AS BIGINT) AS n_events,
               lvl AS level_scaled, trd AS trend_scaled,
               (lvl + trd) / 1000.0 AS forecast_next
        FROM holt
        """
    )


# Recommender negative sampling: per-user deterministic hash draws
# from the catalog, anti-joined against actual purchases — the
# training-pair generator for implicit-feedback models.
@register(
    "recsys_negative_samples",
    """
    WITH purchased AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS part_id
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    users AS (SELECT DISTINCT o_custkey AS user_id FROM orders),
    np AS (SELECT COUNT(*) AS n_parts FROM part),
    cand AS (
      SELECT user_id, i.i AS draw_i,
             CAST(('0x' || substr(md5('neg-' || CAST(user_id AS VARCHAR)
                   || '-' || CAST(i.i AS VARCHAR)), 1, 8)) AS BIGINT)
             % n_parts AS part_id
      FROM users
      CROSS JOIN (SELECT unnest(range(0, 5)) AS i) i
      CROSS JOIN np
    )
    SELECT c.user_id, c.part_id, c.draw_i
    FROM cand c
    LEFT JOIN purchased p
      ON c.user_id = p.user_id AND c.part_id = p.part_id
    WHERE p.user_id IS NULL
    """,
)
def recsys_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for implicit-feedback recommender training:
    k = 5 deterministic hash draws per user from the (contiguous-id)
    part catalog, anti-joined against true purchases so every emitted
    (user, part) pair is a verified negative.  Reproducible draws are
    what make distributed training-data generation re-runnable; the
    anti-join is the same RI shape as the orphan gate.  Catalog size
    rides as a 1-row broadcast; output is k·|users| minus accidental
    positives."""
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    purchased = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("p_user"),
            F.col("l_partkey").alias("p_part"),
        )
        .distinct()
    )
    users = orders.select(
        F.col("o_custkey").alias("user_id")
    ).distinct()
    np_ = load_table(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    cand = (
        users.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("draw_i"),
        )
        .crossJoin(F.broadcast(np_))
        .select(
            "user_id",
            "draw_i",
            (
                portable_hash32(
                    F.concat(
                        F.lit("neg-"),
                        F.col("user_id").cast("string"),
                        F.lit("-"),
                        F.col("draw_i").cast("string"),
                    )
                )
                % F.col("n_parts")
            ).alias("part_id"),
        )
    )
    return cand.join(
        purchased,
        (cand.user_id == purchased.p_user)
        & (cand.part_id == purchased.p_part),
        "left_anti",
    ).select("user_id", "part_id", "draw_i")


# Audience overlap matrix: exact pairwise intersections of the
# event-type user audiences via one self-join on the deduped pairs.
@register(
    "audience_overlap",
    """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM d a JOIN d b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           sa.n AS n_a, sb.n AS n_b,
           n_both * 1000000 // (sa.n + sb.n - n_both) AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON type_a = sa.event_type
    JOIN sizes sb ON type_b = sb.event_type
    """,
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types — the exact
    small-vocabulary counterpart of the HLL overlap estimate (when
    |types| is tiny, the exact intersection join is cheaper than
    sketches; the operators document each other's applicability).
    One user-keyed self-join of the deduped (type, user) pairs;
    Jaccard in exact ppm; |types|²-sized output."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct().localCheckpoint(
        eager=False
    )
    sizes = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(
        F.col("event_type").alias("type_a"), "user_id"
    )
    b = d.select(
        F.col("event_type").alias("type_b"), "user_id"
    )
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "n_both * 1000000 div (n_a + n_b - n_both)"
            ).alias("jaccard_ppm"),
        )
    )


# Fulfillment lag: ship date minus order date per line item — day
# buckets plus discrete percentiles, all integers / actual values.
@register(
    "fulfillment_lag",
    """
    WITH lag_days AS (
      SELECT datediff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT days, COUNT(*) AS n_lines,
           (SELECT quantile_disc(days, 0.5) FROM lag_days) AS p50_days,
           (SELECT quantile_disc(days, 0.9) FROM lag_days) AS p90_days
    FROM lag_days GROUP BY days
    """,
)
def fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag distribution — the operations
    SLA view: integer day buckets with the p50/p90 discrete
    percentiles annotated on every row (1-row scalar riding as a
    broadcast).  Fact-fact join keyed on orderkey; day arithmetic and
    counts all integer, percentiles actual data values."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    lag_days = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(F.datediff("sd", "od").alias("days"))
    hist = lag_days.groupBy("days").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    # CAST: Spark types percentile_disc DOUBLE even over ints; the
    # picked value IS an integer day count, so the cast is exact and
    # keeps the column int-typed like the oracle's quantile_disc.
    pct = lag_days.agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY days)"
            " AS LONG)"
        ).alias("p50_days"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY days)"
            " AS LONG)"
        ).alias("p90_days"),
    )
    return hist.crossJoin(F.broadcast(pct)).select(
        "days", "n_lines", "p50_days", "p90_days"
    )


# ------------------------------------------- winnowing + BM25 (round 3)

# MOSS winnowing fingerprints: the oracle replays the k-gram md5 hash
# ladder and the per-window list_min with DuckDB's inclusive slices
# (toks[i:i+k-1] == Spark slice(toks, i, k)).
register(
    "text_winnowing",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= {text.WINNOW_K} THEN
               list_transform(
                 generate_series(1, len(toks) - {text.WINNOW_K - 1}),
                 i -> CAST(('0x' || substr(md5(array_to_string(
                        toks[i:i+{text.WINNOW_K - 1}], ' ')), 1, 8))
                      AS BIGINT))
             ELSE [] END AS hs
      FROM t
    ),
    wd AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= {text.WINNOW_W} THEN
               list_transform(
                 generate_series(1, len(hs) - {text.WINNOW_W - 1}),
                 i -> list_min(hs[i:i+{text.WINNOW_W - 1}]))
             WHEN len(hs) > 0 THEN [list_min(hs)]
             ELSE [] END AS fps
      FROM g
    )
    SELECT doc_id, unnest(list_distinct(fps)) AS fingerprint FROM wd
    """,
)(text.winnow_fingerprints)


# Shared-fingerprint pairs with boilerplate (df) pruning and exact
# fingerprint Jaccard in ppm.
register(
    "dedup_winnow_pairs",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= {text.WINNOW_K} THEN
               list_transform(
                 generate_series(1, len(toks) - {text.WINNOW_K - 1}),
                 i -> CAST(('0x' || substr(md5(array_to_string(
                        toks[i:i+{text.WINNOW_K - 1}], ' ')), 1, 8))
                      AS BIGINT))
             ELSE [] END AS hs
      FROM t
    ),
    wd AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= {text.WINNOW_W} THEN
               list_transform(
                 generate_series(1, len(hs) - {text.WINNOW_W - 1}),
                 i -> list_min(hs[i:i+{text.WINNOW_W - 1}]))
             WHEN len(hs) > 0 THEN [list_min(hs)]
             ELSE [] END AS fps
      FROM g
    ),
    fp AS (SELECT doc_id, unnest(list_distinct(fps)) AS fingerprint
           FROM wd),
    keepfp AS (
      SELECT fingerprint FROM fp GROUP BY 1
      HAVING COUNT(*) <= {text.WINNOW_MAX_DF}
    ),
    fpk AS (SELECT fp.* FROM fp JOIN keepfp USING (fingerprint)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fpk GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM fpk a JOIN fpk b
        ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT doc_a, doc_b, n_shared,
           n_shared * 1000000
             // (sa.n_fp + sb.n_fp - n_shared) AS jac_ppm
    FROM shared
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    """,
)(text.winnow_pairs)


# BM25 top-k: the score expression string is SHARED verbatim with the
# Spark operator (text.bm25_score_sql) — zero expression-tree drift.
_BM25_TFS = ",\n             ".join(
    f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
    for i, t in enumerate(text.BM25_QUERY)
)
_BM25_DFS = ",\n             ".join(
    f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
    for i in range(len(text.BM25_QUERY))
)
_BM25_TF_OUT = ", ".join(
    f"tf_{i} AS tf_{t}" for i, t in enumerate(text.BM25_QUERY)
)
@register(
    "text_bm25_topk",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    per_doc AS (
      SELECT doc_id, len(toks) AS dl,
             {_BM25_TFS}
      FROM t
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {_BM25_DFS}
      FROM per_doc
    ),
    scored AS (
      SELECT doc_id, dl, {_BM25_TF_OUT},
             round({text.bm25_score_sql()}, 9) AS bm25
      FROM per_doc CROSS JOIN stats
    )
    SELECT * EXCLUDE (rk) FROM (
      SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk
      FROM scored WHERE bm25 > 0
    ) WHERE rk <= {text.BM25_TOPK}
    """,
)
def text_bm25_topk_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry wrapper: drop the oracle's rk helper column on the
    Spark side too (bm25_topk already drops it)."""
    return text.bm25_topk(spark, sf_dir)


# Unigram cross-entropy quality gate: per-token ln p scored on the
# joined row, per-doc sum as a SEQUENTIAL position-ordered fold on
# both engines (0.0-init aggregate == seedless list_reduce because
# 0.0 + x is exact — the survival-fold device).
register(
    "text_unigram_ce",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    tok AS (
      SELECT doc_id, u.pos AS pos, u.term AS term
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks)),
                     i -> struct_pack(pos := i, term := toks[i]))) AS u
            FROM t)
    ),
    freq AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM freq),
    scored AS (
      SELECT doc_id, pos, ln(CAST(n AS DOUBLE) / total) AS lnp
      FROM tok JOIN freq USING (term) CROSS JOIN tot
    ),
    folded AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             list(lnp ORDER BY pos) AS ls
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round((-list_reduce(ls, (a, b) -> a + b)) / n_tokens, 9)
             AS ce_nats,
           round((-list_reduce(ls, (a, b) -> a + b)) / n_tokens, 9)
             <= {text.UNIGRAM_CE_MAX} AS keep
    FROM folded
    """,
)(text.unigram_cross_entropy)


from data_pipeline_for_e_commerce_shop_spark.operators import corpus as _corpus  # noqa: E402

# Deterministic exactly-n sample: md5 draw over doc_id, n smallest.
register(
    "corpus_fixed_sample",
    f"""
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5('fsample' || CAST(doc_id AS VARCHAR)),
                 1, 8)) AS BIGINT) AS draw
    FROM documents
    ORDER BY draw, doc_id
    LIMIT {_corpus.FIXED_SAMPLE_N}
    """,
)(_corpus.fixed_size_sample)


# Before/after exact-dedup ledger per language, exact ppm removal.
register(
    "corpus_dedup_token_audit",
    """
    WITH d AS (
      SELECT doc_id, lang, md5(text) AS fp,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    flagged AS (
      SELECT lang, n_tokens,
             CASE WHEN MIN(doc_id) OVER (PARTITION BY fp) = doc_id
                  THEN 1 ELSE 0 END AS kept
      FROM d
    )
    SELECT lang,
           COUNT(*) AS docs_before,
           CAST(SUM(kept) AS BIGINT) AS docs_after,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
           CAST(SUM(n_tokens * kept) AS BIGINT) AS tokens_after,
           (CAST(SUM(n_tokens) AS BIGINT)
              - CAST(SUM(n_tokens * kept) AS BIGINT)) * 1000000
             // CAST(SUM(n_tokens) AS BIGINT) AS removed_token_ppm
    FROM flagged GROUP BY lang
    """,
)(_corpus.dedup_token_audit)


# Exact duplicated-span dedup (Lee et al. suffix-array shape): every
# overlapping k-token window hashed, duplicated windows merged into
# maximal spans per doc.  Window width and occurrence threshold are
# interpolated from the operator's module constants so the oracle
# cannot drift from the implementation.
register(
    "dedup_exact_spans",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, len(t) AS n_tokens, i,
             md5(array_to_string(t[i:i+{dedup.SPAN_TOKENS - 1}], ' ')) AS h
      FROM toks,
           UNNEST(generate_series(1, len(t) - {dedup.SPAN_TOKENS - 1}))
             AS g(i)
    ),
    dup AS (
      SELECT h FROM wins
      GROUP BY h HAVING COUNT(*) >= {dedup.SPAN_MIN_OCCURRENCES}
    ),
    d AS (SELECT doc_id, n_tokens, i FROM wins JOIN dup USING (h)),
    isl AS (
      SELECT doc_id, n_tokens, i,
             CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                       <= {dedup.SPAN_TOKENS}
                  THEN 0 ELSE 1 END AS brk
      FROM d
    ),
    grp AS (
      SELECT doc_id, n_tokens, i,
             CAST(SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS g
      FROM isl
    ),
    spans AS (
      SELECT doc_id, n_tokens,
             MIN(i) AS span_start,
             MAX(i) + {dedup.SPAN_TOKENS - 1} AS span_end
      FROM grp GROUP BY doc_id, n_tokens, g
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
           n_tokens,
           CAST(SUM(span_end - span_start + 1) AS BIGINT) * 1000000
             // n_tokens AS dup_ppm
    FROM spans GROUP BY doc_id, n_tokens
    ORDER BY doc_id
    """,
)(dedup.duplicated_spans)


# ------------------------------------------ TPC-H classic join shapes

# Q3 shipping priority: unshipped-revenue top-10.  The date cutoff
# splits orders (placed before) from lineitems (shipped after); the
# segment-filtered customer rides as a broadcast key list.
SHIPPING_PRIORITY_SEGMENT = "BUILDING"
SHIPPING_PRIORITY_CUTOFF = "1998-06-01 00:00:00"

@register(
    "shipping_priority",
    f"""
    SELECT l_orderkey,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT))/100.0 AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{SHIPPING_PRIORITY_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{SHIPPING_PRIORITY_CUTOFF}'
      AND l_shipdate > TIMESTAMP '{SHIPPING_PRIORITY_CUTOFF}'
    GROUP BY l_orderkey, order_date, o_orderpriority
    ORDER BY revenue DESC, order_date, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of orders not yet shipped at the
    cutoff, top-10 by discounted revenue.  Plan: both date filters
    push to the scans, the segment-filtered customer broadcasts
    (key-only projection), lineitem⋈orders is the one fact shuffle,
    and the fully-tiebroken ORDER BY + LIMIT compiles to
    TakeOrderedAndProject — no global sort materializes.  The
    reference has no multi-condition analytical join at all; this is
    the canonical one."""
    cutoff = F.lit(SHIPPING_PRIORITY_CUTOFF).cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == SHIPPING_PRIORITY_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "order_date", "l_orderkey")
        .limit(10)
    )


# Q14 promo revenue share: conditional-aggregate ratio over one month,
# exact ppm integers (numerator and denominator are cents BIGINTs).
PROMO_MONTH_START = "1997-01-01 00:00:00"
PROMO_MONTH_END = "1997-02-01 00:00:00"

@register(
    "promo_revenue_share",
    f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT) ELSE 0 END) AS BIGINT) * 1000000
             // CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                              AS BIGINT)) AS BIGINT) AS promo_ppm
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{PROMO_MONTH_START}'
      AND l_shipdate <  TIMESTAMP '{PROMO_MONTH_END}'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's discounted revenue from
    promo-typed parts, as an exact ppm integer.  The month filter
    pushes to the lineitem scan, part broadcasts (2-column
    projection), and the whole answer is one map-side-combined global
    aggregate — 1 output row regardless of scale."""
    start = F.lit(PROMO_MONTH_START).cast("timestamp")
    end = F.lit(PROMO_MONTH_END).cast("timestamp")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).alias("promo_cents"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.expr("promo_cents * 1000000 div total_cents").alias(
                "promo_ppm"
            ),
        )
    )


# Q15 top supplier: quarter revenue per supplier, winners at the max.
TOP_SUPPLIER_QTR_START = "1997-01-01 00:00:00"
TOP_SUPPLIER_QTR_END = "1997-04-01 00:00:00"

@register(
    "top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_QTR_START}'
        AND l_shipdate <  TIMESTAMP '{TOP_SUPPLIER_QTR_END}'
      GROUP BY 1
    ),
    mx AS (SELECT MAX(rev_cents) AS max_cents FROM rev)
    SELECT s.s_suppkey, s_name, rev_cents, rev_cents/100.0 AS revenue
    FROM rev r
    JOIN supplier s ON r.s_suppkey = s.s_suppkey
    CROSS JOIN mx
    WHERE rev_cents = max_cents
    ORDER BY s.s_suppkey
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarter revenue.
    The per-supplier aggregate is one shuffle; the corpus maximum
    rides back as a 1-row broadcast crossJoin (the scalar-subquery
    device every stats query here uses) — no single-partition global
    window, so the plan holds at any supplier count.  Ties return all
    winners, ordered by key."""
    start = F.lit(TOP_SUPPLIER_QTR_START).cast("timestamp")
    end = F.lit(TOP_SUPPLIER_QTR_END).cast("timestamp")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end))
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    # The per-supplier aggregate feeds BOTH the max reduction and the
    # winner join — materialize it once or the lineitem scan
    # duplicates into each subtree (the plan-reuse lesson).
    rev = (
        li.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("rev_cents")
        )
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("rev_cents").alias("max_cents"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.join(F.broadcast(supp), "s_suppkey")
        .crossJoin(F.broadcast(mx))
        .where(F.col("rev_cents") == F.col("max_cents"))
        .select(
            "s_suppkey",
            "s_name",
            "rev_cents",
            (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        )
        .orderBy("s_suppkey")
    )


from data_pipeline_for_e_commerce_shop_spark.streaming.dedup import (  # noqa: E402
    stream_dedup_kpis,
)

# Streaming delivery-dedup: the stream carries every 20th event TWICE
# (a staged re-delivery), dropDuplicatesWithinWatermark must emit each
# exactly once, so the drained per-type aggregate equals the original
# duplicate-free table's — which is precisely what this oracle
# computes.  Inflated counts = dedup dropped nothing; deflated =
# dropped too much.
register(
    "events_stream_dedup",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1
    """,
)(stream_dedup_kpis)


# Positional inverted-index phrase search vs the oracle's naive
# every-window scan — same answer, opposite algorithm.  The phrase
# constant is interpolated from the operator module.
register(
    "text_phrase_search",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    scanned AS (
      SELECT doc_id,
             len(list_filter(generate_series(1, len(t) - {len(text.PHRASE_QUERY) - 1}),
                 i -> {" AND ".join(f"t[i+{j}] = '{w}'" for j, w in enumerate(text.PHRASE_QUERY))}))
               AS n_matches
      FROM toks
    )
    SELECT doc_id, CAST(n_matches AS INTEGER) AS n_matches
    FROM scanned WHERE n_matches >= 1
    ORDER BY doc_id
    """,
)(text.phrase_search)


def _bpe_oracle(rounds: int) -> str:
    """Unrolled BPE-training oracle: per round, pair counts over the
    word-type vocabulary, fully-tiebroken argmax, and the SAME greedy
    list_reduce fold the Spark side runs (text.bpe_merge_fold_sql) —
    DuckDB's reduce seeds with the first element, Spark's with an
    empty array; the two are provably identical here because the
    first step of the empty-seed fold just appends the first symbol."""
    ctes = [
        """w0 AS (
      SELECT word, COUNT(*) AS n,
             list_filter(string_split(word, ''), x -> x != '') AS s
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word != '' GROUP BY word
    )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""p{r} AS (
      SELECT s[i] AS a, s[i+1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
      FROM w{p}, UNNEST(generate_series(1, len(s) - 1)) AS g(i)
      GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""b{r} AS (SELECT a, b, cnt FROM p{r}
      ORDER BY cnt DESC, a, b LIMIT 1)"""
        )
        ctes.append(
            f"""w{r} AS (
      SELECT word, n,
             list_reduce(list_transform(s, x -> [x]),
               (acc, x) -> CASE WHEN len(acc) > 0
                     AND acc[-1] = bb.a AND x[1] = bb.b
                 THEN acc[1:len(acc)-1] || [bb.a || bb.b]
                 ELSE acc || x END) AS s
      FROM w{p} CROSS JOIN b{r} bb
    )"""
        )
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS merge_round, a AS left_sym, b AS right_sym,"
        f" cnt AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    {sel}\n    ORDER BY merge_round"
    )


# Distributed BPE tokenizer training: vocabulary-sized pair counting,
# 1-row argmax broadcast, greedy fold merge — `rounds` learned rules.
register("text_bpe_merges", _bpe_oracle(text.BPE_ROUNDS))(text.bpe_merges)


# Temperature-scaled source mixing (p^alpha rebalance, alpha=0.5):
# sqrt-only float path rounded to 9 decimals on both engines.
register(
    "corpus_temperature_mix",
    """
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
             SUM(sqrt(n_docs)) AS z
      FROM c
    )
    SELECT source, n_docs,
           n_docs * 1000000 // n_total AS natural_ppm,
           round(sqrt(n_docs) / z, 9) AS temp_share,
           round(sqrt(n_docs) / z * n_total / n_docs, 9) AS epochs
    FROM c CROSS JOIN t
    ORDER BY source
    """,
)(_corpus.temperature_mix)


# IVF index maintenance: arriving batch assigned to FROZEN centroids,
# per-list growth + balance report (the retrain trigger).  Batch
# selector and centroid count interpolate from the operator module.
register(
    "ann_ivf_incremental",
    f"""
    WITH n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    old AS (SELECT * FROM n WHERE vec_id % {similarity.IVF_ADD_MOD} != 0),
    newb AS (SELECT * FROM n WHERE vec_id % {similarity.IVF_ADD_MOD} = 0),
    cent AS (
      SELECT vec_id AS cluster_id, v AS cv, nrm AS cn
      FROM old
      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
      LIMIT {similarity.IVF_ADD_CENTROIDS}
    ),
    before AS (
      SELECT cluster_id, COUNT(*) AS n_before FROM (
        SELECT old.vec_id, cent.cluster_id,
               row_number() OVER (PARTITION BY old.vec_id
                 ORDER BY list_dot_product(old.v, cent.cv)
                            / (old.nrm * cent.cn) DESC,
                          cent.cluster_id ASC) AS pr
        FROM old CROSS JOIN cent
      ) WHERE pr = 1 GROUP BY cluster_id
    ),
    added AS (
      SELECT cluster_id, COUNT(*) AS n_added FROM (
        SELECT newb.vec_id, cent.cluster_id,
               row_number() OVER (PARTITION BY newb.vec_id
                 ORDER BY list_dot_product(newb.v, cent.cv)
                            / (newb.nrm * cent.cn) DESC,
                          cent.cluster_id ASC) AS pr
        FROM newb CROSS JOIN cent
      ) WHERE pr = 1 GROUP BY cluster_id
    ),
    lists AS (
      SELECT cent.cluster_id,
             COALESCE(n_before, 0) AS n_before,
             COALESCE(n_added, 0) AS n_added,
             COALESCE(n_before, 0) + COALESCE(n_added, 0) AS n_after
      FROM cent
      LEFT JOIN before ON cent.cluster_id = before.cluster_id
      LEFT JOIN added ON cent.cluster_id = added.cluster_id
    ),
    tot AS (SELECT CAST(SUM(n_after) AS BIGINT) AS total_after FROM lists)
    SELECT cluster_id,
           CAST(n_before AS BIGINT) AS n_before,
           CAST(n_added AS BIGINT) AS n_added,
           CAST(n_after AS BIGINT) AS n_after,
           CAST(n_after AS BIGINT) * 1000000 // total_after AS share_ppm,
           CAST(n_after AS BIGINT) * {similarity.IVF_ADD_CENTROIDS}
             * 1000000 // total_after AS balance_ppm
    FROM lists CROSS JOIN tot
    ORDER BY cluster_id
    """,
)(similarity.ivf_incremental_add)


# Multinomial Naive Bayes language classifier trained on the
# doc_id % mod != 0 split, held-out confusion matrix.  Smoothing,
# split selector, and the sequential score fold mirror the operator;
# the fold is the unigram-CE float-parity device.
_NB_PRED_CTES = f"""
    WITH tr AS (
      SELECT doc_id, lang, text FROM documents
      WHERE doc_id % {text.NB_TEST_MOD} != 0
    ),
    te AS (
      SELECT doc_id, lang AS true_lang, text FROM documents
      WHERE doc_id % {text.NB_TEST_MOD} = 0
    ),
    trt AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM tr
    ),
    cnt AS (SELECT lang, term, COUNT(*) AS c FROM trt GROUP BY 1, 2),
    ltot AS (SELECT lang, COUNT(*) AS tot FROM trt GROUP BY 1),
    vocab AS (SELECT DISTINCT term FROM trt),
    v AS (SELECT COUNT(*) AS v FROM vocab),
    ntr AS (SELECT COUNT(*) AS n_docs FROM tr),
    prior AS (
      SELECT lang, ln(CAST(COUNT(*) AS DOUBLE) / n_docs) AS pr
      FROM tr CROSS JOIN ntr GROUP BY lang, n_docs
    ),
    model AS (
      SELECT vocab.term, ltot.lang,
             ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0)
                / (ltot.tot + v.v)) AS lp
      FROM vocab CROSS JOIN ltot CROSS JOIN v
      LEFT JOIN cnt c ON c.term = vocab.term AND c.lang = ltot.lang
    ),
    tet AS (
      SELECT doc_id, true_lang, i AS pos, t[i] AS term
      FROM (SELECT doc_id, true_lang, string_split(text, ' ') AS t
            FROM te),
           UNNEST(generate_series(1, len(t))) AS g(i)
    ),
    scored AS (
      SELECT tt.doc_id, tt.true_lang, l.lang, tt.pos,
             COALESCE(m.lp, ln(1.0 / (l.tot + v.v))) AS lp
      FROM tet tt CROSS JOIN ltot l CROSS JOIN v
      LEFT JOIN model m ON m.term = tt.term AND m.lang = l.lang
    ),
    folded AS (
      SELECT doc_id, true_lang, lang,
             round(pr + list_reduce(list(lp ORDER BY pos),
                                    (a, b) -> a + b), 9) AS score
      FROM scored JOIN prior USING (lang)
      GROUP BY doc_id, true_lang, lang, pr
    ),
    pred AS (
      SELECT doc_id, true_lang, lang AS pred_lang FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, lang ASC) AS rk
        FROM folded
      ) WHERE rk = 1
    )
"""

register(
    "text_nb_classifier",
    _NB_PRED_CTES + """
    SELECT true_lang, pred_lang, COUNT(*) AS n_docs
    FROM pred GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)(text.nb_language_classifier)


from data_pipeline_for_e_commerce_shop_spark.operators import layout as _layout  # noqa: E402

# Small-partition compaction planner: linear-partitioned write groups
# of ~target bytes over the (source, lang) partition stats.  Target
# interpolated from the operator module.
register(
    "layout_compaction_plan",
    f"""
    WITH parts AS (
      SELECT source || '/' || lang AS part_key,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY source, lang
    ),
    grouped AS (
      SELECT part_key, bytes,
             CAST(COALESCE(CAST(SUM(bytes) OVER (
                     ORDER BY part_key
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS BIGINT), 0)
                  // {_layout.COMPACT_TARGET_BYTES} AS BIGINT) AS group_id
      FROM parts
    )
    SELECT group_id,
           COUNT(*) AS n_partitions,
           MIN(part_key) AS first_part,
           MAX(part_key) AS last_part,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(bytes) AS BIGINT) * 1000000
             // {_layout.COMPACT_TARGET_BYTES} AS fill_ppm
    FROM grouped GROUP BY group_id
    ORDER BY group_id
    """,
)(_layout.compaction_plan)


# Corpus dataset-card panel: one GROUPING SETS pass with the inline
# exact-dup keeper rule (reconciles with the dedup ledger).
register(
    "corpus_datacard",
    """
    WITH base AS (
      SELECT source, lang, doc_id,
             len(string_split(text, ' ')) AS n_toks,
             md5(text) AS fp
      FROM documents
    ),
    flagged AS (
      SELECT source, lang, n_toks,
             CASE WHEN MIN(doc_id) OVER (PARTITION BY fp) != doc_id
                  THEN 1 ELSE 0 END AS is_dup
      FROM base
    )
    SELECT source, lang,
           CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS level,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
           CAST(SUM(is_dup) AS BIGINT) * 1000000 // COUNT(*) AS dup_ppm
    FROM flagged
    GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
    """,
)(_corpus.datacard)


# TPC-H Q18 shape: large-volume orders (aggregate filter, then the
# qualifying keys semi-join back to the detail for customer context).
LARGE_ORDER_MIN_QTY = 150

@register(
    "large_volume_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS BIGINT)) > {LARGE_ORDER_MIN_QTY}
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date, total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds the
    threshold, joined back for customer context, top-20.  The HAVING
    aggregate runs first (one fact shuffle, map-combined), the
    qualifying key set is tiny and drives broadcast joins against
    orders/customer, and the fully-tiebroken ORDER BY + LIMIT is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > LARGE_ORDER_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


from data_pipeline_for_e_commerce_shop_spark.sources import generator as _gen  # noqa: E402

# Custom Python DataSource scan: per-category KPIs over the
# deterministic generator — both engines derive every column from
# md5(row_id), so a storageless source still gets the full value-hash
# gate.  Constants interpolate from the source module.
@register(
    "synthetic_source_kpis",
    f"""
    WITH g AS (
      SELECT i AS row_id,
             'cat' || (CAST(('0x' || substr(md5('gen-' || i), 1, 8))
                       AS BIGINT) % {_gen.GEN_CATEGORIES}) AS category,
             CAST(('0x' || substr(md5('gen-' || i), 9, 8)) AS BIGINT)
               % {_gen.GEN_CENTS_MOD} AS value_cents
      FROM generate_series(0, {_gen.GEN_ROWS - 1}) AS t(i)
    )
    SELECT category,
           COUNT(*) AS n_rows,
           CAST(SUM(value_cents) AS BIGINT) AS total_cents,
           CAST(MIN(row_id) AS BIGINT) AS first_row,
           CAST(MAX(row_id) AS BIGINT) AS last_row
    FROM g GROUP BY 1 ORDER BY 1
    """,
)
def synthetic_source_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python DataSource (partitioned deterministic
    generator) and aggregate per category.  Each of the source's input
    partitions generates its own id range executor-side — a zero-IO
    scan that parallelizes like parquet.  sf_dir is unused: the source
    IS the data."""
    _gen.register_generator(spark)
    g = (
        spark.read.format("syntheticgen")
        .option("n", _gen.GEN_ROWS)
        .option("partitions", _gen.GEN_PARTITIONS)
        .load()
    )
    return (
        g.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value_cents").alias("total_cents"),
            F.min("row_id").alias("first_row"),
            F.max("row_id").alias("last_row"),
        )
        .orderBy("category")
    )


# transformWithState (typed-state API) running totals held to the
# batch GROUP BY oracle — the 4th execution strategy for the same
# semantics (batch agg / session_window / applyInPandasWithState /
# transformWithStateInPandas), one value hash.  The API's Python
# state server requires protobuf at RUNTIME (the import itself is
# pure Python and always succeeds, so probe the dependency, not the
# class); this container has no protobuf, so the query registers only
# where it can actually run — same environment-gate discipline as
# delta-spark (operators/merge.py) and media codecs (multimodal.py).
import importlib.util as _ilu  # noqa: E402


def _has_protobuf() -> bool:
    try:  # find_spec raises if the parent package is absent entirely
        return _ilu.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


if _has_protobuf():  # pragma: no cover
    from data_pipeline_for_e_commerce_shop_spark.streaming.stateful import (  # noqa: E402
        stateful_user_totals,
    )

    register(
        "events_stateful_totals",
        """
        SELECT user_id,
               COUNT(*) AS n_events,
               SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM events
        GROUP BY 1
        """,
    )(stateful_user_totals)


# TPC-H Q10 shape: customers ranked by revenue lost to returns in a
# quarter — the returns-triage report.
RETURNS_QTR_START = "1997-01-01 00:00:00"
RETURNS_QTR_END = "1997-04-01 00:00:00"

@register(
    "returned_item_customers",
    f"""
    SELECT c_custkey, c_name, n_name AS nation,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT))/100.0 AS lost_revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{RETURNS_QTR_START}'
      AND o_orderdate <  TIMESTAMP '{RETURNS_QTR_END}'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on returned items
    in one quarter.  Both filters push to their scans (date on orders,
    returnflag on lineitem), customer and nation broadcast, the one
    fact shuffle is lineitem⋈orders, and the fully-tiebroken top-20
    is TakeOrderedAndProject."""
    start = F.lit(RETURNS_QTR_START).cast("timestamp")
    end = F.lit(RETURNS_QTR_END).cast("timestamp")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= start) & (F.col("o_orderdate") < end))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("c_custkey", "c_name", "nation")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("lost_revenue")
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


# Custom Python STREAMING source: 5 availableNow drains through one
# checkpoint (offset-resume exactly-once), aggregated and held to the
# generate_series oracle over exactly drains*batch deterministic rows.
register(
    "stream_source_kpis",
    f"""
    WITH g AS (
      SELECT i AS row_id,
             'cat' || (CAST(('0x' || substr(md5('gen-' || i), 1, 8))
                       AS BIGINT) % {_gen.GEN_CATEGORIES}) AS category,
             CAST(('0x' || substr(md5('gen-' || i), 9, 8)) AS BIGINT)
               % {_gen.GEN_CENTS_MOD} AS value_cents
      FROM generate_series(0, {_gen.STREAM_DRAINS * _gen.STREAM_BATCH - 1})
        AS t(i)
    )
    SELECT category,
           COUNT(*) AS n_rows,
           CAST(SUM(value_cents) AS BIGINT) AS total_cents,
           CAST(MIN(row_id) AS BIGINT) AS first_row,
           CAST(MAX(row_id) AS BIGINT) AS last_row
    FROM g GROUP BY 1 ORDER BY 1
    """,
)(_gen.stream_generator_kpis)


# First-touch / last-touch purchase attribution over gap sessions —
# both models from one windowed pass, unpivoted with stack().
register(
    "events_attribution",
    f"""
    WITH marked AS (
      SELECT user_id, event_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                         (PARTITION BY user_id
                          ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
                       > {events.DEBOUNCE_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (
               PARTITION BY user_id
               ORDER BY epoch_sec, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    ),
    touched AS (
      SELECT event_type, cents,
             FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id, session_no
               ORDER BY epoch_sec, event_id
               ROWS UNBOUNDED PRECEDING) AS first_touch,
             COALESCE(LAG(event_type) OVER (
               PARTITION BY user_id, session_no
               ORDER BY epoch_sec, event_id), 'direct') AS last_touch
      FROM numbered
    ),
    purchases AS (SELECT * FROM touched WHERE event_type = 'purchase'),
    stacked AS (
      SELECT 'first_touch' AS model, first_touch AS channel, cents
      FROM purchases
      UNION ALL
      SELECT 'last_touch', last_touch, cents FROM purchases
    )
    SELECT model, channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS attributed_value
    FROM stacked GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)(events.session_attribution)


# Surgical backfill: late arrivals -> affected-hour detection ->
# partial recompute; oracle = aggregate everything (the backfill law).
register(
    "events_backfill_hourly",
    """
    SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT)
             AS hour_epoch,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)(events.backfill_hourly)


# Matryoshka dimension-ablation recall: prefix-truncated retrieval at
# several widths vs the full-width exact top-k.  Width list and k
# interpolate from the operator module.
register(
    "ann_matryoshka_recall",
    f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    pairs AS (
      SELECT q.query_id, e.vec_id AS corpus_id, d.dim,
             round(list_dot_product(qv[1:d.dim], v[1:d.dim]) /
                   (sqrt(list_dot_product(qv[1:d.dim], qv[1:d.dim]))
                    * sqrt(list_dot_product(v[1:d.dim], v[1:d.dim]))), 9)
               AS cosine
      FROM e CROSS JOIN q
      CROSS JOIN (SELECT unnest({list(similarity.MRL_DIMS)}) AS dim) d
      WHERE q.query_id != e.vec_id
    ),
    topk AS (
      SELECT query_id, dim, corpus_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id, dim
                    ORDER BY cosine DESC, corpus_id ASC) AS rank
        FROM pairs
      ) WHERE rank <= {similarity.MRL_K}
    ),
    fulltk AS (
      SELECT query_id, corpus_id AS true_id FROM topk
      WHERE dim = {similarity.MRL_DIMS[0]}
    ),
    hits AS (
      SELECT t.query_id, t.dim, COUNT(*) AS n_hits
      FROM topk t JOIN fulltk f
        ON t.query_id = f.query_id AND t.corpus_id = f.true_id
      GROUP BY 1, 2
    ),
    grid AS (SELECT DISTINCT query_id, dim FROM topk)
    SELECT g.query_id, g.dim,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) / CAST({similarity.MRL_K} AS DOUBLE)
             AS recall
    FROM grid g
    LEFT JOIN hits h ON g.query_id = h.query_id AND g.dim = h.dim
    ORDER BY 1, 2
    """,
)(similarity.matryoshka_recall)


# Token-budget data selection: whole score buckets that fit, boundary
# bucket filled by doc_id order.  Budget interpolates from the module.
register(
    "corpus_budget_selection",
    f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) * 1000000
               // len(string_split(text, ' ')) AS score_ppm
      FROM documents
    ),
    per_score AS (
      SELECT score_ppm, CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
      FROM scored GROUP BY 1
    ),
    buckets AS (
      SELECT score_ppm, bucket_tokens,
             CAST(COALESCE(CAST(SUM(bucket_tokens) OVER (
                     ORDER BY score_ppm DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS BIGINT), 0) AS BIGINT) AS cum_before
      FROM per_score
    ),
    fitting AS (SELECT * FROM buckets WHERE cum_before < {_corpus.TOKEN_BUDGET}),
    kept_full AS (
      SELECT s.score_ppm, s.doc_id, s.n_tokens, 'full' AS decision
      FROM scored s
      JOIN fitting f ON s.score_ppm = f.score_ppm
      WHERE f.cum_before + f.bucket_tokens <= {_corpus.TOKEN_BUDGET}
    ),
    kept_boundary AS (
      SELECT score_ppm, doc_id, n_tokens, 'boundary' AS decision FROM (
        SELECT s.score_ppm, s.doc_id, s.n_tokens,
               CAST(SUM(s.n_tokens) OVER (
                 PARTITION BY s.score_ppm ORDER BY s.doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run,
               {_corpus.TOKEN_BUDGET} - f.cum_before AS remaining
        FROM scored s
        JOIN fitting f ON s.score_ppm = f.score_ppm
        WHERE f.cum_before + f.bucket_tokens > {_corpus.TOKEN_BUDGET}
      ) WHERE run <= remaining
    )
    SELECT * FROM kept_full
    UNION ALL
    SELECT * FROM kept_boundary
    ORDER BY score_ppm DESC, doc_id
    """,
)(_corpus.budget_selection)


# Interpolated bigram-LM cross-entropy gate; lambda and the keep
# threshold interpolate from the operator module.
register(
    "text_bigram_ce",
    f"""
    WITH tok AS (
      SELECT doc_id, i AS pos, t[i] AS cur,
             CASE WHEN i > 1 THEN t[i-1] END AS prev
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS g(i)
    ),
    uni AS (SELECT cur, COUNT(*) AS cu FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS total FROM uni),
    bi AS (
      SELECT prev, cur, COUNT(*) AS cb FROM tok
      WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    ctx AS (SELECT prev, CAST(SUM(cb) AS BIGINT) AS cp FROM bi GROUP BY 1),
    scored AS (
      SELECT t.doc_id, t.pos,
             CASE WHEN t.prev IS NULL
                  THEN ln(CAST(u.cu AS DOUBLE) / tot.total)
                  ELSE ln({text.BIGRAM_LAMBDA_PCT / 100.0}
                          * (CAST(b.cb AS DOUBLE) / c.cp)
                          + {1.0 - text.BIGRAM_LAMBDA_PCT / 100.0}
                          * (CAST(u.cu AS DOUBLE) / tot.total))
             END AS lnp
      FROM tok t
      JOIN uni u ON t.cur = u.cur
      CROSS JOIN tot
      LEFT JOIN bi b ON t.prev = b.prev AND t.cur = b.cur
      LEFT JOIN ctx c ON t.prev = c.prev
    ),
    folded AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             list(lnp ORDER BY pos) AS ls
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round((-list_reduce(ls, (a, b) -> a + b)) / n_tokens, 9)
             AS ce_nats,
           round((-list_reduce(ls, (a, b) -> a + b)) / n_tokens, 9)
             <= {text.BIGRAM_CE_MAX} AS keep
    FROM folded
    """,
)(text.bigram_cross_entropy)


# The corpus decision table: every gate joined into one per-doc
# verdict.  The oracle COMPOSES the registered per-gate oracles as
# CTEs (the ann_recall device) so the gates cannot drift from their
# composition.
register(
    "corpus_gate_verdicts",
    f"""
    WITH qg AS ({ORACLES["text_quality_gate"]}),
    uce AS ({ORACLES["text_unigram_ce"]}),
    bce AS ({ORACLES["text_bigram_ce"]}),
    dup AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(text)) != doc_id AS is_dup
      FROM documents
    )
    SELECT qg.doc_id,
           (reasons = '') AS keep,
           reasons
    FROM (
      SELECT qg.doc_id,
             concat_ws(',',
               CASE WHEN qg.reasons != '' THEN qg.reasons END,
               CASE WHEN dup.is_dup THEN 'duplicate' END,
               CASE WHEN NOT uce.keep THEN 'high_ce' END,
               CASE WHEN NOT bce.keep THEN 'high_bigram_ce' END
             ) AS reasons
      FROM qg
      JOIN dup ON qg.doc_id = dup.doc_id
      JOIN uce ON qg.doc_id = uce.doc_id
      JOIN bce ON qg.doc_id = bce.doc_id
    ) qg
    ORDER BY doc_id
    """,
)(_corpus.gate_verdicts)


# LSH (bands x rows) tuning table over a similarity grid; signature
# length interpolates from the dedup module.
register(
    "dedup_lsh_tuning_curve",
    f"""
    WITH cfg AS (
      SELECT b AS bands, {dedup.LSH_TUNE_SIG} // b AS rows_per_band
      FROM (SELECT unnest([1, 2, 4, 8]) AS b)
      WHERE b * ({dedup.LSH_TUNE_SIG} // b) = {dedup.LSH_TUNE_SIG}
    ),
    grid AS (
      SELECT bands, rows_per_band, s / 10.0 AS s
      FROM cfg, UNNEST(generate_series(1, 9)) AS g(s)
    )
    SELECT CAST(bands AS INTEGER) AS bands,
           CAST(rows_per_band AS INTEGER) AS rows_per_band,
           s,
           round(1 - pow(1 - pow(s, rows_per_band), bands), 9)
             AS p_candidate,
           round(pow(1 - pow(0.5, 1.0 / bands), 1.0 / rows_per_band), 9)
             AS s50
    FROM grid ORDER BY bands, s
    """,
)(dedup.lsh_tuning_curve)


from data_pipeline_for_e_commerce_shop_spark.quality import privacy as _privacy  # noqa: E402

# Keyed pseudonymization + referential-integrity audit: joins via
# md5(secret||key) must reproduce joins via raw keys exactly, and the
# pseudonym space must be collision-free.  Secret interpolates from
# the module so operator and oracle share one key label.
register(
    "customer_pseudonymize_audit",
    f"""
    WITH pc AS (
      SELECT md5('{_privacy.PSEUDO_SECRET}' || CAST(c_custkey AS VARCHAR))
               AS p_key, c_mktsegment
      FROM customer
    ),
    po AS (
      SELECT md5('{_privacy.PSEUDO_SECRET}' || CAST(o_custkey AS VARCHAR))
               AS p_key
      FROM orders
    ),
    via_pseudo AS (
      SELECT c_mktsegment, COUNT(*) AS n_orders_pseudo
      FROM po JOIN pc USING (p_key) GROUP BY 1
    ),
    via_raw AS (
      SELECT c_mktsegment, COUNT(*) AS n_orders_raw
      FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1
    ),
    ks AS (
      SELECT COUNT(DISTINCT c_custkey) AS n_keys,
             COUNT(DISTINCT md5('{_privacy.PSEUDO_SECRET}'
                    || CAST(c_custkey AS VARCHAR))) AS n_pseudonyms
      FROM customer
    )
    SELECT c_mktsegment, n_orders_raw, n_orders_pseudo,
           n_orders_raw = n_orders_pseudo AS ri_preserved,
           n_keys = n_pseudonyms AS collision_free
    FROM via_raw JOIN via_pseudo USING (c_mktsegment)
    CROSS JOIN ks
    ORDER BY c_mktsegment
    """,
)(_privacy.pseudonymize_audit)


from data_pipeline_for_e_commerce_shop_spark.operators import asof as _asof  # noqa: E402

# As-of with tolerance: stale matches degrade to the no-match
# sentinel.  Tolerance interpolates from the operator module.
register(
    "asof_purchase_click_tolerance",
    f"""
    SELECT a.event_id,
           a.user_id,
           CAST(floor(epoch(a.ts)) AS BIGINT) AS purchase_epoch,
           FLOOR(a.value * 100) / 100.0 AS value,
           CASE WHEN b.event_id IS NOT NULL
                 AND CAST(floor(epoch(a.ts)) AS BIGINT)
                     - CAST(floor(epoch(b.ts)) AS BIGINT)
                     <= {_asof.ASOF_TOLERANCE_SECONDS}
                THEN b.event_id ELSE -1 END AS click_event_id,
           CASE WHEN b.event_id IS NOT NULL
                 AND CAST(floor(epoch(a.ts)) AS BIGINT)
                     - CAST(floor(epoch(b.ts)) AS BIGINT)
                     <= {_asof.ASOF_TOLERANCE_SECONDS}
                THEN CAST(floor(epoch(a.ts)) AS BIGINT)
                     - CAST(floor(epoch(b.ts)) AS BIGINT)
                ELSE -1 END AS lag_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)(_asof.purchases_last_click_tolerance)


# Dedup-aware split: split assignment hashes the near-dup CLUSTER id
# so clusters can never straddle splits; singletons cluster as
# themselves.  Oracle composes the shared closure CTEs.
register(
    "corpus_dedup_aware_split",
    _CLOSURE_CTES
    + f"""
    , clus AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN CAST(('0x' || substr(md5('clsplit-'
                      || CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 100 < {_corpus.TRAIN_PCT} THEN 'train'
                WHEN CAST(('0x' || substr(md5('clsplit-'
                      || CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 100 < {_corpus.VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM labeled ORDER BY doc_id
    """,
)(_corpus.dedup_aware_split)


# Equi-DEPTH price histogram — the statistic optimizers actually keep
# (equal row counts per bucket, data-driven boundaries), next to the
# equi-width one (part_price_histogram).  Boundaries are
# percentile_disc values (actual data points, cast to exact integer
# cents on both engines); bucket membership counts boundaries below.
EQUIDEPTH_BUCKETS = 8

@register(
    "lineitem_price_equidepth",
    f"""
    WITH pre AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    b AS (
      SELECT {", ".join(
          f"CAST(percentile_disc({i / 8}) WITHIN GROUP (ORDER BY cents)"
          f" AS BIGINT) AS b{i}" for i in range(1, 8)
      )}
      FROM pre
    )
    SELECT bucket, COUNT(*) AS n_rows,
           MIN(cents) / 100.0 AS min_price,
           MAX(cents) / 100.0 AS max_price
    FROM (
      SELECT cents,
             {" + ".join(f"CASE WHEN cents > b{i} THEN 1 ELSE 0 END"
                          for i in range(1, 8))} AS bucket
      FROM pre CROSS JOIN b
    )
    GROUP BY bucket ORDER BY bucket
    """,
)
def lineitem_price_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of discounted-free line prices: 8 buckets
    with data-driven percentile_disc boundaries (exact integer cents,
    so both engines pick identical boundary values) and per-bucket
    counts + ranges.  One aggregate for the 1-row boundary set
    (broadcast back), one scan-side bucket assignment, one groupBy —
    the ANALYZE-histogram shape."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    # Boundaries WITHOUT percentile_disc: each percentile_disc
    # expression is its own full sort pass (7 of them benched 13 s at
    # sf0.1).  percentile_disc(p) == smallest value whose cumulative
    # count reaches ceil(p*n), so build the value histogram (bounded
    # by the price-ladder cardinality, ~10k rows), one cumulative
    # window over it, and read all 7 boundaries with integer
    # comparisons (cum*8 >= i*n) in a single tiny aggregate — exact
    # percentile_disc semantics, one fact shuffle, zero doubles.
    from pyspark.sql import Window as _W

    hist = li.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    w_cum = _W.orderBy("cents").rowsBetween(_W.unboundedPreceding, 0)
    cum = hist.select(
        "cents",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(
            _W.rowsBetween(_W.unboundedPreceding, _W.unboundedFollowing)
        ).alias("n"),
    )
    bounds = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * 8 >= F.lit(i) * F.col("n"),
                    F.col("cents"),
                )
            ).alias(f"b{i}")
            for i in range(1, 8)
        ]
    )
    bucket = sum(
        F.when(F.col("cents") > F.col(f"b{i}"), 1).otherwise(0)
        for i in range(1, 8)
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select("cents", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.min("cents") / 100.0).alias("min_price"),
            (F.max("cents") / 100.0).alias("max_price"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------- skyline / TWAP

# 2-D Pareto frontier (skyline): the parts no other part beats on BOTH
# price (lower is better) and size (higher is better).  The naive plan
# is an all-pairs NOT EXISTS (the oracle below — fine for DuckDB at
# sf0.01, a non-starter at 100 TB).  The Spark plan is the two-level
# bucket-prune shape: bucket prices into SKYLINE_BUCKETS ranges from a
# 1-row broadcast bounds aggregate, fold the bucket-level max sizes
# into a broadcastable prefix-max table (anything in a strictly lower
# bucket has strictly lower price), and resolve the remaining
# within-bucket dominance with a bucket-partitioned window — every
# stage is either vocabulary-sized or partitioned by bucket, no
# global-order window, no pair join.
SKYLINE_BUCKETS = 64


@register(
    "part_skyline",
    """
    WITH p AS (
      SELECT p_partkey, p_name,
             CAST(floor(p_retailprice * 100) AS BIGINT) AS cents,
             p_size
      FROM part
    )
    SELECT a.p_partkey, a.p_name,
           a.cents / 100.0 AS price, a.p_size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.cents <= a.cents AND b.p_size >= a.p_size
        AND (b.cents < a.cents OR b.p_size > a.p_size)
    )
    ORDER BY a.p_partkey
    """,
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts: minimize price, maximize size.  Dominance
    is resolved in three strictly-cheaper tiers — (1) bucket-level: a
    64-row prefix-max-size table over price buckets (broadcast) kills
    rows beaten from any strictly lower bucket; (2) within-bucket
    strictly-cheaper rows via a RANGE window ending 1 cent before the
    current price; (3) same-price rows via a (bucket, cents) max.  All
    integer cents — no double comparisons at the frontier boundary."""
    from pyspark.sql import Window

    p = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_name",
            F.floor(F.col("p_retailprice") * 100).cast("long").alias("cents"),
            "p_size",
        )
        .localCheckpoint(eager=False)  # feeds bounds, bucket aggs, probe
    )
    bounds = p.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    n_b = F.lit(SKYLINE_BUCKETS)
    bucket_of = ((F.col("cents") - F.col("lo")) * n_b / (
        F.col("hi") - F.col("lo") + 1
    )).cast("long")
    bucketed = p.crossJoin(F.broadcast(bounds)).select(
        "p_partkey", "p_name", "cents", "p_size",
        bucket_of.alias("bucket"),
    )
    # bucket-level max sizes -> prefix max over STRICTLY lower buckets
    # (SKYLINE_BUCKETS rows: the window below is driver-trivial and the
    # result broadcasts)
    per_bucket = bucketed.groupBy("bucket").agg(
        F.max("p_size").alias("bucket_max")
    )
    w_prefix = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = per_bucket.select(
        "bucket", F.max("bucket_max").over(w_prefix).alias("lower_max")
    )
    w_cheaper = (
        Window.partitionBy("bucket")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("bucket", "cents")
    flagged = (
        bucketed.join(F.broadcast(prefix), "bucket")
        .withColumn("cheaper_max", F.max("p_size").over(w_cheaper))
        .withColumn("same_max", F.max("p_size").over(w_same))
    )
    dominated = (
        (F.col("lower_max") >= F.col("p_size"))
        | (F.col("cheaper_max") >= F.col("p_size"))
        | (F.col("same_max") > F.col("p_size"))
    )
    return (
        flagged.where(~F.coalesce(dominated, F.lit(False)))
        .select(
            "p_partkey",
            "p_name",
            (F.col("cents") / 100.0).alias("price"),
            "p_size",
        )
        .orderBy("p_partkey")
    )


# Time-weighted average (TWAP): each observation's value holds until
# the next observation of the same type within the day; the last one
# holds to end-of-day.  The finance aggregation where a plain AVG is
# simply wrong (irregular sampling).  No carry-in across midnight —
# each day is scored from its own first observation (documented
# contract; carry-in would serialize days through a per-type global
# window).
@register(
    "events_twap",
    """
    WITH obs AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             COALESCE(
               LEAD(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                 PARTITION BY event_type, CAST(ts AS DATE)
                 ORDER BY ts, event_id),
               CAST(floor(epoch(CAST(ts AS DATE) + INTERVAL 1 DAY))
                    AS BIGINT)
             ) AS nxt
      FROM events
    )
    SELECT event_type, day,
           COUNT(*) AS n_obs,
           CAST(SUM(nxt - sec) AS BIGINT) AS span_seconds,
           CAST(SUM(cents * (nxt - sec)) AS BIGINT)
             / CAST(SUM(nxt - sec) AS BIGINT) / 100.0 AS twap
    FROM obs
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day) time-weighted average of `value`: weight =
    seconds the observation was in force (LEAD within the day, the last
    row runs to midnight).  Integer cents x integer seconds keeps the
    weighted sum exact int64 (max cents 49k x 86400 s ~ 4e9 per row);
    one partitioned window + one groupBy on the same keys — AQE
    coalesces them onto a single shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.col("event_id").alias("event_id"),
        F.col("ts").alias("ts"),
        F.unix_timestamp("ts").alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    midnight = F.unix_timestamp(
        F.date_add(F.col("day"), 1).cast("timestamp")
    )
    obs = ev.withColumn(
        "nxt", F.coalesce(F.lead("sec").over(w), midnight)
    )
    return (
        obs.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col("nxt") - F.col("sec")).alias("span_seconds"),
            (
                F.sum(F.col("cents") * (F.col("nxt") - F.col("sec")))
                / F.sum(F.col("nxt") - F.col("sec"))
                / 100.0
            ).alias("twap"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------- KMV / theta-sketch overlap

# K-minimum-values ("theta") sketches: keep the K smallest 60-bit
# hashes per audience; distinct ~ (K-1)/theta and — the operation HLL
# fundamentally cannot do well — INTERSECTION estimates via the joint
# sample below min(theta_a, theta_b).  Deterministic md5 hashing makes
# the whole sketch replayable in SQL, so unlike a library sketch it is
# oracle-checkable bit-for-bit; the exact intersection rides along as
# the audit (estimates are never silently trusted).  Sketch state is
# K rows/audience — trivially broadcastable at any corpus size — and
# building it is one groupBy-free window over the deduped audience.
KMV_K = 256
_KMV_SPACE = float(1 << 60)  # hash space; a power of two, exact in double


@register(
    "kmv_theta_overlap",
    f"""
    WITH dist AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
      SELECT event_type,
             CAST(('0x' || substr(md5('kmv-' || CAST(user_id AS VARCHAR)),
                   1, 15)) AS BIGINT) AS h
      FROM dist
    ),
    sk AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM hashed
      QUALIFY rk <= {KMV_K}
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_sk,
             CASE WHEN COUNT(*) < {KMV_K}
                  THEN CAST({1 << 60} AS BIGINT)
                  ELSE MAX(h) END AS theta
      FROM sk GROUP BY event_type
    ),
    est AS (
      SELECT event_type, n_sk, theta,
             CASE WHEN n_sk < {KMV_K} THEN CAST(n_sk AS DOUBLE)
                  ELSE ({KMV_K} - 1) / (theta / {_KMV_SPACE}) END AS est_distinct
      FROM stats
    ),
    joint AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_joint
      FROM sk a
      JOIN sk b ON a.h = b.h AND a.event_type < b.event_type
      JOIN stats sa ON sa.event_type = a.event_type
      JOIN stats sb ON sb.event_type = b.event_type
      WHERE a.h < LEAST(sa.theta, sb.theta)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS exact_overlap
      FROM dist a JOIN dist b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT e.type_a, e.type_b,
           ea.est_distinct AS est_a,
           eb.est_distinct AS est_b,
           COALESCE(j.n_joint, 0) AS n_joint,
           COALESCE(j.n_joint, 0)
             / (LEAST(ea.theta, eb.theta) / {_KMV_SPACE}) AS est_overlap,
           e.exact_overlap
    FROM exact e
    LEFT JOIN joint j ON j.type_a = e.type_a AND j.type_b = e.type_b
    JOIN est ea ON ea.event_type = e.type_a
    JOIN est eb ON eb.event_type = e.type_b
    ORDER BY e.type_a, e.type_b
    """,
)
def kmv_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap estimates from KMV/theta sketches,
    graded against the exact intersection.  One distinct pass builds
    all five audience sketches (256 rows each); pair estimates come
    from sketch-x-sketch equi-joins on the hash — at 100 TB the raw
    table is touched twice (sketch build + exact audit), never
    pairwise.  Division order (n/(theta/2^60)) is identical on both
    engines, so even the double estimates hash-match."""
    from pyspark.sql import Window

    dist = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)  # feeds sketch AND exact audit
    )
    hashed = dist.select(
        "event_type",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv-"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hashed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KMV_K)
        .localCheckpoint(eager=False)  # feeds stats AND the pair join
    )
    stats = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.when(F.count(F.lit(1)) < KMV_K, F.lit(1 << 60))
        .otherwise(F.max("h"))
        .alias("theta"),
    )
    est = stats.select(
        "event_type",
        "theta",
        F.when(
            F.col("n_sk") < KMV_K, F.col("n_sk").cast("double")
        )
        .otherwise(
            F.lit(KMV_K - 1) / (F.col("theta") / F.lit(_KMV_SPACE))
        )
        .alias("est_distinct"),
    )
    sa = est.select(
        F.col("event_type").alias("type_a"),
        F.col("theta").alias("theta_a"),
        F.col("est_distinct").alias("est_a"),
    )
    sb = est.select(
        F.col("event_type").alias("type_b"),
        F.col("theta").alias("theta_b"),
        F.col("est_distinct").alias("est_b"),
    )
    joint = (
        sk.alias("a")
        .join(sk.alias("b"), F.col("a.h") == F.col("b.h"))
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .join(
            F.broadcast(sa),
            F.col("a.event_type") == F.col("type_a"),
        )
        .join(
            F.broadcast(sb),
            F.col("b.event_type") == F.col("type_b"),
        )
        .where(F.col("a.h") < F.least("theta_a", "theta_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_joint"))
    )
    exact = (
        dist.alias("x")
        .join(
            dist.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        exact.join(joint, ["type_a", "type_b"], "left")
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            F.coalesce("n_joint", F.lit(0)).alias("n_joint"),
            (
                F.coalesce("n_joint", F.lit(0))
                / (F.least("theta_a", "theta_b") / F.lit(_KMV_SPACE))
            ).alias("est_overlap"),
            "exact_overlap",
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------- revenue recognition proration

# Revenue recognition: each line's revenue is spread over the calendar
# months its order->ship interval touches, weighted by overlap days,
# with Hamilton largest-remainder top-ups so each line's allocations
# sum to its cents EXACTLY (the invariant auditors check; floor-only
# proration leaks cents, doubles leak more).  Synthetic dates can put
# shipment before order, so the interval is [least, greatest].  The
# explode is bounded by the interval span in months (<= ~81 here) and
# every window is keyed by the line id — no global state anywhere.
@register(
    "revenue_recognition",
    """
    WITH raw AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             LEAST(CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS d0,
             GREATEST(CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS d1
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    li AS (
      -- (l_orderkey, l_linenumber) is NOT unique in the synthetic
      -- data; collapse to unique allocation units or the per-unit
      -- Hamilton window merges unrelated lines and leaks cents
      SELECT l_orderkey, l_linenumber, d0, d1,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM raw GROUP BY 1, 2, 3, 4
    ),
    exploded AS (
      SELECT l_orderkey, l_linenumber, cents, d0, d1,
             CAST(unnest(generate_series(
               DATE_TRUNC('month', d0), DATE_TRUNC('month', d1),
               INTERVAL 1 MONTH)) AS DATE) AS month
      FROM li
    ),
    weighted AS (
      SELECT l_orderkey, l_linenumber, d0, d1, cents, month,
             date_diff('day', GREATEST(month, d0),
                       LEAST(last_day(month), d1)) + 1 AS days,
             date_diff('day', d0, d1) + 1 AS total_days
      FROM exploded
    ),
    based AS (
      SELECT l_orderkey, l_linenumber, d0, d1, cents, month,
             cents * days // total_days AS base,
             (cents * days) % total_days AS rem
      FROM weighted
    ),
    ranked AS (
      SELECT *,
             cents - SUM(base) OVER (
               PARTITION BY l_orderkey, l_linenumber, d0, d1) AS leftover,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey, l_linenumber, d0, d1
               ORDER BY rem DESC, month) AS rk
      FROM based
    )
    SELECT month,
           SUM(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) / 100.0
             AS recognized_revenue,
           COUNT(DISTINCT (l_orderkey, l_linenumber, d0, d1)) AS n_units
    FROM ranked
    GROUP BY month
    ORDER BY month
    """,
)
def revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly recognized revenue: per-line day-weighted proration over
    the order->ship interval with largest-remainder cent allocation
    (per-line sums are exact by construction, so the monthly rollup is
    too).  Plan: one fact x broadcast-orders join, a bounded month
    explode, two line-keyed windows, one monthly groupBy."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_shipdate").cast("date").alias("sd"),
        )
        .join(orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .select(
            "l_orderkey",
            "l_linenumber",
            "cents",
            F.least("od", "sd").alias("d0"),
            F.greatest("od", "sd").alias("d1"),
        )
        # (orderkey, linenumber) is NOT unique in the synthetic data:
        # collapse to unique allocation units so the Hamilton window
        # never merges unrelated lines (cents would leak)
        .groupBy("l_orderkey", "l_linenumber", "d0", "d1")
        .agg(F.sum("cents").alias("cents"))
    )
    exploded = li.select(
        "l_orderkey",
        "l_linenumber",
        "d0",
        "d1",
        "cents",
        F.explode(
            F.sequence(
                F.trunc("d0", "MM"),
                F.trunc("d1", "MM"),
                F.expr("interval 1 month"),
            )
        ).alias("month"),
    )
    weighted = exploded.select(
        "l_orderkey",
        "l_linenumber",
        "d0",
        "d1",
        "cents",
        "month",
        (
            F.datediff(F.least(F.last_day("month"), F.col("d1")),
                       F.greatest(F.col("month"), F.col("d0"))) + 1
        ).alias("days"),
        (F.datediff("d1", "d0") + 1).alias("total_days"),
    )
    based = weighted.select(
        "l_orderkey",
        "l_linenumber",
        "d0",
        "d1",
        "cents",
        "month",
        F.expr("cents * days div total_days").alias("base"),
        ((F.col("cents") * F.col("days")) % F.col("total_days")).alias("rem"),
    )
    w_line = Window.partitionBy("l_orderkey", "l_linenumber", "d0", "d1")
    w_rank = w_line.orderBy(F.col("rem").desc(), "month")
    ranked = based.select(
        "l_orderkey",
        "l_linenumber",
        "d0",
        "d1",
        "month",
        "base",
        (F.col("cents") - F.sum("base").over(w_line)).alias("leftover"),
        F.row_number().over(w_rank).alias("rk"),
    )
    return (
        ranked.groupBy("month")
        .agg(
            (
                F.sum(
                    F.col("base")
                    + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
                )
                / 100.0
            ).alias("recognized_revenue"),
            F.countDistinct("l_orderkey", "l_linenumber", "d0", "d1").alias(
                "n_units"
            ),
        )
        .orderBy("month")
    )


# --------------------------------------- correlation matrix / OOV

# Pearson correlation matrix over lineitem's numeric columns from ONE
# scan: every pairwise r needs only (n, Sx, Sy, Sxx, Syy, Sxy), all
# exact int64 sums over integer-scaled values (whole dollars, pct
# points — cents would push Sxx past 2^53 at sf1+).  The 15 partial
# sums map-side combine, so the scan's shuffle is ONE row; the final
# r values are fixed-order double arithmetic from identical integer
# inputs on both engines.  Magnitude bound: |Sxx| <= n * 1e10, exact
# in double through sf~1; beyond that switch the dollar scale down.
@register(
    "lineitem_corr_matrix",
    """
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(floor(l_extendedprice) AS BIGINT) AS p,
             CAST(floor(l_discount * 100) AS BIGINT) AS d,
             CAST(floor(l_tax * 100) AS BIGINT) AS t
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
             CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(q*q) AS BIGINT) AS sqq, CAST(SUM(p*p) AS BIGINT) AS spp,
             CAST(SUM(d*d) AS BIGINT) AS sdd, CAST(SUM(t*t) AS BIGINT) AS stt,
             CAST(SUM(q*p) AS BIGINT) AS sqp, CAST(SUM(q*d) AS BIGINT) AS sqd,
             CAST(SUM(q*t) AS BIGINT) AS sqt, CAST(SUM(p*d) AS BIGINT) AS spd,
             CAST(SUM(p*t) AS BIGINT) AS spt, CAST(SUM(d*t) AS BIGINT) AS sdt
      FROM v
    )
    SELECT col_a, col_b, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS corr
    FROM (
      SELECT n, 'quantity' AS col_a, 'price' AS col_b,
             sq AS sx, sp AS sy, sqq AS sxx, spp AS syy, sqp AS sxy FROM s
      UNION ALL SELECT n, 'quantity', 'discount', sq, sd, sqq, sdd, sqd FROM s
      UNION ALL SELECT n, 'quantity', 'tax', sq, st, sqq, stt, sqt FROM s
      UNION ALL SELECT n, 'price', 'discount', sp, sd, spp, sdd, spd FROM s
      UNION ALL SELECT n, 'price', 'tax', sp, st, spp, stt, spt FROM s
      UNION ALL SELECT n, 'discount', 'tax', sd, st, sdd, stt, sdt FROM s
    )
    ORDER BY col_a, col_b
    """,
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-shape correlation matrix (quantity, whole-dollar price,
    discount pct, tax pct): 15 exact integer sufficient statistics in
    one scan, then six fixed-order double evaluations on the 1-row
    result — the optimizer/feature-audit statistic pack."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor("l_extendedprice").cast("long").alias("p"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("d"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    cols = {"quantity": "q", "price": "p", "discount": "d", "tax": "t"}
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in cols.values():
        aggs.append(F.sum(F.col(a)).alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).alias(f"s_{a}{a}"))
    names = list(cols)
    pairs = [
        (names[i], names[j])
        for i in range(len(names))
        for j in range(i + 1, len(names))
    ]
    for ca, cb in pairs:
        a, b = cols[ca], cols[cb]
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"s_{a}{b}"))
    s = li.agg(*aggs)
    stacked = s.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ca).alias("col_a"),
                        F.lit(cb).alias("col_b"),
                        F.col("n").alias("n"),
                        F.col(f"s_{cols[ca]}").alias("sx"),
                        F.col(f"s_{cols[cb]}").alias("sy"),
                        F.col(f"s_{cols[ca]}{cols[ca]}").alias("sxx"),
                        F.col(f"s_{cols[cb]}{cols[cb]}").alias("syy"),
                        F.col(f"s_{cols[ca]}{cols[cb]}").alias("sxy"),
                    )
                    for ca, cb in pairs
                ]
            )
        ).alias("r")
    ).select("r.*")
    nd = F.col("n").cast("double")
    corr = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        F.sqrt(
            (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
        )
    )
    return stacked.select(
        "col_a", "col_b", "n", corr.alias("corr")
    ).orderBy("col_a", "col_b")


# Out-of-vocabulary rate: the token-level generalization gauge — build
# the vocabulary from the even-doc_id half, score the odd half's
# tokens against it.  Token-level (volume-weighted) and type-level
# (unique) rates both ride; the miss check is a broadcastable-or-
# shuffled anti-join on the token, never a collected set.
@register(
    "text_oov_rate",
    """
    WITH vocab AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 2 = 0
    ),
    test_toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(CASE WHEN v.tok IS NULL THEN 1 END) AS n_oov,
           COUNT(CASE WHEN v.tok IS NULL THEN 1 END) * 1000000
             // COUNT(*) AS oov_ppm,
           COUNT(DISTINCT t.tok) AS n_types,
           COUNT(DISTINCT CASE WHEN v.tok IS NULL THEN t.tok END)
             AS n_oov_types
    FROM test_toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language OOV rate of the odd-doc half against the even-doc
    vocabulary: explode once per side, distinct the vocab, LEFT join on
    the token and count misses (token- and type-level).  The join keys
    are tokens — high-cardinality, uniformly hashable, no skew pole."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.where(F.col("doc_id") % 2 == 0)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .withColumn("in_vocab", F.lit(1))
    )
    test = docs.where(F.col("doc_id") % 2 == 1).select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    joined = test.join(vocab, "tok", "left")
    miss = F.col("in_vocab").isNull()
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(miss, 1)).alias("n_oov"),
            F.expr(
                "count(CASE WHEN in_vocab IS NULL THEN 1 END)"
                " * 1000000 div count(1)"
            ).alias("oov_ppm"),
            F.countDistinct("tok").alias("n_types"),
            F.countDistinct(F.when(miss, F.col("tok"))).alias("n_oov_types"),
        )
        .orderBy("lang")
    )


# --------------------------------- linear gap interpolation / lift

# Two-sided LINEAR interpolation over the hourly value series — the
# imputation complement of gap_fill_hourly's forward-fill (counts).
# Gap math is pure integers: interp = prev + floor((next-prev)*(h-ph)
# / (nh-ph)); the inner product stays far under 2^53 so the floored
# double division is exactly floor division on both engines (and,
# unlike `div` vs `//`, has ONE rounding rule for negative deltas).
@register(
    "events_gap_interpolate",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_epoch,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    observed AS (
      SELECT event_type, hour_epoch, CAST(SUM(cents) AS BIGINT) AS obs
      FROM ev GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(hour_epoch) AS lo, MAX(hour_epoch) AS hi FROM ev
    ),
    grid AS (
      SELECT t.event_type, CAST(s.h AS BIGINT) AS hour_epoch
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS h
                  FROM bounds) s
    ),
    ctx AS (
      SELECT g.event_type, g.hour_epoch, o.obs,
             LAST_VALUE(o.obs IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN o.obs IS NOT NULL
                        THEN g.hour_epoch END IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             FIRST_VALUE(o.obs IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_epoch
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN o.obs IS NOT NULL
                         THEN g.hour_epoch END IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_epoch
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid g LEFT JOIN observed o
        ON o.event_type = g.event_type AND o.hour_epoch = g.hour_epoch
    )
    SELECT event_type, hour_epoch,
           CASE WHEN obs IS NOT NULL THEN obs
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + CAST(FLOOR((nv - pv) * (hour_epoch - ph)
                                  / (nh - ph)) AS BIGINT)
                ELSE NULL END AS cents_filled,
           CASE WHEN obs IS NOT NULL THEN 'obs'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS fill_kind
    FROM ctx
    ORDER BY event_type, hour_epoch
    """,
)
def events_gap_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly value series per event type with linear
    interpolation across gaps: hour spine from a 1-row bounds
    aggregate, vocabulary cross join, one fact-sized groupBy, then two
    type-partitioned window passes (carry last/first observation and
    its hour).  Hours outside a type's observed range stay NULL and
    are flagged 'edge' — imputation never invents data beyond the
    series support."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_epoch"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    observed = ev.groupBy("event_type", "hour_epoch").agg(
        F.sum("cents").alias("obs")
    )
    bounds = ev.agg(
        F.min("hour_epoch").alias("lo"), F.max("hour_epoch").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("hour_epoch")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    joined = grid.join(observed, ["event_type", "hour_epoch"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("obs").isNotNull(), F.col("hour_epoch"))
    ctx = joined.select(
        "event_type",
        "hour_epoch",
        "obs",
        F.last("obs", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(w_back).alias("ph"),
        F.first("obs", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(w_fwd).alias("nh"),
    )
    interp = F.col("pv") + F.floor(
        (F.col("nv") - F.col("pv"))
        * (F.col("hour_epoch") - F.col("ph"))
        / (F.col("nh") - F.col("ph"))
    ).cast("long")
    both = F.col("pv").isNotNull() & F.col("nv").isNotNull()
    return ctx.select(
        "event_type",
        "hour_epoch",
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(both, interp)
        .alias("cents_filled"),
        F.when(F.col("obs").isNotNull(), F.lit("obs"))
        .when(both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("fill_kind"),
    ).orderBy("event_type", "hour_epoch")


# Decile lift table: the standard evaluation of a propensity score —
# here a deterministic behavioural score (pre-period activity), so
# the whole gauge is exact-integer and engine-portable.  Users are
# ranked into deciles; each decile's conversion is compared to the
# global rate as integer ppm lift.
@register(
    "purchase_propensity_lift",
    """
    WITH b AS (
      SELECT (MIN(CAST(floor(epoch(ts)) AS BIGINT))
              + MAX(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS mid
      FROM events
    ),
    score AS (
      SELECT user_id, COUNT(*) AS n_pre
      FROM events CROSS JOIN b
      WHERE CAST(floor(epoch(ts)) AS BIGINT) < mid
        AND event_type <> 'purchase'
      GROUP BY user_id
    ),
    outcome AS (
      SELECT DISTINCT user_id
      FROM events CROSS JOIN b
      WHERE CAST(floor(epoch(ts)) AS BIGINT) >= mid
        AND event_type = 'purchase'
    ),
    ranked AS (
      SELECT s.user_id, s.n_pre,
             CASE WHEN o.user_id IS NULL THEN 0 ELSE 1 END AS converted,
             NTILE(10) OVER (ORDER BY s.n_pre DESC, s.user_id) AS decile
      FROM score s LEFT JOIN outcome o ON s.user_id = o.user_id
    ),
    tot AS (
      SELECT COUNT(*) AS n_all,
             CAST(SUM(converted) AS BIGINT) AS c_all FROM ranked
    )
    SELECT decile,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) AS BIGINT) * 1000000 // COUNT(*) AS conv_ppm,
           CAST(SUM(converted) AS BIGINT) * n_all * 1000000
             // (COUNT(*) * c_all) AS lift_ppm
    FROM ranked CROSS JOIN tot
    GROUP BY decile, n_all, c_all
    ORDER BY decile
    """,
)
def purchase_propensity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table for a deterministic pre-period activity
    score against post-period purchase conversion.  The ntile runs on
    the USER-reduced table (dim-sized — same discipline as
    customer_rfm), facts are touched twice (score + outcome), and all
    rates/lifts are exact integer ppm."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
    ).localCheckpoint(eager=False)  # feeds bounds, score, outcome
    b = ev.agg(
        ((F.min("sec") + F.max("sec")) / 2).cast("long").alias("mid")
    )
    with_mid = ev.crossJoin(F.broadcast(b))
    score = (
        with_mid.where(
            (F.col("sec") < F.col("mid")) & (F.col("event_type") != "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pre"))
    )
    outcome = (
        with_mid.where(
            (F.col("sec") >= F.col("mid")) & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .withColumn("converted_flag", F.lit(1))
    )
    ranked = (
        score.join(outcome, "user_id", "left")
        .select(
            "user_id",
            "n_pre",
            F.coalesce("converted_flag", F.lit(0)).alias("converted"),
        )
        .withColumn(
            "decile",
            F.ntile(10).over(
                Window.orderBy(F.col("n_pre").desc(), "user_id")
            ),
        )
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("converted").alias("c_all")
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").alias("n_converted"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "n_converted",
            F.expr("n_converted * 1000000 div n_users").alias("conv_ppm"),
            F.expr(
                "n_converted * n_all * 1000000 div (n_users * c_all)"
            ).alias("lift_ppm"),
        )
        .orderBy("decile")
    )


# ----------------------------- Q13 / FD audit / bootstrap / index

# TPC-H Q13 shape: distribution of customers by order count, including
# the zero-order customers a naive inner join silently drops.  The
# LEFT join + COUNT(o_orderkey) (not COUNT(*)) is the whole point.
@register(
    "customer_order_distribution",
    """
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (custdist): per-customer order counts via LEFT join
    (zero-order customers stay, COUNT(o_orderkey) ignores the NULL
    from the preserved side), then the count-of-counts histogram.
    Two groupBys, the first on the dim-sized customer key."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


# Functional-dependency audit (Deequ/constraint-suite shape): for each
# CLAIMED dependency X -> Y, count the X groups where Y is not
# single-valued and surface the worst offenders.  Determinant keys
# hash-partition, so the audit is one groupBy per FD regardless of
# table size; the three FDs below share one scan each.
@register(
    "fd_audit",
    """
    WITH checks AS (
      SELECT 'p_name->p_brand' AS fd, p_name AS det,
             COUNT(DISTINCT p_brand) AS n_vals, COUNT(*) AS n_rows
      FROM part GROUP BY p_name
      UNION ALL
      SELECT 'p_brand->p_type', p_brand,
             COUNT(DISTINCT p_type), COUNT(*)
      FROM part GROUP BY p_brand
      UNION ALL
      SELECT 'o_custkey->c_nationkey', CAST(o_custkey AS VARCHAR),
             COUNT(DISTINCT c_nationkey), COUNT(*)
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY o_custkey
    )
    SELECT fd,
           COUNT(*) AS n_groups,
           COUNT(CASE WHEN n_vals > 1 THEN 1 END) AS n_violating,
           CAST(SUM(CASE WHEN n_vals > 1 THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_in_violation
    FROM checks
    GROUP BY fd
    ORDER BY fd
    """,
)
def fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency screen over three claimed dependencies
    (two intra-table, one through a join): per-determinant distinct
    counts, rolled into violating-group and affected-row totals per
    dependency.  The profile every schema-inference/DQ suite runs
    before trusting a column as a key."""
    part = load_table(spark, sf_dir, "part")
    oc = load_table(spark, sf_dir, "orders").join(
        F.broadcast(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey"
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    def check(df, fd, det, dep):
        return (
            df.groupBy(F.col(det).cast("string").alias("det"))
            .agg(
                F.countDistinct(dep).alias("n_vals"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .select(F.lit(fd).alias("fd"), "det", "n_vals", "n_rows")
        )
    checks = (
        check(part, "p_name->p_brand", "p_name", "p_brand")
        .unionByName(check(part, "p_brand->p_type", "p_brand", "p_type"))
        .unionByName(
            check(oc, "o_custkey->c_nationkey", "o_custkey", "c_nationkey")
        )
    )
    viol = F.col("n_vals") > 1
    return (
        checks.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.count(F.when(viol, 1)).alias("n_violating"),
            F.sum(F.when(viol, F.col("n_rows")).otherwise(0)).alias(
                "rows_in_violation"
            ),
        )
        .orderBy("fd")
    )


# Deterministic Poisson bootstrap: B resampled replicates of the mean
# order value, each row's replicate-b weight drawn Poisson(1) from an
# md5 inverse-CDF lookup (hard-coded integer thresholds — no RNG, no
# libm), CI from percentile_disc over the B replicate means.  The
# standard big-data bootstrap: one pass, B weighted partial sums, no
# resampled copies of the data.
BOOTSTRAP_B = 32
# P(Poisson(1) <= k) scaled to 1e6, k = 0..5 (tail lumped into 6)
_POIS_CDF_PPM = (367879, 735759, 919699, 980945, 996257, 999406)


@register(
    "revenue_bootstrap_ci",
    f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    reps AS (
      SELECT b.b, base.o_orderkey, base.cents,
             CAST(('0x' || substr(md5('boot-' || CAST(b.b AS VARCHAR)
                   || '-' || CAST(o_orderkey AS VARCHAR)), 1, 5))
                  AS BIGINT) % 1000000 AS u
      FROM base
      CROSS JOIN (SELECT unnest(generate_series(1, {BOOTSTRAP_B})) AS b) b
    ),
    weighted AS (
      SELECT b, cents,
             {" + ".join(f"CASE WHEN u >= {t} THEN 1 ELSE 0 END"
                          for t in _POIS_CDF_PPM)} AS w
      FROM reps
    ),
    means AS (
      SELECT b,
             CAST(SUM(CAST(w AS BIGINT) * cents) AS BIGINT)
               / CAST(SUM(CAST(w AS BIGINT)) AS BIGINT) / 100.0 AS mean_rep
      FROM weighted GROUP BY b
    ),
    full_mean AS (
      SELECT CAST(SUM(cents) AS BIGINT)
               / CAST(COUNT(*) AS BIGINT) / 100.0 AS mean_full
      FROM base
    )
    SELECT mean_full,
           CAST({BOOTSTRAP_B} AS BIGINT) AS n_replicates,
           (SELECT percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_rep)
            FROM means) AS ci_lo,
           (SELECT percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_rep)
            FROM means) AS ci_hi
    FROM full_mean
    """,
)
def revenue_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the mean order value: 32 Poisson(1)
    replicate weights per order from md5 inverse-CDF thresholds
    (deterministic, engine-portable), replicate means as exact integer
    ratios, percentile_disc over the B-row replicate table.  One fact
    scan fanned x32 map-side; the only shuffle is the 32-group sum."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    reps = orders.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(BOOTSTRAP_B))).alias("b"),
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot-"),
                        F.col("b").cast("string"),
                        F.lit("-"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")
        % 1000000,
    )
    w = sum(
        F.when(F.col("u") >= t, 1).otherwise(0) for t in _POIS_CDF_PPM
    )
    means = (
        reps.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w").cast("long") * F.col("cents"))
                / F.sum(F.col("w").cast("long"))
                / 100.0
            ).alias("mean_rep")
        )
    )
    ci = means.agg(
        F.expr(
            "percentile_disc(0.025) within group (order by mean_rep)"
        ).alias("ci_lo"),
        F.expr(
            "percentile_disc(0.975) within group (order by mean_rep)"
        ).alias("ci_hi"),
    )
    full_mean = orders.agg(
        (F.sum("cents") / F.count(F.lit(1)) / 100.0).alias("mean_full"),
        F.lit(BOOTSTRAP_B).cast("long").alias("n_replicates"),
    )
    return full_mean.crossJoin(F.broadcast(ci)).select(
        "mean_full", "n_replicates", "ci_lo", "ci_hi"
    )


# Laspeyres price index: month-over-base price movement per category,
# base-month quantities as the fixed basket.  Only parts priced in
# BOTH months enter a month's index (matched-basket discipline); the
# per-part month price is the quantity-weighted average in exact
# integer cents, and the index is an exact-ratio ppm integer.
@register(
    "category_price_index",
    """
    WITH pm AS (
      SELECT p_type AS category,
             l_partkey,
             DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS month,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT category, l_partkey, cents AS c0, qty AS q0
      FROM pm
      WHERE month = (SELECT MIN(month) FROM pm)
    )
    SELECT m.category,
           CAST(m.month AS DATE) AS month,
           COUNT(*) AS n_parts,
           CAST(SUM((m.cents // m.qty) * b.q0) AS BIGINT) * 1000000
             // CAST(SUM((b.c0 // b.q0) * b.q0) AS BIGINT)
             AS index_ppm
    FROM pm m
    JOIN base b ON m.category = b.category AND m.l_partkey = b.l_partkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def category_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-basket Laspeyres-style price index per category and
    month vs the first month: per-(part, month) quantity and cents
    from one fact scan, base-month basket equi-joined back, index as
    exact integer ppm.  Unit prices are FLOORED integer cents per
    unit (cents div qty) — never doubles — so the base-quantity-
    weighted sums stay int64-exact through sf~1 (term bound ~4e12 x
    1e6; past that, drop the ppm scale a decade); the sub-cent floor
    bias (~1e-5 relative on ~1e5-cent prices) is deterministic and
    identical on both engines."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.trunc(F.col("l_shipdate").cast("date"), "MM").alias("month"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    pm = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_type").alias("category"),
            "l_partkey",
            "month",
        )
        .agg(F.sum("cents").alias("cents"), F.sum("qty").alias("qty"))
        .localCheckpoint(eager=False)  # feeds base month AND all months
    )
    min_month = pm.agg(F.min("month").alias("m0"))
    base = (
        pm.crossJoin(F.broadcast(min_month))
        .where(F.col("month") == F.col("m0"))
        .select(
            F.col("category").alias("b_category"),
            F.col("l_partkey").alias("b_partkey"),
            F.col("cents").alias("c0"),
            F.col("qty").alias("q0"),
        )
    )
    joined = pm.join(
        base,
        (F.col("category") == F.col("b_category"))
        & (F.col("l_partkey") == F.col("b_partkey")),
    )
    return (
        joined.groupBy("category", "month")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr(
                "sum((cents div qty) * q0) * 1000000"
                " div sum((c0 div q0) * q0)"
            ).alias("index_ppm"),
        )
        .orderBy("category", "month")
    )


# ------------------------------- table fingerprints / separability

# Order-independent content fingerprints for every table: each row is
# canonically serialized (keys/strings verbatim, money as floor-cents,
# timestamps as epoch seconds, float arrays as floor-micro ints — the
# repo's standard engine-portable encodings), hashed to 60 bits, and
# folded with a two-level modular sum that no partitioning, ordering,
# or engine can change.  This is the cross-engine parity audit in
# one query: two pipelines producing the same fingerprint hold the
# same rows.  The two-level fold (bucket partial sums mod p, then sum
# of the <=4096 partials) keeps every intermediate under int64 even
# at 10^12 rows — a single-level SUM(h) would overflow.
_FP_MOD = 1_000_000_007
# (table, canonical-row expression) — ONE definition drives both the
# Spark column and the oracle SQL, so the serializations cannot drift.
_FP_CANON = {
    "region": "concat_ws('|', r_regionkey, r_name)",
    "nation": "concat_ws('|', n_nationkey, n_name, n_regionkey)",
    "customer": "concat_ws('|', c_custkey, c_name, c_nationkey,"
    " CAST(floor(c_acctbal * 100) AS BIGINT), c_mktsegment)",
    "supplier": "concat_ws('|', s_suppkey, s_name, s_nationkey,"
    " CAST(floor(s_acctbal * 100) AS BIGINT))",
    "part": "concat_ws('|', p_partkey, p_name, p_brand, p_type, p_size,"
    " CAST(floor(p_retailprice * 100) AS BIGINT))",
    "orders": "concat_ws('|', o_orderkey, o_custkey, o_orderstatus,"
    " CAST(floor(o_totalprice * 100) AS BIGINT),"
    " CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)",
    "lineitem": "concat_ws('|', l_orderkey, l_linenumber, l_partkey,"
    " l_suppkey, CAST(l_quantity AS BIGINT),"
    " CAST(floor(l_extendedprice * 100) AS BIGINT),"
    " CAST(floor(l_discount * 100) AS BIGINT),"
    " CAST(floor(l_tax * 100) AS BIGINT),"
    " l_returnflag, l_linestatus,"
    " CAST(CAST(l_shipdate AS DATE) AS VARCHAR))",
    "events": "concat_ws('|', event_id, CAST(floor(epoch(ts)) AS BIGINT),"
    " user_id, event_type, CAST(floor(value * 100) AS BIGINT), props)",
    "documents": "concat_ws('|', doc_id, lang, source, n_chars, text)",
    "embeddings": "concat_ws('|', vec_id, label, array_join(transform("
    "embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),"
    " ','))",
}


def _fp_oracle_sql() -> str:
    parts = []
    for t, canon in _FP_CANON.items():
        duck = (
            canon.replace("epoch(ts)", "epoch(ts)")
            .replace("transform(", "list_transform(")
            .replace("array_join(", "array_to_string(")
        )
        parts.append(f"""
    SELECT '{t}' AS table_name, CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(hp) % {_FP_MOD} AS BIGINT) AS fingerprint
    FROM (
      SELECT CAST(SUM(h % {_FP_MOD}) % {_FP_MOD} AS BIGINT) AS hp,
             COUNT(*) AS n
      FROM (
        SELECT CAST(('0x' || substr(md5({duck}), 1, 15)) AS BIGINT) AS h
        FROM {t}
      ) GROUP BY h % 4096
    )""")
    return (
        "\n    UNION ALL".join(parts) + "\n    ORDER BY table_name"
    )


@register("table_fingerprints", _fp_oracle_sql())
def table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint + row count for all ten tables from one
    canonical serialization map shared with the oracle.  Each table is
    scanned once; the fold is groupBy(h%4096) partial sums then a
    4096-row final sum — commutative, so bit-identical under any
    partitioning.  Spark's epoch term uses unix_timestamp (same
    integer seconds as DuckDB's floor(epoch(ts)))."""
    outs = []
    for t, canon in _FP_CANON.items():
        expr = canon.replace(
            "CAST(floor(epoch(ts)) AS BIGINT)",
            "CAST(unix_timestamp(ts) AS BIGINT)",
        ).replace("AS VARCHAR)", "AS STRING)")
        df = load_table(spark, sf_dir, t).select(
            F.conv(F.substring(F.md5(F.expr(expr)), 1, 15), 16, 10)
            .cast("long")
            .alias("h")
        )
        partial = df.groupBy((F.col("h") % 4096).alias("b")).agg(
            (F.sum(F.col("h") % _FP_MOD) % _FP_MOD).alias("hp"),
            F.count(F.lit(1)).alias("n"),
        )
        outs.append(
            partial.agg(
                F.lit(t).alias("table_name"),
                F.sum("n").alias("n_rows"),
                (F.sum("hp") % _FP_MOD).alias("fingerprint"),
            )
        )
    acc = outs[0]
    for o in outs[1:]:
        acc = acc.unionByName(o)
    return acc.orderBy("table_name")


# Label-separability gauge: per ground-truth label, the within-cluster
# mean squared distance to the centroid vs the squared distance to the
# NEAREST other centroid — the (simplified, centroid-based) silhouette
# that grades whether labels are geometrically meaningful before
# anyone trains on them.  Exactness: embeddings quantize to int64
# micro-units; per-label per-dim sums and sum-of-squares are exact
# ints (|x|<=1e6 squared x 64 dims x n fits comfortably), and the only
# doubles are the FINAL per-label expressions, evaluated dim-by-dim in
# index order on both engines (Σ||x-c||² = Σ||x||² - Σ_d S_d²/n — no
# per-member double sums anywhere, so no accumulation-order hazard).
@register(
    "embedding_label_separation",
    """
    WITH ve AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    longf AS (
      SELECT label, u.i AS dim,
             CAST(floor(v[u.i] * 1000000) AS BIGINT) AS xi
      FROM ve CROSS JOIN UNNEST(range(1, len(v) + 1)) AS u(i)
    ),
    per_dim AS (
      SELECT label, dim,
             CAST(SUM(xi) AS BIGINT) AS sd,
             CAST(SUM(xi * xi) AS BIGINT) AS sq
      FROM longf GROUP BY label, dim
    ),
    per_label AS (
      SELECT label,
             list(sd ORDER BY dim) AS sds,
             CAST(SUM(sq) AS BIGINT) AS sqq
      FROM per_dim GROUP BY label
    ),
    counts AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ),
    lab AS (
      SELECT p.label, c.n, p.sds, p.sqq,
             p.sqq / CAST(c.n AS DOUBLE)
               - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(p.sds, s -> (s / CAST(c.n AS DOUBLE))
                                            * (s / CAST(c.n AS DOUBLE)))),
                   (a, b) -> a + b) AS intra_ms
      FROM per_label p JOIN counts c ON p.label = c.label
    ),
    pairs AS (
      SELECT a.label AS label, b.label AS other_label,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(a.sds) + 1), i ->
                 (a.sds[i] / CAST(a.n AS DOUBLE)
                  - b.sds[i] / CAST(b.n AS DOUBLE))
                 * (a.sds[i] / CAST(a.n AS DOUBLE)
                    - b.sds[i] / CAST(b.n AS DOUBLE)))),
               (x, y) -> x + y) AS inter_sq
      FROM lab a JOIN lab b ON a.label <> b.label
    ),
    nearest AS (
      SELECT label, other_label AS nearest_label, inter_sq,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY inter_sq, other_label) AS rk
      FROM pairs
      QUALIFY rk = 1
    )
    SELECT l.label, l.n, l.intra_ms,
           ne.nearest_label, ne.inter_sq AS nearest_inter_sq,
           ne.inter_sq / l.intra_ms AS separation
    FROM lab l JOIN nearest ne ON l.label = ne.label
    ORDER BY l.label
    """,
)
def embedding_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-silhouette per label over the embeddings table: intra =
    mean squared distance to own centroid (via exact integer sufficient
    statistics), inter = squared centroid-centroid distance to the
    nearest other label, separation = inter/intra.  Facts are touched
    once (posexplode -> per-(label,dim) sums); everything after is
    |labels|- and |labels|²-sized.  The dim-ordered HOF fold keeps the
    double summation order identical on both engines."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    longf = emb.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("dim0", "xi"),
    )
    per_dim = longf.groupBy("label", "dim0").agg(
        F.sum("xi").alias("sd"), F.sum(F.col("xi") * F.col("xi")).alias("sq")
    )
    per_label = per_dim.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim0, sd))),"
            " p -> p.sd)"
        ).alias("sds"),
        F.sum("sq").alias("sqq"),
    )
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    lab = per_label.join(counts, "label").select(
        "label",
        "n",
        "sds",
        (
            F.col("sqq") / F.col("n").cast("double")
            - F.expr(
                "aggregate(sds, CAST(0.0 AS DOUBLE),"
                " (a, s) -> a + (s / CAST(n AS DOUBLE))"
                " * (s / CAST(n AS DOUBLE)))"
            )
        ).alias("intra_ms"),
    )
    a = lab.select(
        F.col("label").alias("label"),
        F.col("n").alias("na"),
        F.col("sds").alias("sda"),
        F.col("intra_ms").alias("intra_ms"),
    )
    b = lab.select(
        F.col("label").alias("other_label"),
        F.col("n").alias("nb"),
        F.col("sds").alias("sdb"),
    )
    pairs = a.join(F.broadcast(b), F.col("label") != F.col("other_label")).select(
        "label",
        "other_label",
        "na",
        "intra_ms",
        F.expr(
            "aggregate(sequence(1, size(sda)), CAST(0.0 AS DOUBLE),"
            " (acc, i) -> acc + (element_at(sda, i) / CAST(na AS DOUBLE)"
            "   - element_at(sdb, i) / CAST(nb AS DOUBLE))"
            " * (element_at(sda, i) / CAST(na AS DOUBLE)"
            "   - element_at(sdb, i) / CAST(nb AS DOUBLE)))"
        ).alias("inter_sq"),
    )
    w = Window.partitionBy("label").orderBy("inter_sq", "other_label")
    nearest = (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    return nearest.select(
        "label",
        F.col("na").alias("n"),
        "intra_ms",
        F.col("other_label").alias("nearest_label"),
        F.col("inter_sq").alias("nearest_inter_sq"),
        (F.col("inter_sq") / F.col("intra_ms")).alias("separation"),
    ).orderBy("label")


# ------------------- HHI / seasonality / bursts / containment

# Herfindahl–Hirschman concentration per category: supplier revenue
# shares in ppm, HHI = Σ share² (scaled /1e6 back to ppm²→ppm⁻ scale
# kept integer).  The antitrust-style complement of revenue_gini:
# Gini ranks whales globally, HHI scores per-market concentration.
@register(
    "category_hhi",
    """
    WITH sup AS (
      SELECT p_type AS category, l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT category, CAST(SUM(cents) AS BIGINT) AS total
      FROM sup GROUP BY category
    )
    SELECT s.category,
           COUNT(*) AS n_suppliers,
           CAST(SUM((s.cents * 1000000 // t.total)
                    * (s.cents * 1000000 // t.total)) AS BIGINT)
             // 1000000 AS hhi_ppm
    FROM sup s JOIN tot t ON s.category = t.category
    GROUP BY s.category
    ORDER BY s.category
    """,
)
def category_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration HHI per category from supplier revenue
    shares: per-(category, supplier) cents in one fact scan, category
    totals joined back (vocabulary-sized), shares as floored integer
    ppm, HHI = Σ share² div 1e6 — exact integers end to end (share²
    ≤ 1e12, Σ over ≤ suppliers·1e12 « 2^63)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    sup = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_type").alias("category"), "l_suppkey")
        .agg(F.sum("cents").alias("cents"))
    )
    tot = sup.groupBy("category").agg(F.sum("cents").alias("total"))
    return (
        sup.join(F.broadcast(tot), "category")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.expr(
                "sum((cents * 1000000 div total)"
                " * (cents * 1000000 div total)) div 1000000"
            ).alias("hhi_ppm"),
        )
        .orderBy("category")
    )


# Weekday seasonality decomposition: per event type, each weekday's
# mean daily count vs the all-week mean as an integer ppm index — the
# profile a seasonal-naive forecaster assumes and the input to any
# deseasonalization step.  Two vocabulary-sized aggregations after one
# fact-sized (type, day) rollup.
@register(
    "weekday_seasonality",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    wd AS (
      SELECT event_type, dayofweek(day) AS weekday,
             CAST(SUM(n) AS BIGINT) AS n_events,
             COUNT(*) AS n_days
      FROM daily GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type,
             CAST(SUM(n_events) AS BIGINT) AS tot_events,
             CAST(SUM(n_days) AS BIGINT) AS tot_days
      FROM wd GROUP BY event_type
    )
    SELECT w.event_type, w.weekday, w.n_events, w.n_days,
           (w.n_events * b.tot_days * 1000000)
             // (w.n_days * b.tot_events) AS seasonal_index_ppm
    FROM wd w JOIN base b ON w.event_type = b.event_type
    ORDER BY w.event_type, w.weekday
    """,
)
def weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type weekday seasonal indices: mean daily volume per
    weekday over mean daily volume overall, as exact integer ppm
    (cross-multiplied — no division until the final floor).  DuckDB's
    dayofweek is 0=Sunday; Spark's dayofweek is 1=Sunday, so the
    Spark side subtracts 1 to agree."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    wd = daily.groupBy(
        "event_type", (F.dayofweek("day") - 1).alias("weekday")
    ).agg(
        F.sum("n").alias("n_events"), F.count(F.lit(1)).alias("n_days")
    )
    base = wd.groupBy("event_type").agg(
        F.sum("n_events").alias("tot_events"),
        F.sum("n_days").alias("tot_days"),
    )
    return (
        wd.join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            "weekday",
            "n_events",
            "n_days",
            F.expr(
                "(n_events * tot_days * 1000000)"
                " div (n_days * tot_events)"
            ).alias("seasonal_index_ppm"),
        )
        .orderBy("event_type", "weekday")
    )


# Burst detection: the max number of events any sliding 5-minute
# window holds, per type — the ops alert that catches traffic spikes
# a fixed hourly bucket smears away.  RANGE frame over integer epoch
# seconds, partitioned by type: each partition sorts once; no
# self-join, no explode.
BURST_WINDOW_SECONDS = 300


@register(
    "events_burst_windows",
    f"""
    WITH ev AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    counted AS (
      SELECT event_type, sec,
             COUNT(*) OVER (
               PARTITION BY event_type ORDER BY sec
               RANGE BETWEEN {BURST_WINDOW_SECONDS - 1} PRECEDING
                         AND CURRENT ROW) AS n_in_window
      FROM ev
    )
    SELECT event_type,
           CAST(MAX(n_in_window) AS BIGINT) AS peak_5min,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(n_in_window) AS BIGINT) * 1000000 // COUNT(*)
             AS peak_share_ppm
    FROM counted
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak trailing-5-minute event count per type via a RANGE window
    over epoch seconds (every event anchors a window ending at
    itself — the discrete sliding-window maximum without self-joins).
    One type-partitioned sort, one groupBy."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").alias("sec")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("sec")
        .rangeBetween(-(BURST_WINDOW_SECONDS - 1), Window.currentRow)
    )
    counted = ev.withColumn("n_in_window", F.count(F.lit(1)).over(w))
    return (
        counted.groupBy("event_type")
        .agg(
            F.max("n_in_window").alias("peak_5min"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "max(n_in_window) * 1000000 div count(1)"
            ).alias("peak_share_ppm"),
        )
        .orderBy("event_type")
    )


from data_pipeline_for_e_commerce_shop_spark.operators.dedup import (  # noqa: E402
    CONTAINMENT_PCT as _CONTAINMENT_PCT,
)

# Asymmetric containment on the LSH candidate set: catches excerpt/
# expansion duplicates whose symmetric Jaccard is tiny.  Shares the
# banding CTEs with the other dedup oracles.
register(
    "dedup_containment_pairs",
    _SHINGLE_CTE
    + f"""
    , sets AS (
      SELECT doc_id, list_sort(list(DISTINCT shingle)) AS sh_set
      FROM sh GROUP BY doc_id
    )
    SELECT doc_a, doc_b, n_inter, n_a, n_b,
           n_inter * 1000000 // n_a AS containment_a_ppm,
           n_inter * 1000000 // n_b AS containment_b_ppm
    FROM (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS BIGINT)
               AS n_inter,
             CAST(len(sa.sh_set) AS BIGINT) AS n_a,
             CAST(len(sb.sh_set) AS BIGINT) AS n_b
      FROM cand
      JOIN sets sa ON cand.doc_a = sa.doc_id
      JOIN sets sb ON cand.doc_b = sb.doc_id
    )
    WHERE 100 * n_inter >= {_CONTAINMENT_PCT} * n_a
       OR 100 * n_inter >= {_CONTAINMENT_PCT} * n_b
    """,
)(dedup.containment_pairs)


# ------------------- off-policy eval / graph stats / RAKE keywords

# Inverse-propensity-scored offline policy evaluation (the replay
# estimator): logged arms are the deterministic 50/50 hash assignment
# (ab_test_report's), reward is the purchase value; a candidate
# policy's value is estimated as mean(reward · 1[π(u)=logged arm] / p)
# with p = 1/2 known — the counterfactual gauge that lets you grade a
# new targeting rule on logged traffic without an experiment.  Exact:
# rewards are integer cents, matched sums are exact, the /p is a
# x2 integer scale.
@register(
    "offline_policy_ips",
    """
    WITH purchases AS (
      SELECT user_id,
             CAST(('0x' || substr(md5('arm-' || CAST(user_id AS VARCHAR)),
                   1, 8)) AS BIGINT) % 2 AS logged_arm,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    policies AS (
      SELECT 'always_arm_0' AS policy, 0 AS pick_mod, -1 AS modulus
      UNION ALL SELECT 'always_arm_1', 1, -1
      UNION ALL SELECT 'user_mod3', -1, 3
    ),
    scored AS (
      SELECT p.policy, pu.cents,
             CASE WHEN p.modulus = -1
                  THEN CASE WHEN pu.logged_arm = p.pick_mod
                       THEN 1 ELSE 0 END
                  ELSE CASE WHEN pu.logged_arm =
                            (pu.user_id % p.modulus) % 2
                       THEN 1 ELSE 0 END
             END AS matched
      FROM purchases pu CROSS JOIN policies p
    )
    SELECT policy,
           COUNT(*) AS n_logged,
           CAST(SUM(matched) AS BIGINT) AS n_matched,
           CAST(SUM(matched * cents) AS BIGINT) * 2
             / COUNT(*) / 100.0 AS ips_value,
           CASE WHEN SUM(matched) > 0
                THEN CAST(SUM(matched * cents) AS BIGINT)
                     / CAST(SUM(matched) AS BIGINT) / 100.0
                ELSE NULL END AS matched_avg_reward
    FROM scored
    GROUP BY policy
    ORDER BY policy
    """,
)
def offline_policy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS/replay off-policy evaluation of three candidate targeting
    policies against the logged 50/50 hash assignment: value =
    2·Σ(matched reward)/n from exact integer cents.  One purchase
    scan fanned across the policy vocabulary (3 rows, broadcast);
    the only shuffle is the 3-group rollup."""
    purchases = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("arm-"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("logged_arm"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    policies = spark.createDataFrame(
        [("always_arm_0", 0, -1), ("always_arm_1", 1, -1), ("user_mod3", -1, 3)],
        "policy string, pick_mod int, modulus int",
    )
    scored = purchases.crossJoin(F.broadcast(policies)).select(
        "policy",
        "cents",
        F.when(
            F.col("modulus") == -1,
            F.when(F.col("logged_arm") == F.col("pick_mod"), 1).otherwise(0),
        )
        .otherwise(
            F.when(
                F.col("logged_arm")
                == (F.col("user_id") % F.col("modulus")) % 2,
                1,
            ).otherwise(0)
        )
        .alias("matched"),
    )
    return (
        scored.groupBy("policy")
        .agg(
            F.count(F.lit(1)).alias("n_logged"),
            F.sum("matched").alias("n_matched"),
            (
                F.sum(F.col("matched") * F.col("cents")) * 2
                / F.count(F.lit(1))
                / 100.0
            ).alias("ips_value"),
            F.when(
                F.sum("matched") > 0,
                F.sum(F.col("matched") * F.col("cents"))
                / F.sum("matched")
                / 100.0,
            ).alias("matched_avg_reward"),
        )
        .orderBy("policy")
    )


# Co-purchase graph topology profile: degree per part from the
# in-basket pair expansion, log2 degree-bucket histogram, and the mean
# neighbor degree per bucket (the assortativity diagnostic — do
# popular parts co-sell with popular parts?).  Every stage is keyed
# (part, bucket); the pair expansion is the same order-bounded one
# basket_pairs uses.
@register(
    "part_degree_profile",
    """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (
      SELECT u, COUNT(*) AS degree FROM pairs GROUP BY u
    ),
    nbr AS (
      SELECT p.u, CAST(SUM(d2.degree) AS BIGINT) AS nbr_deg_sum
      FROM pairs p JOIN deg d2 ON p.v = d2.u
      GROUP BY p.u
    )
    SELECT CAST(floor(log2(d.degree)) AS BIGINT) AS degree_bucket,
           COUNT(*) AS n_parts,
           CAST(MIN(d.degree) AS BIGINT) AS min_degree,
           CAST(MAX(d.degree) AS BIGINT) AS max_degree,
           CAST(SUM(n.nbr_deg_sum) AS BIGINT) * 1000000
             // CAST(SUM(d.degree) AS BIGINT) AS mean_nbr_degree_ppm
    FROM deg d JOIN nbr n ON d.u = n.u
    GROUP BY 1
    ORDER BY 1
    """,
)
def part_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram (log2 buckets) + mean neighbor degree of the
    co-purchase graph: distinct in-order part pairs, per-part degree,
    neighbor-degree sums via one edges⋈degrees equi-join, bucket
    rollup.  log2 on an integer degree is exact on both engines
    (power-of-two boundaries are representable)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    pairs = (
        a.join(b, "o")
        .where(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=False)  # feeds deg AND nbr
    )
    deg = pairs.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    d2 = deg.select(F.col("u").alias("v"), F.col("degree").alias("vdeg"))
    nbr = (
        pairs.join(d2, "v")
        .groupBy("u")
        .agg(F.sum("vdeg").alias("nbr_deg_sum"))
    )
    return (
        deg.join(nbr, "u")
        .groupBy(
            F.floor(F.log2("degree")).cast("long").alias("degree_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
            F.expr(
                "sum(nbr_deg_sum) * 1000000 div sum(degree)"
            ).alias("mean_nbr_degree_ppm"),
        )
        .orderBy("degree_bucket")
    )


# RAKE-style keyword extraction: candidate phrases are maximal
# stopword-free token runs; each word scores degree/frequency over the
# whole corpus (degree = Σ length of phrases containing it), each
# phrase scores the sum of its words' scores, and the top phrases per
# language surface.  Scores stay exact integer ppm (deg·1e6 div freq).
RAKE_TOPK = 5


@register(
    "text_rake_keywords",
    f"""
    WITH phr AS (
      SELECT lang, phrase
      FROM (
        SELECT lang,
               unnest(string_split(regexp_replace(text,
                 '\\b(the|a|and|of|to)\\b', '|', 'g'), '|')) AS phrase
        FROM documents
      )
      WHERE trim(phrase) <> ''
    ),
    norm AS (
      SELECT lang, trim(phrase) AS phrase,
             string_split(trim(phrase), ' ') AS words
      FROM phr
    ),
    clean AS (
      SELECT lang, phrase,
             list_filter(words, w -> w <> '') AS words
      FROM norm
    ),
    wstat AS (
      SELECT lang, w.word,
             COUNT(*) AS freq,
             CAST(SUM(len(words)) AS BIGINT) AS deg
      FROM clean, UNNEST(words) AS w(word)
      GROUP BY lang, w.word
    ),
    wscore AS (
      SELECT lang, word, deg * 1000000 // freq AS score_ppm
      FROM wstat
    ),
    pexp AS (
      SELECT c.lang, c.phrase, w.word
      FROM (SELECT DISTINCT lang, phrase, words FROM clean) c,
           UNNEST(c.words) AS w(word)
    ),
    pscore AS (
      SELECT p.lang, p.phrase,
             CAST(SUM(s.score_ppm) AS BIGINT) AS phrase_score_ppm
      FROM pexp p
      JOIN wscore s ON s.lang = p.lang AND s.word = p.word
      GROUP BY p.lang, p.phrase
    )
    SELECT lang, phrase, phrase_score_ppm,
           rk AS rank
    FROM (
      SELECT lang, phrase, phrase_score_ppm,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY phrase_score_ppm DESC, phrase) AS rk
      FROM pscore
    )
    WHERE rk <= {RAKE_TOPK}
    ORDER BY lang, rank
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction per language: stopword-delimited
    phrase candidates, corpus-level word degree/frequency scores in
    exact integer ppm, phrase scores as word-score sums, top-5 per
    language.  Phrase splitting, trimming, and word explosion are all
    JVM expressions; the two joins are keyed on (lang, word) and
    (lang, phrase)."""
    from pyspark.sql import Window
    from data_pipeline_for_e_commerce_shop_spark.operators.text import STOPWORDS

    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    docs = load_table(spark, sf_dir, "documents")
    phr = docs.select(
        "lang",
        F.explode(
            F.split(F.regexp_replace("text", pat, "|"), r"\|")
        ).alias("phrase"),
    ).where(F.trim("phrase") != "")
    clean = phr.select(
        "lang",
        F.trim("phrase").alias("phrase"),
        F.expr("filter(split(trim(phrase), ' '), w -> w <> '')").alias(
            "words"
        ),
    ).localCheckpoint(eager=False)  # feeds word stats AND phrase scores
    wstat = clean.select("lang", F.explode("words").alias("word"), F.size("words").alias("plen")).groupBy(
        "lang", "word"
    ).agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    wscore = wstat.select(
        "lang", "word", F.expr("deg * 1000000 div freq").alias("score_ppm")
    )
    distinct_phr = clean.select("lang", "phrase", "words").distinct()
    pscore = (
        distinct_phr.select("lang", "phrase", F.explode("words").alias("word"))
        .join(wscore, ["lang", "word"])
        .groupBy("lang", "phrase")
        .agg(F.sum("score_ppm").alias("phrase_score_ppm"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("phrase_score_ppm").desc(), "phrase"
    )
    return (
        pscore.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= RAKE_TOPK)
        .select("lang", "phrase", "phrase_score_ppm", "rank")
        .orderBy("lang", "rank")
    )


# ------------------- encoding advisor / QQ shift / MRR / LTV

# Storage-encoding advisor: per column, the statistics a columnar
# writer needs to pick an encoding — distinct count (dictionary
# viability) and value-run structure under the table's deterministic
# sort order (RLE viability).  Runs are counted inside orderkey
# buckets so the window never needs a global sort (the ≤|buckets|
# boundary truncation is documented and identical on both engines).
@register(
    "lineitem_encoding_advisor",
    """
    WITH ordered AS (
      SELECT l_orderkey // 65536 AS bkt,
             l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_returnflag, l_linestatus,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship
      FROM lineitem
    ),
    runs AS (
      SELECT l_returnflag, l_linestatus, qty, ship,
             CASE WHEN l_returnflag IS DISTINCT FROM lag(l_returnflag)
               OVER w THEN 1 ELSE 0 END AS r_flag,
             CASE WHEN l_linestatus IS DISTINCT FROM lag(l_linestatus)
               OVER w THEN 1 ELSE 0 END AS r_status,
             CASE WHEN qty IS DISTINCT FROM lag(qty) OVER w
               THEN 1 ELSE 0 END AS r_qty,
             CASE WHEN ship IS DISTINCT FROM lag(ship) OVER w
               THEN 1 ELSE 0 END AS r_ship
      FROM ordered
      WINDOW w AS (PARTITION BY bkt
        ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
                 l_returnflag, l_linestatus, qty, ship)
    ),
    stats AS (
      SELECT 'returnflag' AS col, COUNT(*) AS n_rows,
             COUNT(DISTINCT l_returnflag) AS n_distinct,
             CAST(SUM(r_flag) AS BIGINT) AS n_breaks FROM runs
      UNION ALL SELECT 'linestatus', COUNT(*),
             COUNT(DISTINCT l_linestatus), CAST(SUM(r_status) AS BIGINT)
      FROM runs
      UNION ALL SELECT 'quantity', COUNT(*),
             COUNT(DISTINCT qty), CAST(SUM(r_qty) AS BIGINT) FROM runs
      UNION ALL SELECT 'shipdate', COUNT(*),
             COUNT(DISTINCT ship), CAST(SUM(r_ship) AS BIGINT) FROM runs
    )
    SELECT col, n_rows, n_distinct, n_breaks,
           n_rows * 1000000 // (n_breaks + 1) AS avg_run_len_ppm,
           CASE WHEN n_rows * 1000 >= (n_breaks + 1) * 2000 THEN 'RLE'
                WHEN n_distinct * 50 <= n_rows THEN 'DICT'
                ELSE 'PLAIN' END AS advice
    FROM stats
    ORDER BY col
    """,
)
def lineitem_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding advisor (the ANALYZE step a lakehouse writer
    runs before choosing parquet encodings): distinct counts + value
    runs under the deterministic (orderkey, linenumber, partkey,
    suppkey, value...) order, bucketed so each window partition sorts
    locally.  One struct-lag window pass serves all four columns; the
    advisor rule is avg run ≥ 2 → RLE, distinct ≤ 2% → DICT."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("l_orderkey div 65536").alias("bkt"),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship"),
    )
    w = Window.partitionBy("bkt").orderBy(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_returnflag",
        "l_linestatus",
        "qty",
        "ship",
    )
    cols = {
        "returnflag": "l_returnflag",
        "linestatus": "l_linestatus",
        "quantity": "qty",
        "shipdate": "ship",
    }
    runs = li.select(
        *[
            F.when(
                ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)), 1
            )
            .otherwise(0)
            .alias(f"r_{name}")
            for name, c in cols.items()
        ],
        *[F.col(c).alias(f"v_{name}") for name, c in cols.items()],
    )
    stats = [
        runs.agg(
            F.lit(name).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(f"v_{name}").alias("n_distinct"),
            F.sum(f"r_{name}").alias("n_breaks"),
        )
        for name in cols
    ]
    acc = stats[0]
    for s_ in stats[1:]:
        acc = acc.unionByName(s_)
    return acc.select(
        "col",
        "n_rows",
        "n_distinct",
        "n_breaks",
        F.expr("n_rows * 1000000 div (n_breaks + 1)").alias(
            "avg_run_len_ppm"
        ),
        F.when(
            F.expr("n_rows * 1000 >= (n_breaks + 1) * 2000"), F.lit("RLE")
        )
        .when(F.expr("n_distinct * 50 <= n_rows"), F.lit("DICT"))
        .otherwise(F.lit("PLAIN"))
        .alias("advice"),
    ).orderBy("col")


# Quantile-quantile drift: the order-value distribution early vs late
# (orders split at the median order date), compared decile by decile —
# the continuous-drift view events_ks_drift summarizes into one number.
@register(
    "order_value_qq_shift",
    """
    WITH o AS (
      SELECT date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS dd,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    split AS (
      SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY dd) AS mid FROM o
    ),
    labeled AS (
      SELECT CASE WHEN dd <= mid THEN 'early' ELSE 'late' END AS half,
             cents
      FROM o CROSS JOIN split
    ),
    qw AS (
      SELECT half,
             CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q1,
             CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q2,
             CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q3,
             CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q4,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q5,
             CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q6,
             CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q7,
             CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q8,
             CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q9
      FROM labeled GROUP BY half
    ),
    q AS (
      SELECT half, p, CASE p WHEN 1 THEN q1 WHEN 2 THEN q2 WHEN 3 THEN q3 WHEN 4 THEN q4 WHEN 5 THEN q5 WHEN 6 THEN q6 WHEN 7 THEN q7 WHEN 8 THEN q8 WHEN 9 THEN q9 END AS qv
      FROM qw CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS p) ps
    )
    SELECT e.p AS decile,
           e.qv / 100.0 AS early_value,
           l.qv / 100.0 AS late_value,
           (l.qv - e.qv) * 1000000 // e.qv AS shift_ppm
    FROM (SELECT p, qv FROM q WHERE half = 'early') e
    JOIN (SELECT p, qv FROM q WHERE half = 'late') l ON e.p = l.p
    ORDER BY e.p
    """,
)
def order_value_qq_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-by-decile distribution shift of order value between the
    early and late half of the order history (split at the median
    date): percentile_disc exact data values on both sides, shift as
    integer ppm.  Two grouped percentile aggregations after a 1-row
    broadcast split point."""
    o = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dd"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    split = o.agg(
        F.expr("percentile_disc(0.5) within group (order by dd)").alias("mid")
    )
    labeled = o.crossJoin(F.broadcast(split)).select(
        F.when(F.col("dd") <= F.col("mid"), "early")
        .otherwise("late")
        .alias("half"),
        "cents",
    )
    deciles = labeled.groupBy("half").agg(
        *[
            F.expr(
                f"cast(percentile_disc({p / 10.0}) within group"
                f" (order by cents) as bigint)"
            ).alias(f"q{p}")
            for p in range(1, 10)
        ]
    )
    long = deciles.select(
        "half",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("decile"), F.col(f"q{p}").alias("qv")
                    )
                    for p in range(1, 10)
                ]
            )
        ).alias("r"),
    ).select("half", "r.decile", "r.qv")
    e = long.where(F.col("half") == "early").select(
        "decile", F.col("qv").alias("eqv")
    )
    l_ = long.where(F.col("half") == "late").select(
        "decile", F.col("qv").alias("lqv")
    )
    return (
        e.join(l_, "decile")
        .select(
            "decile",
            (F.col("eqv") / 100.0).alias("early_value"),
            (F.col("lqv") / 100.0).alias("late_value"),
            F.expr("(lqv - eqv) * 1000000 div eqv").alias("shift_ppm"),
        )
        .orderBy("decile")
    )


# Session-level mean reciprocal rank of the first purchase: how deep
# into a session users convert — the (deterministic, exact-integer)
# ranking-metric shape used to grade recommenders, composed over the
# 90 s gap sessionizer.
@register(
    "session_purchase_mrr",
    """
    WITH marked AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                       > 90
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY epoch_sec, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    ),
    ranked AS (
      SELECT user_id, session_no, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_no
               ORDER BY epoch_sec, event_id) AS rk
      FROM numbered
    ),
    per_session AS (
      SELECT user_id, session_no,
             MIN(CASE WHEN event_type = 'purchase' THEN rk END)
               AS first_purchase_rank
      FROM ranked GROUP BY user_id, session_no
    )
    SELECT COUNT(*) AS n_sessions,
           COUNT(first_purchase_rank) AS n_with_purchase,
           CAST(SUM(CASE WHEN first_purchase_rank = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rank_1,
           CAST(SUM(CASE WHEN first_purchase_rank BETWEEN 2 AND 3
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rank_2_3,
           CAST(SUM(CASE WHEN first_purchase_rank >= 4
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rank_4plus,
           CAST(SUM(1000000 // first_purchase_rank) AS BIGINT)
             // COUNT(first_purchase_rank) AS mrr_ppm
    FROM per_session
    """,
)
def session_purchase_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR of the first purchase within gap sessions: the sessionizer's
    exact window chain, a per-session rank, reciprocal ranks as integer
    ppm (1e6 div rank), and the rank-bucket histogram.  One user_id
    shuffle end to end."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(sec.asc(), F.col("event_id").asc())
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        sec.alias("epoch_sec"),
        F.when((sec - F.lag(sec).over(w)) > 90, 1).otherwise(0).alias(
            "new_session"
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn(
        "session_no", F.sum("new_session").over(w2)
    )
    w3 = Window.partitionBy("user_id", "session_no").orderBy(
        "epoch_sec", "event_id"
    )
    ranked = numbered.withColumn("rk", F.row_number().over(w3))
    per_session = ranked.groupBy("user_id", "session_no").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rk"))
        ).alias("first_purchase_rank")
    )
    fpr = F.col("first_purchase_rank")
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count(fpr).alias("n_with_purchase"),
        F.sum(F.when(fpr == 1, 1).otherwise(0)).alias("n_rank_1"),
        F.sum(F.when(fpr.between(2, 3), 1).otherwise(0)).alias("n_rank_2_3"),
        F.sum(F.when(fpr >= 4, 1).otherwise(0)).alias("n_rank_4plus"),
        F.expr(
            "sum(1000000 div first_purchase_rank)"
            " div count(first_purchase_rank)"
        ).alias("mrr_ppm"),
    )


# Cohort LTV-to-date + run rate: per signup cohort (first-order
# month), cumulative revenue per member and the trailing-3-offset
# monthly run rate — the exact-integer core of an LTV model (the
# geometric extrapolation that usually sits on top needs libm pow and
# is deliberately out of the bit-exact gate).
@register(
    "customer_ltv_todate",
    """
    WITH first_order AS (
      SELECT o_custkey,
             MIN(DATE_TRUNC('month', CAST(o_orderdate AS DATE)))
               AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort_month, COUNT(*) AS cohort_size
      FROM first_order GROUP BY cohort_month
    ),
    rev AS (
      SELECT f.cohort_month,
             date_diff('month', f.cohort_month,
               DATE_TRUNC('month', CAST(o.o_orderdate AS DATE))) AS offset_m,
             CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ),
    maxoff AS (
      SELECT cohort_month, MAX(offset_m) AS max_offset
      FROM rev GROUP BY cohort_month
    )
    SELECT CAST(r.cohort_month AS DATE) AS cohort_month,
           s.cohort_size,
           CAST(SUM(r.cents) AS BIGINT) / 100.0 AS total_revenue,
           CAST(SUM(r.cents) AS BIGINT) / s.cohort_size / 100.0
             AS ltv_to_date,
           CAST(SUM(CASE WHEN m.max_offset - r.offset_m < 3
                    THEN r.cents ELSE 0 END) AS BIGINT)
             / (3 * s.cohort_size) / 100.0 AS monthly_run_rate
    FROM rev r
    JOIN sized s ON r.cohort_month = s.cohort_month
    JOIN maxoff m ON r.cohort_month = m.cohort_month
    GROUP BY r.cohort_month, s.cohort_size
    ORDER BY r.cohort_month
    """,
)
def customer_ltv_todate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value to date: first-order-month cohorts,
    cumulative revenue per member (exact cents / exact size), and the
    trailing-3-month run rate per member.  Facts are scanned twice
    (cohort assignment + revenue), both shuffles keyed on custkey/
    cohort month."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("om"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)  # feeds cohorts AND revenue
    first_order = orders.groupBy("o_custkey").agg(
        F.min("om").alias("cohort_month")
    )
    sized = first_order.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    rev = (
        orders.join(first_order, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between("om", "cohort_month").cast("long").alias(
                "offset_m"
            ),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    maxoff = rev.groupBy("cohort_month").agg(
        F.max("offset_m").alias("max_offset")
    )
    return (
        rev.join(F.broadcast(sized), "cohort_month")
        .join(F.broadcast(maxoff), "cohort_month")
        .groupBy("cohort_month", "cohort_size")
        .agg(
            (F.sum("cents") / 100.0).alias("total_revenue"),
            (F.sum("cents") / F.col("cohort_size") / 100.0).alias(
                "ltv_to_date"
            ),
            (
                F.sum(
                    F.when(
                        F.col("max_offset") - F.col("offset_m") < 3,
                        F.col("cents"),
                    ).otherwise(0)
                )
                / (3 * F.col("cohort_size"))
                / 100.0
            ).alias("monthly_run_rate"),
        )
        .orderBy("cohort_month")
    )


# -------- sampled join size / partition stats / attribution / SLA

# Optimizer-statistics family: join cardinality estimated from
# independent deterministic Bernoulli samples of both sides (est =
# |sample join| / (pa·pb)), with the exact size riding as the audit —
# the sampling-based complement of cms_join_size's sketch estimate.
JOIN_SAMPLE_PCT = 10


@register(
    "join_size_sampled_estimate",
    f"""
    WITH sa AS (
      SELECT o_orderkey FROM orders
      WHERE CAST(('0x' || substr(md5('jsa-' || CAST(o_orderkey AS VARCHAR)),
            1, 8)) AS BIGINT) % 100 < {JOIN_SAMPLE_PCT}
    ),
    sb AS (
      SELECT l_orderkey FROM lineitem
      WHERE CAST(('0x' || substr(md5('jsb-' || CAST(l_orderkey AS VARCHAR)
            || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100 < {JOIN_SAMPLE_PCT}
    ),
    est AS (
      SELECT COUNT(*) AS n_sample_join FROM sa JOIN sb
        ON o_orderkey = l_orderkey
    ),
    exact AS (
      SELECT COUNT(*) AS n_exact FROM orders JOIN lineitem
        ON o_orderkey = l_orderkey
    )
    SELECT n_sample_join,
           n_sample_join * 10000 // ({JOIN_SAMPLE_PCT} * {JOIN_SAMPLE_PCT})
             AS est_join_size,
           n_exact,
           ABS(n_sample_join * 10000
               // ({JOIN_SAMPLE_PCT} * {JOIN_SAMPLE_PCT}) - n_exact)
             * 1000000 // n_exact AS rel_err_ppm
    FROM est CROSS JOIN exact
    """,
)
def join_size_sampled_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided Bernoulli join-size estimation: md5-deterministic 10%
    samples of orders and lineitem, sample-join count scaled by
    1/(pa·pb), exact join count as the audit with integer-ppm relative
    error.  Note the fact-key sample keeps whole orderkey groups on
    the orders side but thins lines independently — the estimator the
    sketch-based cms_join_size should beat on skewed keys."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    def keep(prefix, *cols):
        key = F.concat_ws("-", *[F.col(c).cast("string") for c in cols])
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(prefix + "-"), key)), 1, 8),
                16,
                10,
            ).cast("long")
            % 100
            < JOIN_SAMPLE_PCT
        )
    sa = orders.where(keep("jsa", "o_orderkey"))
    sb = li.where(keep("jsb", "l_orderkey", "l_linenumber"))
    est = sa.join(sb, sa.o_orderkey == sb.l_orderkey).agg(
        F.count(F.lit(1)).alias("n_sample_join")
    )
    exact = orders.join(li, orders.o_orderkey == li.l_orderkey).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_sample_join",
        F.expr(
            f"n_sample_join * 10000 div ({JOIN_SAMPLE_PCT} * {JOIN_SAMPLE_PCT})"
        ).alias("est_join_size"),
        "n_exact",
        F.expr(
            f"abs(n_sample_join * 10000"
            f" div ({JOIN_SAMPLE_PCT} * {JOIN_SAMPLE_PCT}) - n_exact)"
            f" * 1000000 div n_exact"
        ).alias("rel_err_ppm"),
    )


# Iceberg/Delta-style partition manifest statistics: per month
# partition, the row count, key bounds, null counts, and total size
# proxy that drive scan pruning — the metadata a lakehouse keeps so
# queries never open irrelevant files.
@register(
    "orders_partition_stats",
    """
    SELECT DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS partition_month,
           COUNT(*) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey,
           CAST(MIN(floor(o_totalprice * 100)) AS BIGINT) AS min_price_cents,
           CAST(MAX(floor(o_totalprice * 100)) AS BIGINT) AS max_price_cents,
           COUNT(*) - COUNT(o_custkey) AS n_null_custkey,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruning manifest for a month-partitioned orders
    table: per-partition bounds/null/distinct statistics in ONE scan
    (map-side combinable aggregates only).  At 100 TB this IS the
    table the planner consults instead of the data."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.trunc(F.col("o_orderdate").cast("date"), "MM").alias(
                "partition_month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.max("o_orderkey").alias("max_orderkey"),
            F.min(F.floor(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("min_price_cents"),
            F.max(F.floor(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("max_price_cents"),
            (F.count(F.lit(1)) - F.count("o_custkey")).alias(
                "n_null_custkey"
            ),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("partition_month")
    )


# Position-based (U-shaped) attribution: 40% first touch, 40% last
# touch, 20% split over middle touches, allocated in EXACT cents via
# the same Hamilton largest-remainder discipline as budget_allocation
# (every conversion's credits sum to its cents, so the per-type rollup
# conserves money).  Touches = the session's events before the first
# purchase; single-touch sessions grant 100% to it.
@register(
    "events_position_attribution",
    """
    WITH marked AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                       > 90
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY epoch_sec, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    ),
    conv AS (
      SELECT user_id, session_no,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_sec * 100000
                      + event_id % 100000 END) AS pkey,
             MIN(CASE WHEN event_type = 'purchase' THEN cents END) IS NOT NULL
               AS has_p
      FROM numbered GROUP BY user_id, session_no
    ),
    pvalue AS (
      SELECT n.user_id, n.session_no, n.cents AS conv_cents
      FROM numbered n JOIN conv c
        ON n.user_id = c.user_id AND n.session_no = c.session_no
      WHERE c.has_p
        AND n.epoch_sec * 100000 + n.event_id % 100000 = c.pkey
        AND n.event_type = 'purchase'
    ),
    touches AS (
      SELECT n.user_id, n.session_no, n.event_id, n.event_type,
             p.conv_cents,
             ROW_NUMBER() OVER (PARTITION BY n.user_id, n.session_no
               ORDER BY n.epoch_sec, n.event_id) AS pos,
             COUNT(*) OVER (PARTITION BY n.user_id, n.session_no) AS n_touch
      FROM numbered n
      JOIN pvalue p ON n.user_id = p.user_id AND n.session_no = p.session_no
      JOIN conv c ON n.user_id = c.user_id AND n.session_no = c.session_no
      WHERE n.event_type <> 'purchase'
        AND n.epoch_sec * 100000 + n.event_id % 100000 < c.pkey
    ),
    weighted AS (
      SELECT user_id, session_no, event_id, event_type, conv_cents, n_touch,
             CASE WHEN n_touch = 1 THEN 100
                  WHEN n_touch = 2 THEN 50
                  WHEN pos = 1 THEN 40
                  WHEN pos = n_touch THEN 40
                  ELSE 20 END AS w_num,
             CASE WHEN n_touch <= 2 THEN 100
                  ELSE 100 * (n_touch - 2) END AS w_den_scale,
             CASE WHEN n_touch <= 2 OR pos = 1 OR pos = n_touch
                  THEN 100 ELSE 100 * (n_touch - 2) END AS my_den
      FROM touches
    ),
    based AS (
      SELECT user_id, session_no, event_id, event_type, conv_cents,
             conv_cents * w_num // my_den AS base,
             (conv_cents * w_num) % my_den AS rem
      FROM weighted
    ),
    ranked AS (
      SELECT *,
             conv_cents - SUM(base) OVER (
               PARTITION BY user_id, session_no) AS leftover,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_no
               ORDER BY rem DESC, event_id) AS rk
      FROM based
    )
    SELECT event_type,
           COUNT(*) AS n_touches,
           CAST(SUM(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
                AS BIGINT) / 100.0 AS attributed_revenue
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution over gap sessions: first and
    last pre-purchase touches carry 40% each, the middle splits 20%,
    degenerate 1/2-touch sessions collapse to 100/50-50 — all as
    integer basis points with Hamilton top-ups per conversion, so
    attributed cents equal conversion cents exactly.  Windows stay
    keyed on (user, session)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(sec.asc(), F.col("event_id").asc())
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        sec.alias("epoch_sec"),
        F.when((sec - F.lag(sec).over(w)) > 90, 1).otherwise(0).alias(
            "new_session"
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn(
        "session_no", F.sum("new_session").over(w2)
    ).withColumn(
        "okey",
        F.col("epoch_sec") * 100000 + F.col("event_id") % 100000,
    ).localCheckpoint(eager=False)  # feeds conv, pvalue, touches
    conv = numbered.groupBy("user_id", "session_no").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("okey"))
        ).alias("pkey")
    ).where(F.col("pkey").isNotNull())
    pvalue = (
        numbered.join(conv, ["user_id", "session_no"])
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("okey") == F.col("pkey"))
        )
        .select(
            "user_id", "session_no", F.col("cents").alias("conv_cents")
        )
    )
    w3 = Window.partitionBy("user_id", "session_no").orderBy(
        "epoch_sec", "event_id"
    )
    w3all = Window.partitionBy("user_id", "session_no")
    touches = (
        numbered.join(conv, ["user_id", "session_no"])
        .where(
            (F.col("event_type") != "purchase")
            & (F.col("okey") < F.col("pkey"))
        )
        .join(pvalue, ["user_id", "session_no"])
        .withColumn("pos", F.row_number().over(w3))
        .withColumn("n_touch", F.count(F.lit(1)).over(w3all))
    )
    w_num = (
        F.when(F.col("n_touch") == 1, 100)
        .when(F.col("n_touch") == 2, 50)
        .when(F.col("pos") == 1, 40)
        .when(F.col("pos") == F.col("n_touch"), 40)
        .otherwise(20)
    )
    my_den = F.when(
        (F.col("n_touch") <= 2)
        | (F.col("pos") == 1)
        | (F.col("pos") == F.col("n_touch")),
        F.lit(100),
    ).otherwise(F.lit(100) * (F.col("n_touch") - 2))
    based = touches.select(
        "user_id",
        "session_no",
        "event_id",
        "event_type",
        "conv_cents",
        w_num.alias("w_num"),
        my_den.alias("my_den"),
    ).select(
        "user_id",
        "session_no",
        "event_id",
        "event_type",
        "conv_cents",
        F.expr("conv_cents * w_num div my_den").alias("base"),
        ((F.col("conv_cents") * F.col("w_num")) % F.col("my_den")).alias(
            "rem"
        ),
    )
    w4 = Window.partitionBy("user_id", "session_no")
    w5 = w4.orderBy(F.col("rem").desc(), "event_id")
    ranked = based.select(
        "event_type",
        (F.col("conv_cents") - F.sum("base").over(w4)).alias("leftover"),
        F.row_number().over(w5).alias("rk"),
        "base",
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            (
                F.sum(
                    F.col("base")
                    + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
                )
                / 100.0
            ).alias("attributed_revenue"),
        )
        .orderBy("event_type")
    )


# Inter-arrival SLA profile: per type, p50/p95/p99 of the gap between
# consecutive events plus the share of gaps breaching a 10-minute SLA
# — the freshness dashboard for a streaming ingestion tier.
SLA_GAP_SECONDS = 600


@register(
    "events_interarrival_sla",
    f"""
    WITH gaps AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS gap
      FROM events
    )
    SELECT event_type,
           COUNT(gap) AS n_gaps,
           CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY gap)
                AS BIGINT) AS p50_gap,
           CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY gap)
                AS BIGINT) AS p95_gap,
           CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY gap)
                AS BIGINT) AS p99_gap,
           CAST(SUM(CASE WHEN gap > {SLA_GAP_SECONDS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_breaches,
           CAST(SUM(CASE WHEN gap > {SLA_GAP_SECONDS} THEN 1 ELSE 0 END)
                AS BIGINT) * 1000000 // COUNT(gap) AS breach_ppm
    FROM gaps
    WHERE gap IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_interarrival_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival distribution (p50/p95/p99 exact discrete
    percentiles) and 10-minute SLA breach rate in integer ppm: one
    type-partitioned lag window, one grouped percentile pass."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").alias("sec"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    gaps = ev.withColumn(
        "gap", F.col("sec") - F.lag("sec").over(w)
    ).where(F.col("gap").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap").alias("n_gaps"),
            *[
                F.expr(
                    f"cast(percentile_disc({q}) within group"
                    f" (order by gap) as bigint)"
                ).alias(f"p{int(q * 100)}_gap")
                for q in (0.50, 0.95, 0.99)
            ],
            F.sum(
                F.when(F.col("gap") > SLA_GAP_SECONDS, 1).otherwise(0)
            ).alias("n_breaches"),
            F.expr(
                f"sum(CASE WHEN gap > {SLA_GAP_SECONDS} THEN 1 ELSE 0 END)"
                f" * 1000000 div count(gap)"
            ).alias("breach_ppm"),
        )
        .orderBy("event_type")
    )


# Perceptual-hash near-dup (aHash shape): the payload byte stream is
# split into 64 equal chunks, each hashed to one bit (chunk mean >
# global mean, integer cross-multiplied), and near-dups are pairs
# within Hamming ≤ 3 of the 64-bit signature.  Blocking is exact on
# 16-bit quarters (pigeonhole: ≤3 flipped bits leave ≥1 of 4 quarters
# identical — recall 1.0 by construction, same rewrite as SimHash's
# half-blocking).  The decode stub story applies: payloads here are
# the utf-8 text bytes (operators/multimodal.media_table); with a real
# codec the same 64-chunk luminance means drop in unchanged.
AHASH_MAX_HAMMING = 3


@register(
    "media_ahash_neardup",
    f"""
    WITH chars AS (
      SELECT doc_id, u.i,
             ascii(substr(text, CAST(u.i AS INT), 1)) AS code,
             strlen(text) AS n
      FROM documents
      CROSS JOIN UNNEST(range(1, strlen(text) + 1)) AS u(i)
      WHERE strlen(text) >= 64
    ),
    chunked AS (
      SELECT doc_id, (i - 1) * 64 // n AS chunk,
             CAST(SUM(code) AS BIGINT) AS csum,
             COUNT(*) AS clen,
             MAX(n) AS n
      FROM chars GROUP BY doc_id, (i - 1) * 64 // n
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(csum) AS BIGINT) AS total,
             CAST(MAX(n) AS BIGINT) AS n
      FROM chunked GROUP BY doc_id
    ),
    bits AS (
      SELECT c.doc_id, c.chunk,
             CASE WHEN c.csum * t.n > t.total * c.clen
                  THEN 1 ELSE 0 END AS bit
      FROM chunked c JOIN tot t ON c.doc_id = t.doc_id
    ),
    sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN chunk < 16
                  THEN bit * (1 << chunk) ELSE 0 END) AS BIGINT) AS q0,
             CAST(SUM(CASE WHEN chunk >= 16 AND chunk < 32
                  THEN bit * (1 << (chunk - 16)) ELSE 0 END) AS BIGINT) AS q1,
             CAST(SUM(CASE WHEN chunk >= 32 AND chunk < 48
                  THEN bit * (1 << (chunk - 32)) ELSE 0 END) AS BIGINT) AS q2,
             CAST(SUM(CASE WHEN chunk >= 48
                  THEN bit * (1 << (chunk - 48)) ELSE 0 END) AS BIGINT) AS q3
      FROM bits GROUP BY doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.q0 AS a0, a.q1 AS a1, a.q2 AS a2, a.q3 AS a3,
             b.q0 AS b0, b.q1 AS b1, b.q2 AS b2, b.q3 AS b3
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       AND (a.q0 = b.q0 OR a.q1 = b.q1 OR a.q2 = b.q2 OR a.q3 = b.q3)
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
              + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))
              AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
        + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))
        <= {AHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b
    """,
)
def media_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-chunk average-hash near-dup pairs (Hamming ≤ 3) with exact
    16-bit-quarter blocking: the signature build touches each payload
    once (char explode bounded by doc length), candidates come from
    four quarter equi-joins, the verify is xor+bit_count on four int64
    quarters.  Docs shorter than 64 bytes are excluded (their chunks
    would be empty)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") >= 64
    )
    chars = docs.select(
        "doc_id",
        F.length("text").alias("n"),
        F.posexplode(F.split("text", "(?!^)")).alias("i0", "ch"),
    ).select(
        "doc_id",
        "n",
        F.col("i0").alias("i"),  # 0-based char index
        F.ascii("ch").alias("code"),
    )
    chunked = chars.groupBy(
        "doc_id", F.expr("i * 64 div n").alias("chunk")
    ).agg(
        F.sum("code").alias("csum"),
        F.count(F.lit(1)).alias("clen"),
        F.max("n").alias("n"),
    )
    tot = chunked.groupBy("doc_id").agg(
        F.sum("csum").alias("total"), F.max("n").alias("nn")
    )
    bits = chunked.join(tot, "doc_id").select(
        "doc_id",
        "chunk",
        F.when(
            F.col("csum") * F.col("nn") > F.col("total") * F.col("clen"), 1
        )
        .otherwise(0)
        .alias("bit"),
    )
    sig = bits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(
                    f"CASE WHEN chunk >= {16 * q} AND chunk < {16 * (q + 1)}"
                    f" THEN bit * shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(chunk - {16 * q} AS INT)) ELSE 0 END"
                )
            ).alias(f"q{q}")
            for q in range(4)
        ]
    ).localCheckpoint(eager=False)  # feeds both sides of the pair join
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"q{q}").alias(f"a{q}") for q in range(4)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"q{q}").alias(f"b{q}") for q in range(4)],
    )
    cands = None
    for q in range(4):
        c = a.join(
            b,
            (F.col(f"a{q}") == F.col(f"b{q}"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        cands = c if cands is None else cands.unionByName(c)
    hamming = sum(
        F.expr(f"bit_count(a{q} ^ b{q})") for q in range(4)
    )
    return (
        cands.distinct()
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .where(F.col("hamming") <= AHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


# ---------------- trade matrix / market share / ops screens

# TPC-H Q7 shape: revenue flows between customer and supplier nations
# by year — the bilateral trade matrix.  Both nation lookups broadcast
# (dims), revenue stays integer cents.
@register(
    "nation_trade_matrix",
    """
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral nation-to-nation revenue matrix by year (TPC-H Q7
    generalized: all pairs, not two fixed nations): one fact scan,
    four broadcast dimension joins, one grouped money aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("yr"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("cnk"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("snk"),
        )
        .groupBy("cust_nation", "supp_nation", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("cents") / 100.0).alias("revenue"),
        )
        .orderBy("cust_nation", "supp_nation", "yr")
    )


# TPC-H Q8 shape: each supplier nation's revenue share within every
# customer region per year, as exact integer ppm.
@register(
    "supplier_market_share",
    """
    WITH flows AS (
      SELECT r.r_name AS cust_region,
             sn.n_name AS supp_nation,
             CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT cust_region, yr, CAST(SUM(cents) AS BIGINT) AS total
      FROM flows GROUP BY 1, 2
    )
    SELECT f.cust_region, f.supp_nation, f.yr,
           f.cents / 100.0 AS revenue,
           f.cents * 1000000 // t.total AS share_ppm
    FROM flows f
    JOIN tot t ON f.cust_region = t.cust_region AND f.yr = t.yr
    ORDER BY 1, 2, 3
    """,
)
def supplier_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation market share inside each customer region and
    year (TPC-H Q8 generalized to the full share matrix): the flows
    aggregate is vocabulary-sized, so the share join is trivial; all
    shares exact integer ppm."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("yr"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cnk"),
                    F.col("n_regionkey").alias("crk"),
                )
            ),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(
            F.broadcast(
                region.select(
                    F.col("r_regionkey").alias("crk2"),
                    F.col("r_name").alias("cust_region"),
                )
            ),
            F.col("crk") == F.col("crk2"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("snk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("snk"),
        )
        .groupBy("cust_region", "supp_nation", "yr")
        .agg(F.sum("cents").alias("cents"))
    )
    tot = flows.groupBy("cust_region", "yr").agg(
        F.sum("cents").alias("total")
    )
    return (
        flows.join(F.broadcast(tot), ["cust_region", "yr"])
        .select(
            "cust_region",
            "supp_nation",
            "yr",
            (F.col("cents") / 100.0).alias("revenue"),
            F.expr("cents * 1000000 div total").alias("share_ppm"),
        )
        .orderBy("cust_region", "supp_nation", "yr")
    )


# Fraud screen: multiple orders from one customer on one day, tiered
# by amount proximity — 'exact' (same cents) and 'close' (within 20%,
# integer cross-multiplied) are the duplicate-payment candidates a
# payment-ops team reviews; 'same_day' is the base-rate context row.
@register(
    "duplicate_payment_screen",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.o_custkey AS custkey,
           CAST(a.d AS DATE) AS order_date,
           a.o_orderkey AS order_a,
           b.o_orderkey AS order_b,
           a.cents / 100.0 AS amount_a,
           b.cents / 100.0 AS amount_b,
           CASE WHEN a.cents = b.cents THEN 'exact'
                WHEN ABS(a.cents - b.cents) * 5
                     <= LEAST(a.cents, b.cents) THEN 'close'
                ELSE 'same_day' END AS severity
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.d = b.d
     AND a.o_orderkey < b.o_orderkey
    ORDER BY custkey, order_a, order_b
    """,
)
def duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: self-join on (customer, day) — a key
    with tiny per-group cardinality, so the pair expansion stays
    linear-ish at any scale — then severity tiers by integer amount
    proximity (same cents = 'exact', |a−b|·5 ≤ min = within 20% =
    'close')."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).localCheckpoint(eager=False)  # both sides of the self-join
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("cents").alias("cents_a"),
        F.col("d").alias("d"),
        F.col("o_orderkey").alias("order_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("d"),
        F.col("o_orderkey").alias("order_b"),
    )
    severity = (
        F.when(F.col("cents_a") == F.col("cents_b"), "exact")
        .when(
            F.abs(F.col("cents_a") - F.col("cents_b")) * 5
            <= F.least("cents_a", "cents_b"),
            "close",
        )
        .otherwise("same_day")
    )
    return (
        a.join(b, ["custkey", "d"])
        .where(F.col("order_a") < F.col("order_b"))
        .select(
            "custkey",
            F.col("d").alias("order_date"),
            "order_a",
            "order_b",
            (F.col("cents_a") / 100.0).alias("amount_a"),
            (F.col("cents_b") / 100.0).alias("amount_b"),
            severity.alias("severity"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


# Merchandising screens: parts with no sale in the trailing 90 days
# (slow movers, an anti-join against recent facts) and parts whose
# entire volume ships from one supplier (single-source supply risk).
STALE_DAYS = 90


@register(
    "stale_parts",
    f"""
    WITH horizon AS (
      SELECT MAX(CAST(l_shipdate AS DATE)) AS maxd FROM lineitem
    ),
    recent AS (
      SELECT DISTINCT l_partkey
      FROM lineitem CROSS JOIN horizon
      WHERE CAST(l_shipdate AS DATE) > maxd - INTERVAL {STALE_DAYS} DAY
    )
    SELECT p.p_partkey, p.p_name, p.p_type
    FROM part p LEFT JOIN recent r ON p.p_partkey = r.l_partkey
    WHERE r.l_partkey IS NULL
    ORDER BY p.p_partkey
    """,
)
def stale_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slow movers: parts with zero shipments inside the trailing
    90-day horizon (horizon from a 1-row max aggregate, recent keys
    distinct-reduced, then a LEFT anti pattern against the part dim)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    horizon = li.agg(F.max("sd").alias("maxd"))
    recent = (
        li.crossJoin(F.broadcast(horizon))
        .where(F.col("sd") > F.date_sub(F.col("maxd"), STALE_DAYS))
        .select("l_partkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_type"
    )
    return (
        part.join(recent, part.p_partkey == recent.l_partkey, "left_anti")
        .orderBy("p_partkey")
    )


# (A plain single-source HAVING filter is vacuous on the synthetic
# generator's uniform supplier assignment, so the screen ranks by
# concentration instead — top-20 is non-vacuous at every SF.)
@register(
    "part_supplier_concentration",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    agg AS (
      SELECT l_partkey AS p_partkey,
             CAST(SUM(n) AS BIGINT) AS n_lines,
             COUNT(*) AS n_suppliers,
             CAST(MAX(n) AS BIGINT) AS top_lines
      FROM ps GROUP BY l_partkey
    )
    SELECT p_partkey, n_lines, n_suppliers,
           top_lines * 1000000 // n_lines AS top_share_ppm
    FROM agg
    ORDER BY top_share_ppm DESC, n_lines DESC, p_partkey
    LIMIT 20
    """,
)
def part_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration screen: the 20 parts most dependent on a
    single supplier (top-supplier share of shipped lines, exact
    integer ppm, fully tie-broken so LIMIT is deterministic).  Two
    grouped aggregates on part-keyed data — no windows, no joins."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_suppkey"
    )
    ps = li.groupBy("p_partkey", "l_suppkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    agg = ps.groupBy("p_partkey").agg(
        F.sum("n").alias("n_lines"),
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("n").alias("top_lines"),
    )
    return (
        agg.select(
            "p_partkey",
            "n_lines",
            "n_suppliers",
            F.expr("top_lines * 1000000 div n_lines").alias(
                "top_share_ppm"
            ),
        )
        .orderBy(
            F.col("top_share_ppm").desc(),
            F.col("n_lines").desc(),
            "p_partkey",
        )
        .limit(20)
    )


# ------------- CUPED / winsorized mean / vocab overlap / half-life

# CUPED variance reduction (Deng et al. 2013): the experiment-analysis
# upgrade over ab_test_report — each user's post-period purchase value
# is adjusted by their pre-period activity (theta = cov(X,Y)/var(X)),
# shrinking arm-mean variance by rho-squared without touching the
# treatment effect.  Every moment comes from exact int64 sums; theta /
# rho2 / adjusted means are fixed-order doubles identical on both
# engines.
@register(
    "ab_cuped_adjusted",
    """
    WITH b AS (
      SELECT (MIN(CAST(floor(epoch(ts)) AS BIGINT))
              + MAX(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS mid
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5('arm-' || CAST(user_id AS VARCHAR)),
                   1, 8)) AS BIGINT) % 2 AS arm,
             CAST(SUM(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < mid
                  THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= mid
                       AND event_type = 'purchase'
                  THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events CROSS JOIN b
      GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM per_user
    ),
    theta AS (
      SELECT n, sx, sy,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS th,
             ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
               / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS rho2
      FROM mom
    )
    SELECT p.arm,
           COUNT(*) AS n_users,
           CAST(SUM(p.y) AS BIGINT) / COUNT(*) / 100.0 AS raw_mean,
           (CAST(SUM(p.y) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
            - t.th * (CAST(SUM(p.x) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
                      - CAST(t.sx AS DOUBLE) / t.n)) / 100.0
             AS cuped_mean,
           t.th AS theta,
           t.rho2 AS variance_reduction
    FROM per_user p CROSS JOIN theta t
    GROUP BY p.arm, t.th, t.rho2, t.sx, t.n
    ORDER BY p.arm
    """,
)
def ab_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout: per-user pre-period activity
    X and post-period purchase cents Y (one fact scan), global moments
    as exact int64 sums (map-side combinable), per-arm raw vs adjusted
    means with theta and the variance-reduction factor.  The theta
    join is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = ev.agg(((F.min("sec") + F.max("sec")) / 2).cast("long").alias("mid"))
    per_user = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("sec") < F.col("mid"), 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    (F.col("sec") >= F.col("mid"))
                    & (F.col("event_type") == "purchase"),
                    F.col("cents"),
                ).otherwise(0)
            ).alias("y"),
        )
        .withColumn(
            "arm",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("arm-"), F.col("user_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2,
        )
        .localCheckpoint(eager=False)  # feeds moments AND the arm rollup
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    theta = mom.select(
        "n",
        "sx",
        (cov_n / varx_n).alias("th"),
        ((cov_n * cov_n) / (varx_n * vary_n)).alias("rho2"),
    )
    return (
        per_user.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("y").alias("sy_arm"),
            F.sum("x").alias("sx_arm"),
        )
        .crossJoin(F.broadcast(theta))
        .select(
            "arm",
            "n_users",
            (F.col("sy_arm") / F.col("n_users") / 100.0).alias("raw_mean"),
            (
                (
                    F.col("sy_arm") / F.col("n_users").cast("double")
                    - F.col("th")
                    * (
                        F.col("sx_arm") / F.col("n_users").cast("double")
                        - F.col("sx").cast("double") / F.col("n")
                    )
                )
                / 100.0
            ).alias("cuped_mean"),
            F.col("th").alias("theta"),
            F.col("rho2").alias("variance_reduction"),
        )
        .orderBy("arm")
    )


# Winsorized category means: clamp line prices to the category's
# [p5, p95] before averaging — the robust-mean complement of the MAD
# outlier fence (which flags; this one summarises).
@register(
    "category_winsorized_mean",
    """
    WITH li AS (
      SELECT p_type AS category,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    fences AS (
      SELECT category,
             CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)
                  AS BIGINT) AS lo,
             CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
                  AS BIGINT) AS hi
      FROM li GROUP BY category
    )
    SELECT l.category,
           COUNT(*) AS n_lines,
           CAST(SUM(l.cents) AS BIGINT) / COUNT(*) / 100.0 AS raw_mean,
           CAST(SUM(LEAST(GREATEST(l.cents, f.lo), f.hi)) AS BIGINT)
             / COUNT(*) / 100.0 AS winsorized_mean,
           CAST(SUM(CASE WHEN l.cents < f.lo OR l.cents > f.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM li l JOIN fences f ON l.category = f.category
    GROUP BY l.category
    ORDER BY l.category
    """,
)
def category_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category winsorized mean price: exact p5/p95 fences from a
    grouped percentile pass (vocabulary-sized, broadcast back), values
    clamped with least/greatest, exact integer ratio means.  Two fact
    passes, zero windows."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias(
                "cents"
            ),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("p_type").alias("category"), "cents")
        .localCheckpoint(eager=False)  # feeds fences AND the clamp pass
    )
    fences = li.groupBy("category").agg(
        F.expr(
            "cast(percentile_disc(0.05) within group (order by cents)"
            " as bigint)"
        ).alias("lo"),
        F.expr(
            "cast(percentile_disc(0.95) within group (order by cents)"
            " as bigint)"
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    outside = (F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi"))
    return (
        li.join(F.broadcast(fences), "category")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("cents") / F.count(F.lit(1)) / 100.0).alias("raw_mean"),
            (F.sum(clamped) / F.count(F.lit(1)) / 100.0).alias(
                "winsorized_mean"
            ),
            F.sum(F.when(outside, 1).otherwise(0)).alias("n_clamped"),
        )
        .orderBy("category")
    )


# Language vocabulary overlap: pairwise Jaccard of the distinct-token
# vocabularies — the corpus-composition diagnostic behind lang-ID
# confusability (and the exact analog of audience_overlap on tokens).
@register(
    "lang_vocab_overlap",
    """
    WITH v AS (
      SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    sizes AS (
      SELECT lang, COUNT(*) AS n FROM v GROUP BY lang
    ),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_inter
      FROM v a JOIN v b ON a.tok = b.tok AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT i.lang_a, i.lang_b, i.n_inter,
           sa.n AS n_a, sb.n AS n_b,
           i.n_inter * 1000000 // (sa.n + sb.n - i.n_inter)
             AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON i.lang_a = sa.lang
    JOIN sizes sb ON i.lang_b = sb.lang
    ORDER BY i.lang_a, i.lang_b
    """,
)
def lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise language-vocabulary Jaccard in exact ppm: one distinct
    (lang, token) pass, token-keyed intersection join, broadcast
    vocabulary sizes."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).distinct().localCheckpoint(eager=False)  # sizes AND intersections
    sizes = v.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    a = v.select(F.col("lang").alias("lang_a"), "tok")
    b = v.select(F.col("lang").alias("lang_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_inter",
            "n_a",
            "n_b",
            F.expr(
                "n_inter * 1000000 div (n_a + n_b - n_inter)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("lang_a", "lang_b")
    )


# Cohort half-life: the first month offset where a cohort's retention
# drops below 50% — the single-number summary of the retention
# triangle (NULL offset = never dropped within the observation
# window, surfaced with a flag rather than silently omitted).
@register(
    "cohort_half_life",
    """
    WITH cohorts AS (
      SELECT o_custkey,
             MIN(DATE_TRUNC('month', CAST(o_orderdate AS DATE)))
               AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort_month, COUNT(*) AS cohort_size
      FROM cohorts GROUP BY cohort_month
    ),
    activity AS (
      SELECT c.cohort_month,
             date_diff('month', c.cohort_month,
               DATE_TRUNC('month', CAST(o.o_orderdate AS DATE))) AS offset_m,
             COUNT(DISTINCT o.o_custkey) AS n_active
      FROM orders o JOIN cohorts c ON o.o_custkey = c.o_custkey
      GROUP BY 1, 2
    ),
    below AS (
      SELECT a.cohort_month,
             MIN(CASE WHEN a.n_active * 2 < s.cohort_size
                 THEN a.offset_m END) AS half_life_months,
             MAX(a.offset_m) AS observed_months
      FROM activity a JOIN sized s ON a.cohort_month = s.cohort_month
      WHERE a.offset_m > 0
      GROUP BY a.cohort_month
    )
    SELECT CAST(b.cohort_month AS DATE) AS cohort_month,
           s.cohort_size,
           b.half_life_months,
           b.observed_months,
           b.half_life_months IS NULL AS still_above_half
    FROM below b JOIN sized s ON b.cohort_month = s.cohort_month
    ORDER BY b.cohort_month
    """,
)
def cohort_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life per cohort: smallest positive offset with
    active·2 < size (integer comparison, no rate division), the
    observation horizon, and an explicit still-above-half flag.  Same
    two-shuffle shape as the retention triangle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("om"),
    ).localCheckpoint(eager=False)  # feeds cohorts AND activity
    cohorts = orders.groupBy("o_custkey").agg(
        F.min("om").alias("cohort_month")
    )
    sized = cohorts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = (
        orders.join(cohorts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between("om", "cohort_month").cast("long").alias(
                "offset_m"
            ),
        )
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )
    below = (
        activity.where(F.col("offset_m") > 0)
        .join(F.broadcast(sized), "cohort_month")
        .groupBy("cohort_month")
        .agg(
            F.min(
                F.when(
                    F.col("n_active") * 2 < F.col("cohort_size"),
                    F.col("offset_m"),
                )
            ).alias("half_life_months"),
            F.max("offset_m").alias("observed_months"),
        )
    )
    return (
        below.join(F.broadcast(sized), "cohort_month")
        .select(
            "cohort_month",
            "cohort_size",
            "half_life_months",
            "observed_months",
            F.col("half_life_months").isNull().alias("still_above_half"),
        )
        .orderBy("cohort_month")
    )


# ---------------- CUSUM / item-item CF / scorecard / collocations

# CUSUM change detection: the sequential drift alarm (Page 1954) that
# catches small persistent shifts chi²/KS windows dilute — S_i =
# max(0, S_{i-1} + x_i − μ − k) in exact integer cents through WITH
# RECURSIVE (the third recursive-CTE shape after EMA and Holt; same
# materialise-before-recursion discipline).
@register(
    "events_cusum_changepoint",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    mu AS (
      SELECT event_type,
             CAST(SUM(x) AS BIGINT) // COUNT(*) AS mu,
             (CAST(SUM(x) AS BIGINT) // COUNT(*)) // 20 AS k
      FROM daily GROUP BY event_type
    ),
    idx AS (
      SELECT d.event_type, d.d, d.x, m.mu, m.k,
             row_number() OVER (PARTITION BY d.event_type ORDER BY d.d)
               - 1 AS i
      FROM daily d JOIN mu m ON d.event_type = m.event_type
    ),
    cusum(event_type, i, d, s) AS (
      SELECT event_type, i, d,
             GREATEST(CAST(0 AS BIGINT), x - mu - k)
      FROM idx WHERE i = 0
      UNION ALL
      SELECT x.event_type, x.i, x.d,
             GREATEST(CAST(0 AS BIGINT), c.s + x.x - x.mu - x.k)
      FROM cusum c
      JOIN idx x ON x.event_type = c.event_type AND x.i = c.i + 1
    )
    SELECT c.event_type,
           CAST(MAX(c.s) AS BIGINT) AS max_cusum_cents,
           CAST(MIN(CASE WHEN c.s = mx.mx THEN c.d END) AS BIGINT)
             AS peak_day_epoch,
           CAST(SUM(CASE WHEN c.s > 4 * m.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alert_days,
           COUNT(*) AS n_days
    FROM cusum c
    JOIN mu m ON c.event_type = m.event_type
    JOIN (SELECT event_type, MAX(s) AS mx FROM cusum GROUP BY event_type)
      mx ON c.event_type = mx.event_type
    GROUP BY c.event_type
    ORDER BY c.event_type
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM over daily value totals per type: per-type
    integer target/slack (μ, k = μ/20), exact integer recursion run
    as ONE day-ordered aggregate-HOF fold per type (the day array is
    calendar-bounded), carrying (s, running max, earliest peak day,
    alert count) in a single struct accumulator.  This replaces a
    WITH RECURSIVE formulation whose depth-=-days join ladder cost
    ~60 scheduler rounds (5-10 s) for the identical integers; the
    ema/holt queries keep the recursion demo."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("x"))
    mu = daily.groupBy("event_type").agg(
        F.expr("sum(x) div count(1)").alias("mu"),
        F.expr("(sum(x) div count(1)) div 20").alias("k"),
    )
    arr = (
        daily.join(F.broadcast(mu), "event_type")
        .groupBy("event_type", "mu", "k")
        .agg(F.expr("array_sort(collect_list(struct(d, x)))").alias("seq"))
    )
    step_s = "GREATEST(CAST(0 AS BIGINT), a.s + e.x - mu - k)"
    fold = (
        "aggregate(seq, named_struct("
        " 's', CAST(0 AS BIGINT), 'mx', CAST(-1 AS BIGINT),"
        " 'peak', CAST(0 AS BIGINT), 'alerts', CAST(0 AS BIGINT),"
        " 'n', CAST(0 AS BIGINT)),"
        " (a, e) -> named_struct("
        f" 's', {step_s},"
        f" 'mx', GREATEST(a.mx, {step_s}),"
        f" 'peak', IF({step_s} > a.mx, e.d, a.peak),"
        f" 'alerts', a.alerts + IF({step_s} > 4 * k,"
        "    CAST(1 AS BIGINT), CAST(0 AS BIGINT)),"
        " 'n', a.n + CAST(1 AS BIGINT)))"
    )
    return (
        arr.select("event_type", F.expr(fold).alias("st"))
        .select(
            "event_type",
            F.col("st.mx").alias("max_cusum_cents"),
            F.col("st.peak").alias("peak_day_epoch"),
            F.col("st.alerts").alias("n_alert_days"),
            F.col("st.n").alias("n_days"),
        )
        .orderBy("event_type")
    )


# Item-item collaborative filtering: co-purchase Jaccard between
# parts (n_ab from the in-basket pair expansion, per-part basket
# counts joined back), fully tie-broken top-20 — the exact-integer
# heart of an "also bought" recommender.
ITEMCF_MIN_COBUY = 2


@register(
    "itemcf_similar_parts",
    f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    deg AS (
      SELECT l_partkey, COUNT(*) AS n FROM baskets GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {ITEMCF_MIN_COBUY}
    )
    SELECT part_a, part_b, n_ab,
           da.n AS n_a, db.n AS n_b,
           n_ab * 1000000 // (da.n + db.n - n_ab) AS jaccard_ppm
    FROM pairs
    JOIN deg da ON part_a = da.l_partkey
    JOIN deg db ON part_b = db.l_partkey
    ORDER BY jaccard_ppm DESC, part_a, part_b
    LIMIT 20
    """,
)
def itemcf_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 'also bought' part pairs by co-purchase Jaccard: the
    order-bounded basket pair expansion (same shape as basket_pairs),
    support-pruned at {min} co-buys, per-part basket counts broadcast
    back, exact ppm similarity, fully ordered LIMIT."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.distinct().localCheckpoint(eager=False)  # pairs + degrees
    deg = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = baskets.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "o")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= ITEMCF_MIN_COBUY)
    )
    da = deg.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    db = deg.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(da), "part_a")
        .join(F.broadcast(db), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("n_ab * 1000000 div (n_a + n_b - n_ab)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy(F.col("jaccard_ppm").desc(), "part_a", "part_b")
        .limit(20)
    )


# Supplier scorecard: the per-supplier operations rollup (revenue,
# return rate, breadth, rank within nation) in one fact scan + two
# broadcast dims.
@register(
    "supplier_scorecard",
    """
    WITH per AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             COUNT(*) AS n_lines,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned,
             COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
           p.cents / 100.0 AS revenue,
           p.n_lines,
           p.n_returned * 1000000 // p.n_lines AS return_ppm,
           p.n_parts,
           ROW_NUMBER() OVER (PARTITION BY n.n_name
             ORDER BY p.cents DESC, s.s_suppkey) AS rank_in_nation
    FROM per p
    JOIN supplier s ON p.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY nation, rank_in_nation
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier operations scorecard: revenue/volume/return-rate/
    breadth per supplier from one fact scan, nation dim broadcast,
    deterministic revenue rank within nation (dim-sized window)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_partkey",
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    per = li.groupBy("l_suppkey").agg(
        F.sum("cents").alias("cents"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returned"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("cents").desc(), "s_suppkey"
    )
    return (
        per.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            "nation",
            (F.col("cents") / 100.0).alias("revenue"),
            "n_lines",
            F.expr("n_returned * 1000000 div n_lines").alias("return_ppm"),
            "n_parts",
            F.row_number().over(w).alias("rank_in_nation"),
        )
        .orderBy("nation", "rank_in_nation")
    )


# Collocation extraction by LIFT (log-free PMI stand-in): bigrams
# whose observed frequency beats the independence expectation, scored
# as exact integer ppm lift with a support floor.
COLLOC_MIN_SUPPORT = 5
COLLOC_TOPK = 20


@register(
    "text_collocation_lift",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    uni AS (
      SELECT w.word, COUNT(*) AS n
      FROM toks, UNNEST(ws) AS w(word)
      GROUP BY w.word
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM uni),
    big AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM toks CROSS JOIN UNNEST(range(1, len(ws))) AS u(i)
    ),
    bi AS (
      SELECT w1, w2, COUNT(*) AS n_ab
      FROM big GROUP BY w1, w2
      HAVING COUNT(*) >= {COLLOC_MIN_SUPPORT}
    )
    SELECT w1, w2, n_ab,
           u1.n AS n_w1, u2.n AS n_w2,
           n_ab * t.big_n * 1000000 // (u1.n * u2.n) AS lift_ppm
    FROM bi
    JOIN uni u1 ON bi.w1 = u1.word
    JOIN uni u2 ON bi.w2 = u2.word
    CROSS JOIN tot t
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT {COLLOC_TOPK}
    """,
)
def text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by lift (P(ab)·N / (P(a)P(b)) as exact
    integer ppm — the log-free PMI ordering): adjacent bigrams from
    array slicing, unigram counts joined back on the word, support
    floor, fully tie-broken LIMIT.  Magnitude bound: n_ab·N·1e6 ≲
    1e16 at sf0.1 — int64-safe through sf~10."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).localCheckpoint(eager=False)  # feeds unigrams AND bigrams
    uni = toks.select(F.explode("ws").alias("word")).groupBy("word").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = uni.agg(F.sum("n").alias("big_n"))
    big = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= COLLOC_MIN_SUPPORT)
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("n").alias("n_w1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("n").alias("n_w2"))
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_w1",
            "n_w2",
            F.expr(
                "n_ab * big_n * 1000000 div (n_w1 * n_w2)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "w1", "w2")
        .limit(COLLOC_TOPK)
    )


# ------ 3-step Markov / segment migration / pricing / aging

# Three-step transition probabilities: the first-order per-step matrix
# (events_transition_matrix's shape) composed with itself twice via
# vocabulary-sized joins — P³ in exact integer ppm with documented
# truncation at each composition (floor at 1e-6 resolution, identical
# on both engines).  Answers "where is a user three actions from now"
# without materializing paths.
@register(
    "events_transition_3step",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT src, CAST(SUM(n) AS BIGINT) AS t FROM counts GROUP BY src
    ),
    p1 AS (
      SELECT c.src, c.dst, c.n * 1000000 // t.t AS p
      FROM counts c JOIN tot t ON c.src = t.src
    ),
    p2 AS (
      SELECT a.src, b.dst,
             CAST(SUM(a.p * b.p) // 1000000 AS BIGINT) AS p
      FROM p1 a JOIN p1 b ON a.dst = b.src
      GROUP BY a.src, b.dst
    ),
    p3 AS (
      SELECT a.src, b.dst,
             CAST(SUM(a.p * b.p) // 1000000 AS BIGINT) AS p
      FROM p2 a JOIN p1 b ON a.dst = b.src
      GROUP BY a.src, b.dst
    )
    SELECT src, dst, p AS p3_ppm
    FROM p3
    ORDER BY src, dst
    """,
)
def events_transition_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P³ of the event-type Markov chain in exact integer ppm: one
    user-partitioned LEAD pass builds the step counts; the two matrix
    compositions are |types|²-sized equi-joins (broadcast).  Floor
    truncation at each composition is the documented, deterministic
    quantization."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_timestamp("ts"), "event_id"
    )
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("src").agg(F.sum("n").alias("t"))
    p1 = counts.join(F.broadcast(tot), "src").select(
        "src", "dst", F.expr("n * 1000000 div t").alias("p")
    ).localCheckpoint(eager=False)  # composed twice
    a = p1.select(F.col("src"), F.col("dst").alias("mid"), F.col("p").alias("pa"))
    b = p1.select(F.col("src").alias("mid"), F.col("dst"), F.col("p").alias("pb"))
    p2 = (
        a.join(F.broadcast(b), "mid")
        .groupBy("src", "dst")
        .agg(F.expr("sum(pa * pb) div 1000000").alias("p"))
    )
    a2 = p2.select(F.col("src"), F.col("dst").alias("mid"), F.col("p").alias("pa"))
    p3 = (
        a2.join(F.broadcast(b), "mid")
        .groupBy("src", "dst")
        .agg(F.expr("sum(pa * pb) div 1000000").alias("p3_ppm"))
    )
    return p3.select("src", "dst", "p3_ppm").orderBy("src", "dst")


# Customer value-segment migration: quartile segment (by spend) in the
# early half vs the late half of the order history, as the transition
# matrix CRM teams watch (upgrades, downgrades, churn-ins/outs).
@register(
    "customer_segment_migration",
    """
    WITH o AS (
      SELECT o_custkey,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS dd,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    split AS (
      SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY dd) AS mid FROM o
    ),
    spend AS (
      SELECT o_custkey,
             CASE WHEN dd <= mid THEN 'early' ELSE 'late' END AS half,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM o CROSS JOIN split
      GROUP BY 1, 2
    ),
    seg AS (
      SELECT o_custkey, half,
             NTILE(4) OVER (PARTITION BY half
               ORDER BY cents DESC, o_custkey) AS quartile
      FROM spend
    )
    SELECT COALESCE(e.quartile, 0) AS early_quartile,
           COALESCE(l.quartile, 0) AS late_quartile,
           COUNT(*) AS n_customers
    FROM (SELECT o_custkey, quartile FROM seg WHERE half = 'early') e
    FULL OUTER JOIN
         (SELECT o_custkey, quartile FROM seg WHERE half = 'late') l
      ON e.o_custkey = l.o_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-quartile migration matrix between the early and late half
    of the order history (quartile 0 = absent that half): per-half
    spend rollup, key-tiebroken ntile on the customer-reduced table,
    FULL OUTER self-join, count per cell."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dd"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    split = o.agg(
        F.expr("percentile_disc(0.5) within group (order by dd)").alias("mid")
    )
    spend = (
        o.crossJoin(F.broadcast(split))
        .groupBy(
            "o_custkey",
            F.when(F.col("dd") <= F.col("mid"), "early")
            .otherwise("late")
            .alias("half"),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("half").orderBy(
        F.col("cents").desc(), "o_custkey"
    )
    seg = spend.withColumn("quartile", F.ntile(4).over(w))
    e = seg.where(F.col("half") == "early").select(
        "o_custkey", F.col("quartile").alias("eq")
    )
    l_ = seg.where(F.col("half") == "late").select(
        "o_custkey", F.col("quartile").alias("lq")
    )
    return (
        e.join(l_, "o_custkey", "full_outer")
        .groupBy(
            F.coalesce("eq", F.lit(0)).alias("early_quartile"),
            F.coalesce("lq", F.lit(0)).alias("late_quartile"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("early_quartile", "late_quartile")
    )


# Discount effectiveness: mean quantity per discount band (does a
# deeper discount move more units?) with volume and revenue context —
# exact integer band edges and ratio means.
@register(
    "discount_band_lift",
    """
    SELECT CAST(floor(l_discount * 100) AS BIGINT) // 2 * 2 AS disc_band_pct,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
             * 1000 // COUNT(*) AS mean_qty_milli,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) / 100.0 AS revenue
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def discount_band_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity response by 2-point discount band: integer band edges
    (floor pct div 2 * 2), mean quantity in exact milli-units, revenue
    context.  One scan, one groupBy — the pricing-effectiveness view."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.expr(
                "CAST(floor(l_discount * 100) AS BIGINT) div 2 * 2"
            ).alias("disc_band_pct")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr(
                "sum(CAST(l_quantity AS BIGINT)) * 1000 div count(1)"
            ).alias("mean_qty_milli"),
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
                / 100.0
            ).alias("revenue"),
        )
        .orderBy("disc_band_pct")
    )


# Receivables aging: open (non-finished) orders bucketed by days
# outstanding relative to the latest order date — the finance
# dashboard for working capital.
@register(
    "orders_aging_buckets",
    """
    WITH horizon AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders
    ),
    aged AS (
      SELECT o_orderstatus,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             date_diff('day', CAST(o_orderdate AS DATE), maxd) AS age
      FROM orders CROSS JOIN horizon
    )
    SELECT o_orderstatus,
           CASE WHEN age <= 30 THEN '0-30'
                WHEN age <= 60 THEN '31-60'
                WHEN age <= 90 THEN '61-90'
                ELSE '90+' END AS age_bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS outstanding
    FROM aged
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order aging matrix (status x 30-day age bucket) against the
    1-row horizon aggregate: the AR-aging shape with exact cents."""
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("maxd")
    )
    aged = o.crossJoin(F.broadcast(horizon)).select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.datediff(F.col("maxd"), F.col("o_orderdate").cast("date")).alias(
            "age"
        ),
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        aged.groupBy("o_orderstatus", bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("cents") / 100.0).alias("outstanding"),
        )
        .orderBy("o_orderstatus", "age_bucket")
    )


# Modal price points per brand: the psychological price-ladder view —
# top-3 most common exact cent prices per brand, fully tie-broken.
@register(
    "brand_price_points",
    """
    WITH pc AS (
      SELECT p_brand,
             CAST(floor(p_retailprice * 100) AS BIGINT) AS cents,
             COUNT(*) AS n
      FROM part GROUP BY 1, 2
    )
    SELECT p_brand, cents / 100.0 AS price_point, n, rk
    FROM (
      SELECT p_brand, cents, n,
             ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY n DESC, cents) AS rk
      FROM pc
    )
    WHERE rk <= 3
    ORDER BY p_brand, rk
    """,
)
def brand_price_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 modal price points per brand (exact cents, count-ranked
    with price tie-break): grouped count + dim-sized window."""
    from pyspark.sql import Window

    pc = load_table(spark, sf_dir, "part").groupBy(
        "p_brand",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("p_brand").orderBy(F.col("n").desc(), "cents")
    return (
        pc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "p_brand",
            (F.col("cents") / 100.0).alias("price_point"),
            "n",
            "rk",
        )
        .orderBy("p_brand", "rk")
    )


# Streaming hourly top-k leaderboard: the windowed aggregate is a real
# watermarked streaming drain; the per-window rank is the batch
# serving step (a global rank is not append-mode maintainable — the
# split IS the production shape).  Same full-hash oracle as any batch
# query.
from data_pipeline_for_e_commerce_shop_spark.streaming.windowed import (  # noqa: E402
    stream_hourly_topk as _stream_hourly_topk,
)

register(
    "events_stream_hourly_topk",
    """
    WITH hourly AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
               AS hour_epoch,
             event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT hour_epoch, event_type, n_events,
           cents / 100.0 AS total_value, rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_epoch
                  ORDER BY cents DESC, event_type) AS rank
      FROM hourly
    )
    WHERE rank <= 3
    ORDER BY hour_epoch, rank
    """,
)(_stream_hourly_topk)


# ------- growth accounting / embedding drift / consolidation

# Growth accounting (the MAU ledger): every month's actives decompose
# into new + retained + resurrected, with churned counted against the
# month they went dark — the canonical subscription-health view.
# All set logic is (customer, month)-keyed joins; the first-month
# table is customer-sized.
@register(
    "customer_growth_accounting",
    """
    WITH activity AS (
      SELECT DISTINCT o_custkey,
             DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS m
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey, MIN(m) AS first_m FROM activity GROUP BY o_custkey
    ),
    flows AS (
      SELECT a.m,
             COUNT(*) AS n_active,
             CAST(SUM(CASE WHEN f.first_m = a.m THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN p.o_custkey IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN f.first_m < a.m AND p.o_custkey IS NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM activity a
      JOIN firsts f ON a.o_custkey = f.o_custkey
      LEFT JOIN activity p
        ON p.o_custkey = a.o_custkey
       AND p.m = a.m - INTERVAL 1 MONTH
      GROUP BY a.m
    ),
    churn AS (
      SELECT p.m + INTERVAL 1 MONTH AS m, COUNT(*) AS n_churned
      FROM activity p
      LEFT JOIN activity a
        ON a.o_custkey = p.o_custkey
       AND a.m = p.m + INTERVAL 1 MONTH
      WHERE a.o_custkey IS NULL
      GROUP BY p.m + INTERVAL 1 MONTH
    )
    SELECT CAST(f.m AS DATE) AS month, f.n_active, f.n_new,
           f.n_retained, f.n_resurrected,
           CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
    FROM flows f LEFT JOIN churn c ON f.m = c.m
    ORDER BY f.m
    """,
)
def customer_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting: actives = new + retained +
    resurrected (asserted by construction: the three CASEs partition
    each active row), churned joined from the previous month's
    lost-actives.  Two passes over the distinct (customer, month)
    activity set, all equi-joins on (custkey, month)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("m"),
    )
    activity = orders.distinct().localCheckpoint(eager=False)  # 3 uses
    firsts = activity.groupBy("o_custkey").agg(F.min("m").alias("first_m"))
    prev = activity.select(
        F.col("o_custkey").alias("p_cust"), F.col("m").alias("p_m")
    )
    flows = (
        activity.join(firsts, "o_custkey")
        .join(
            prev,
            (F.col("o_custkey") == F.col("p_cust"))
            & (F.col("p_m") == F.add_months(F.col("m"), -1)),
            "left",
        )
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(
                F.when(F.col("first_m") == F.col("m"), 1).otherwise(0)
            ).alias("n_new"),
            F.sum(
                F.when(F.col("p_cust").isNotNull(), 1).otherwise(0)
            ).alias("n_retained"),
            F.sum(
                F.when(
                    (F.col("first_m") < F.col("m"))
                    & F.col("p_cust").isNull(),
                    1,
                ).otherwise(0)
            ).alias("n_resurrected"),
        )
    )
    nxt = activity.select(
        F.col("o_custkey").alias("n_cust"), F.col("m").alias("n_m")
    )
    churn = (
        activity.join(
            nxt,
            (F.col("o_custkey") == F.col("n_cust"))
            & (F.col("n_m") == F.add_months(F.col("m"), 1)),
            "left",
        )
        .where(F.col("n_cust").isNull())
        .groupBy(F.add_months(F.col("m"), 1).alias("m"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        flows.join(churn, "m", "left")
        .select(
            F.col("m").alias("month"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
        .orderBy("month")
    )


# Embedding snapshot drift: centroid shift and mean-square-norm change
# per label between two corpus snapshots (vec_id parity stands in for
# time) — the model-monitoring gauge that catches representation
# drift before a recall cliff.  Same exact-integer sufficient-
# statistics discipline as embedding_label_separation.
@register(
    "embedding_snapshot_drift",
    """
    WITH ve AS (
      SELECT label, vec_id % 2 AS snap,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    longf AS (
      SELECT label, snap, u.i AS dim,
             CAST(floor(v[u.i] * 1000000) AS BIGINT) AS xi
      FROM ve CROSS JOIN UNNEST(range(1, len(v) + 1)) AS u(i)
    ),
    per_dim AS (
      SELECT label, snap, dim,
             CAST(SUM(xi) AS BIGINT) AS sd,
             CAST(SUM(xi * xi) AS BIGINT) AS sq
      FROM longf GROUP BY 1, 2, 3
    ),
    per AS (
      SELECT label, snap,
             list(sd ORDER BY dim) AS sds,
             CAST(SUM(sq) AS BIGINT) AS sqq
      FROM per_dim GROUP BY label, snap
    ),
    counts AS (
      SELECT label, vec_id % 2 AS snap, COUNT(*) AS n
      FROM embeddings GROUP BY 1, 2
    ),
    lab AS (
      SELECT p.label, p.snap, c.n, p.sds, p.sqq
      FROM per p JOIN counts c
        ON p.label = c.label AND p.snap = c.snap
    )
    SELECT o.label,
           o.n AS n_old, w.n AS n_new,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(o.sds) + 1), i ->
               (o.sds[i] / CAST(o.n AS DOUBLE)
                - w.sds[i] / CAST(w.n AS DOUBLE))
               * (o.sds[i] / CAST(o.n AS DOUBLE)
                  - w.sds[i] / CAST(w.n AS DOUBLE)))),
             (x, y) -> x + y) AS centroid_shift_sq,
           o.sqq / CAST(o.n AS DOUBLE) AS msq_old,
           w.sqq / CAST(w.n AS DOUBLE) AS msq_new
    FROM (SELECT * FROM lab WHERE snap = 0) o
    JOIN (SELECT * FROM lab WHERE snap = 1) w ON o.label = w.label
    ORDER BY o.label
    """,
)
def embedding_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid shift (squared L2, dim-ordered fold over
    exact int64 per-dim sums) and mean-square-norm change between the
    even/odd-vec_id snapshots.  One posexplode pass; everything after
    is |labels|-sized."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("snap"),
        "embedding",
    )
    longf = emb.select(
        "label",
        "snap",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("dim0", "xi"),
    )
    per_dim = longf.groupBy("label", "snap", "dim0").agg(
        F.sum("xi").alias("sd"), F.sum(F.col("xi") * F.col("xi")).alias("sq")
    )
    per = per_dim.groupBy("label", "snap").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim0, sd))), p -> p.sd)"
        ).alias("sds"),
        F.sum("sq").alias("sqq"),
    )
    counts = emb.groupBy("label", "snap").agg(F.count(F.lit(1)).alias("n"))
    lab = per.join(counts, ["label", "snap"])
    o = lab.where(F.col("snap") == 0).select(
        "label",
        F.col("n").alias("n_old"),
        F.col("sds").alias("so"),
        F.col("sqq").alias("qo"),
    )
    w = lab.where(F.col("snap") == 1).select(
        "label",
        F.col("n").alias("n_new"),
        F.col("sds").alias("sw"),
        F.col("sqq").alias("qw"),
    )
    return (
        o.join(w, "label")
        .select(
            "label",
            "n_old",
            "n_new",
            F.expr(
                "aggregate(sequence(1, size(so)), CAST(0.0 AS DOUBLE),"
                " (acc, i) -> acc"
                " + (element_at(so, i) / CAST(n_old AS DOUBLE)"
                "    - element_at(sw, i) / CAST(n_new AS DOUBLE))"
                " * (element_at(so, i) / CAST(n_old AS DOUBLE)"
                "    - element_at(sw, i) / CAST(n_new AS DOUBLE)))"
            ).alias("centroid_shift_sq"),
            (F.col("qo") / F.col("n_old").cast("double")).alias("msq_old"),
            (F.col("qw") / F.col("n_new").cast("double")).alias("msq_new"),
        )
        .orderBy("label")
    )


# Shipment consolidation: lines of one order shipping within 7 days of
# each other could share a box — the gap-clustering (sessionize-on-
# dates) savings estimate, rolled up by order priority.
CONSOLIDATION_GAP_DAYS = 7


@register(
    "shipment_consolidation",
    f"""
    WITH lines AS (
      SELECT l_orderkey, o_orderpriority,
             CAST(l_shipdate AS DATE) AS sd
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    marked AS (
      SELECT l_orderkey, o_orderpriority, sd,
             CASE WHEN date_diff('day',
                    lag(sd) OVER (PARTITION BY l_orderkey ORDER BY sd),
                    sd) > {CONSOLIDATION_GAP_DAYS}
                  THEN 1 ELSE 0 END AS new_batch
      FROM (SELECT DISTINCT l_orderkey, o_orderpriority, sd FROM lines)
    ),
    per_order AS (
      SELECT l_orderkey, o_orderpriority,
             COUNT(*) AS n_ship_days,
             CAST(SUM(new_batch) AS BIGINT) + 1 AS n_batches
      FROM marked GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(n_ship_days) AS BIGINT) AS total_ship_days,
           CAST(SUM(n_batches) AS BIGINT) AS total_batches,
           (CAST(SUM(n_ship_days) AS BIGINT) - CAST(SUM(n_batches) AS BIGINT))
             * 1000000 // CAST(SUM(n_ship_days) AS BIGINT) AS saved_ppm
    FROM per_order
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def shipment_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidation-savings estimate: distinct ship dates per order
    gap-clustered at 7 days (the sessionizer pattern on dates, keyed
    per order), batches vs ship-days rolled up by priority with exact
    ppm savings."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "o_orderpriority", "sd")
        .distinct()
    )
    w = Window.partitionBy("l_orderkey").orderBy("sd")
    marked = lines.withColumn(
        "new_batch",
        F.when(
            F.datediff("sd", F.lag("sd").over(w)) > CONSOLIDATION_GAP_DAYS, 1
        ).otherwise(0),
    )
    per_order = marked.groupBy("l_orderkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_ship_days"),
        (F.sum("new_batch") + 1).alias("n_batches"),
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_ship_days").alias("total_ship_days"),
            F.sum("n_batches").alias("total_batches"),
            F.expr(
                "(sum(n_ship_days) - sum(n_batches)) * 1000000"
                " div sum(n_ship_days)"
            ).alias("saved_ppm"),
        )
        .orderBy("o_orderpriority")
    )


# ------- hazard by depth / vocab growth / concentration / curve

# Discrete hazard of conversion by session depth: P(first purchase at
# step k | session reached step k) — the funnel view that tells you
# WHERE in a session intent dies, not just whether.  Composes the
# sessionizer's rank machinery; all rates exact ppm.
@register(
    "session_depth_hazard",
    """
    WITH marked AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                       > 90
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY epoch_sec, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    ),
    ranked AS (
      SELECT user_id, session_no, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_no
               ORDER BY epoch_sec, event_id) AS rk
      FROM numbered
    ),
    sess AS (
      SELECT user_id, session_no,
             COUNT(*) AS depth,
             MIN(CASE WHEN event_type = 'purchase' THEN rk END) AS conv_rk
      FROM ranked GROUP BY 1, 2
    ),
    steps AS (
      SELECT CAST(u.k AS BIGINT) AS step,
             COUNT(*) AS n_reached,
             CAST(SUM(CASE WHEN s.conv_rk = u.k THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_converted
      FROM sess s
      CROSS JOIN UNNEST(range(1, 9)) AS u(k)
      WHERE (CASE WHEN s.conv_rk IS NULL THEN s.depth
                  ELSE s.conv_rk END) >= u.k
      GROUP BY u.k
    )
    SELECT step, n_reached, n_converted,
           n_converted * 1000000 // n_reached AS hazard_ppm
    FROM steps
    ORDER BY step
    """,
)
def session_depth_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step conversion hazard over gap sessions (steps 1..8): a
    session is 'at risk' at step k while it has neither converted nor
    ended before k; the hazard is first-purchase-at-k over at-risk
    count, exact ppm.  One user shuffle for the sessionizer; the step
    fan-out is a fixed 8-row vocabulary."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(sec.asc(), F.col("event_id").asc())
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        sec.alias("epoch_sec"),
        F.when((sec - F.lag(sec).over(w)) > 90, 1).otherwise(0).alias(
            "new_session"
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn("session_no", F.sum("new_session").over(w2))
    w3 = Window.partitionBy("user_id", "session_no").orderBy(
        "epoch_sec", "event_id"
    )
    ranked = numbered.withColumn("rk", F.row_number().over(w3))
    sess = ranked.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("depth"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rk"))
        ).alias("conv_rk"),
    )
    steps = (
        sess.select(
            F.coalesce("conv_rk", F.col("depth")).alias("horizon"),
            "conv_rk",
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("step"),
        )
        .where(F.col("horizon") >= F.col("step"))
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum(
                F.when(F.col("conv_rk") == F.col("step"), 1).otherwise(0)
            ).alias("n_converted"),
        )
    )
    return steps.select(
        "step",
        "n_reached",
        "n_converted",
        F.expr("n_converted * 1000000 div n_reached").alias("hazard_ppm"),
    ).orderBy("step")


# Vocabulary growth (Heaps' law audit): distinct-type count vs
# cumulative token count at doc-id checkpoints.  The trick that makes
# it one pass: a token's FIRST document (min doc_id) decides when it
# enters the vocabulary, so vocab(d) is a running count over the
# first-occurrence table — no distinct-over-prefix rescans.
@register(
    "corpus_vocab_growth",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    firsts AS (
      SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM toks GROUP BY tok
    ),
    checkpoints AS (
      SELECT CAST(u.c AS BIGINT) * (SELECT MAX(doc_id) FROM documents)
               // 10 AS cp
      FROM UNNEST(range(1, 11)) AS u(c)
    ),
    vocab AS (
      SELECT c.cp, COUNT(*) AS n_types
      FROM checkpoints c JOIN firsts f ON f.first_doc <= c.cp
      GROUP BY c.cp
    ),
    doc_counts AS (
      SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id
    ),
    volume AS (
      SELECT c.cp, CAST(SUM(d.n) AS BIGINT) AS n_tokens
      FROM checkpoints c JOIN doc_counts d ON d.doc_id <= c.cp
      GROUP BY c.cp
    )
    SELECT v.cp AS doc_id_ceiling, vol.n_tokens, v.n_types,
           v.n_types * 1000000 // vol.n_tokens AS type_token_ppm
    FROM vocab v JOIN volume vol ON v.cp = vol.cp
    ORDER BY v.cp
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve at ten doc-id checkpoints:
    token first-occurrence table (one groupBy) + checkpoint range
    joins against the 10-row broadcast checkpoint set — sublinear
    type growth falls straight out, with the type/token ratio in
    exact ppm.  No prefix rescans: first_doc <= cp does the running
    count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).localCheckpoint(eager=False)  # feeds firsts AND volume
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    maxdoc = docs.agg(F.max("doc_id").alias("md"))
    checkpoints = (
        maxdoc.select(
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("c"), "md"
        )
        .select(F.expr("CAST(c * md div 10 AS BIGINT)").alias("cp"))
    )
    vocab = (
        firsts.crossJoin(F.broadcast(checkpoints))
        .where(F.col("first_doc") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).alias("n_types"))
    )
    doc_counts = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    volume = (
        doc_counts.crossJoin(F.broadcast(checkpoints))
        .where(F.col("doc_id") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.sum("n").alias("n_tokens"))
    )
    return (
        vocab.join(volume, "cp")
        .select(
            F.col("cp").alias("doc_id_ceiling"),
            "n_tokens",
            "n_types",
            F.expr("n_types * 1000000 div n_tokens").alias(
                "type_token_ppm"
            ),
        )
        .orderBy("doc_id_ceiling")
    )


# Revenue concentration curve: cumulative revenue share by customer
# spend decile — the explicit Lorenz curve behind revenue_gini's one
# number ("the top 10% drive X% of revenue").
@register(
    "revenue_concentration_curve",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM spend
    ),
    per AS (
      SELECT decile, COUNT(*) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM ranked GROUP BY decile
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per)
    SELECT decile, n_customers,
           cents / 100.0 AS revenue,
           cents * 1000000 // total AS share_ppm,
           CAST(SUM(cents) OVER (ORDER BY decile
             ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000 // total
             AS cum_share_ppm
    FROM per CROSS JOIN tot
    ORDER BY decile
    """,
)
def revenue_concentration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz/concentration table by spend decile (key-tiebroken ntile
    on the customer-reduced table): per-decile and cumulative revenue
    shares in exact ppm — the curve revenue_gini integrates."""
    from pyspark.sql import Window

    spend = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    ranked = spend.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.col("cents").desc(), "o_custkey")),
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("cents"),
    )
    tot = per.agg(F.sum("cents").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            (F.col("cents") / 100.0).alias("revenue"),
            F.expr("cents * 1000000 div total").alias("share_ppm"),
            F.expr(
                "CAST(sum(cents) OVER (ORDER BY decile"
                " ROWS UNBOUNDED PRECEDING) * 1000000 div total"
                " AS BIGINT)"
            ).alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


# Size-price curve: median price and IQR per part size — the
# monotonicity check a pricing team runs on an attribute ladder.
@register(
    "size_price_curve",
    """
    SELECT p_size,
           COUNT(*) AS n_parts,
           CAST(percentile_disc(0.25) WITHIN GROUP (
             ORDER BY CAST(floor(p_retailprice * 100) AS BIGINT))
             AS BIGINT) / 100.0 AS p25,
           CAST(percentile_disc(0.50) WITHIN GROUP (
             ORDER BY CAST(floor(p_retailprice * 100) AS BIGINT))
             AS BIGINT) / 100.0 AS median_price,
           CAST(percentile_disc(0.75) WITHIN GROUP (
             ORDER BY CAST(floor(p_retailprice * 100) AS BIGINT))
             AS BIGINT) / 100.0 AS p75
    FROM part
    GROUP BY p_size
    ORDER BY p_size
    """,
)
def size_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR price ladder by part size: grouped exact discrete
    percentiles over integer cents, one dim scan."""
    p = load_table(spark, sf_dir, "part").select(
        "p_size",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    def pct(q, name):
        return F.expr(
            f"cast(percentile_disc({q}) within group (order by cents)"
            f" as bigint) / 100.0"
        ).alias(name)
    return (
        p.groupBy("p_size")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            pct(0.25, "p25"),
            pct(0.50, "median_price"),
            pct(0.75, "p75"),
        )
        .orderBy("p_size")
    )


# --------- filter agreement / cluster sizes / dedup length bias

# Do two independent quality filters agree?  2x2 confusion of the
# heuristic gate vs the unigram-CE perplexity proxy, with observed
# agreement and Cohen's kappa — the calibration every multi-filter
# pipeline owes itself before AND-ing its gates.  Kappa is a fixed-
# order double from four exact integer counts.
@register(
    "filter_agreement_matrix",
    f"""
    WITH qg AS ({ORACLES["text_quality_gate"]}),
    uce AS ({ORACLES["text_unigram_ce"]}),
    cells AS (
      SELECT CAST(SUM(CASE WHEN qg.keep AND uce.keep THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_keep,
             CAST(SUM(CASE WHEN qg.keep AND NOT uce.keep THEN 1 ELSE 0 END)
                  AS BIGINT) AS gate_only,
             CAST(SUM(CASE WHEN NOT qg.keep AND uce.keep THEN 1 ELSE 0 END)
                  AS BIGINT) AS ce_only,
             CAST(SUM(CASE WHEN NOT qg.keep AND NOT uce.keep
                  THEN 1 ELSE 0 END) AS BIGINT) AS both_drop,
             COUNT(*) AS n
      FROM qg JOIN uce ON qg.doc_id = uce.doc_id
    )
    SELECT both_keep, gate_only, ce_only, both_drop, n,
           (both_keep + both_drop) * 1000000 // n AS agreement_ppm,
           ((CAST(both_keep + both_drop AS DOUBLE) / n)
            - ((CAST(both_keep + gate_only AS DOUBLE) / n)
               * (CAST(both_keep + ce_only AS DOUBLE) / n)
               + (CAST(ce_only + both_drop AS DOUBLE) / n)
                 * (CAST(gate_only + both_drop AS DOUBLE) / n)))
           / (1.0 - ((CAST(both_keep + gate_only AS DOUBLE) / n)
                     * (CAST(both_keep + ce_only AS DOUBLE) / n)
                     + (CAST(ce_only + both_drop AS DOUBLE) / n)
                       * (CAST(gate_only + both_drop AS DOUBLE) / n)))
             AS cohen_kappa
    FROM cells
    """,
)
def filter_agreement_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between the heuristic quality gate and the
    unigram-CE screen: one doc-keyed join of the two per-doc verdicts,
    four-cell confusion, observed agreement in exact ppm, Cohen's
    kappa from the same exact counts in one fixed expression order."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        quality_gate,
        unigram_cross_entropy,
    )

    qg = quality_gate(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("gate_keep")
    )
    uce = unigram_cross_entropy(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("ce_keep")
    )
    cells = qg.join(uce, "doc_id").agg(
        F.sum(
            F.when(F.col("gate_keep") & F.col("ce_keep"), 1).otherwise(0)
        ).alias("both_keep"),
        F.sum(
            F.when(F.col("gate_keep") & ~F.col("ce_keep"), 1).otherwise(0)
        ).alias("gate_only"),
        F.sum(
            F.when(~F.col("gate_keep") & F.col("ce_keep"), 1).otherwise(0)
        ).alias("ce_only"),
        F.sum(
            F.when(~F.col("gate_keep") & ~F.col("ce_keep"), 1).otherwise(0)
        ).alias("both_drop"),
        F.count(F.lit(1)).alias("n"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("both_keep") + F.col("both_drop")).cast("double") / nd
    pe = (
        ((F.col("both_keep") + F.col("gate_only")).cast("double") / nd)
        * ((F.col("both_keep") + F.col("ce_only")).cast("double") / nd)
        + ((F.col("ce_only") + F.col("both_drop")).cast("double") / nd)
        * ((F.col("gate_only") + F.col("both_drop")).cast("double") / nd)
    )
    return cells.select(
        "both_keep",
        "gate_only",
        "ce_only",
        "both_drop",
        "n",
        F.expr(
            "(both_keep + both_drop) * 1000000 div n"
        ).alias("agreement_ppm"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("cohen_kappa"),
    )


# Duplicate-cluster size histogram: how duplication mass distributes —
# many pairs or a few giant blobs decide which dedup strategy pays.
@register(
    "dedup_cluster_sizes",
    _CLOSURE_CTES
    + """
    , labels AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS cluster_size
      FROM labels GROUP BY cluster_id
    )
    SELECT cluster_size, COUNT(*) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over the LSH connected components
    (clusters of size ≥ 2 only — singletons never enter the closure):
    sizes from one groupBy over the labels, histogram from a second."""
    all_labels = dedup.duplicate_clusters(spark, sf_dir).localCheckpoint(
        eager=False
    )  # the iterative star contraction runs ONCE
    sizes = (
        all_labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .where(F.col("cluster_size") >= 2)
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


# Dedup length-bias audit: does keep-one-per-cluster systematically
# drop longer or shorter documents?  Kept vs dropped doc counts per
# log2 token-length bucket — all integers, no score doubles.
@register(
    "dedup_length_bias",
    _CLOSURE_CTES
    + """
    , labels AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    qual AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    member AS (
      SELECT l.cluster_id, l.doc_id, q.n_tokens
      FROM labels l JOIN qual q ON l.doc_id = q.doc_id
    ),
    reps AS (
      SELECT cluster_id,
             MIN(doc_id) AS rep_doc_id
      FROM member GROUP BY cluster_id
    ),
    verdicts AS (
      SELECT m.doc_id, m.n_tokens,
             m.doc_id = r.rep_doc_id AS kept
      FROM member m JOIN reps r ON m.cluster_id = r.cluster_id
    )
    SELECT CAST(floor(log2(n_tokens)) AS BIGINT) AS len_bucket,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped
    FROM verdicts
    WHERE n_tokens > 0
    GROUP BY 1
    ORDER BY 1
    """,
)
def dedup_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bias audit of cluster dedup: within every duplicate
    cluster the min-doc_id member stands in as the kept rep (the
    deterministic tie-break; quality election is dedup_cluster_reps'
    business), and kept/dropped counts are bucketed by log2 token
    length.  A skew here means dedup is reshaping the length
    distribution — the audit LLM data teams run after every dedup
    pass."""
    labels = dedup.duplicate_clusters(spark, sf_dir).localCheckpoint(
        eager=False
    )  # feeds sizes AND membership — contraction runs once
    clustered = labels.join(
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .where(F.col("sz") >= 2)
        .select("cluster_id"),
        "cluster_id",
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    member = clustered.join(docs, "doc_id")
    reps = member.groupBy("cluster_id").agg(
        F.min("doc_id").alias("rep_doc_id")
    )
    verdicts = member.join(reps, "cluster_id").select(
        "n_tokens", (F.col("doc_id") == F.col("rep_doc_id")).alias("kept")
    )
    return (
        verdicts.where(F.col("n_tokens") > 0)
        .groupBy(
            F.floor(F.log2("n_tokens")).cast("long").alias("len_bucket")
        )
        .agg(
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_dropped"),
        )
        .orderBy("len_bucket")
    )


# --------- peak concurrency / revenue bridge / dow-hour heatmap

# Peak concurrency: the maximum number of simultaneously-open gap
# sessions per day — the capacity number an ops team sizes servers
# with.  Sweep line in SQL: +1 at session start, -1 after session end,
# running sum ordered by (time, -delta) so closings at t apply before
# openings at t (touching sessions don't double-count).  The window
# partitions by day: sessions are intra-day objects here (the 90 s
# gap makes cross-midnight sessions vanishingly rare; the boundary
# convention is documented and identical on both engines).
@register(
    "events_peak_concurrency",
    """
    WITH marked AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                       > 90
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY epoch_sec, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    ),
    sess AS (
      SELECT user_id, session_no,
             MIN(epoch_sec) AS s0, MAX(epoch_sec) AS s1
      FROM numbered GROUP BY 1, 2
    ),
    sweep AS (
      SELECT s0 // 86400 AS day_epoch, s0 AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT s0 // 86400, s1 + 1, -1 FROM sess
    ),
    running AS (
      SELECT day_epoch, t,
             CAST(SUM(delta) OVER (PARTITION BY day_epoch
               ORDER BY t, delta
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_now
      FROM sweep
    )
    SELECT day_epoch,
           CAST(MAX(open_now) AS BIGINT) AS peak_concurrent,
           CAST(MIN(CASE WHEN open_now = mx THEN t END) AS BIGINT)
             AS first_peak_epoch
    FROM (
      SELECT r.*, MAX(open_now) OVER (PARTITION BY day_epoch) AS mx
      FROM running r
    )
    GROUP BY day_epoch
    ORDER BY day_epoch
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak simultaneous sessions via the sweep line: sessions
    from the 90 s gap sessionizer, +1/-1 deltas (close-before-open at
    ties via ORDER BY t, delta — -1 sorts first), day-partitioned
    running sum, per-day argmax with earliest-time tie-break."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(sec.asc(), F.col("event_id").asc())
    marked = ev.select(
        "user_id",
        "event_id",
        sec.alias("epoch_sec"),
        F.when((sec - F.lag(sec).over(w)) > 90, 1).otherwise(0).alias(
            "new_session"
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn("session_no", F.sum("new_session").over(w2))
    sess = numbered.groupBy("user_id", "session_no").agg(
        F.min("epoch_sec").alias("s0"), F.max("epoch_sec").alias("s1")
    )
    starts = sess.select(
        F.expr("s0 div 86400").alias("day_epoch"),
        F.col("s0").alias("t"),
        F.lit(1).alias("delta"),
    )
    ends = sess.select(
        F.expr("s0 div 86400").alias("day_epoch"),
        (F.col("s1") + 1).alias("t"),
        F.lit(-1).alias("delta"),
    )
    sweep = starts.unionByName(ends)
    w3 = (
        Window.partitionBy("day_epoch")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = sweep.withColumn("open_now", F.sum("delta").over(w3))
    w4 = Window.partitionBy("day_epoch")
    return (
        running.withColumn("mx", F.max("open_now").over(w4))
        .groupBy("day_epoch")
        .agg(
            F.max("open_now").alias("peak_concurrent"),
            F.min(
                F.when(F.col("open_now") == F.col("mx"), F.col("t"))
            ).alias("first_peak_epoch"),
        )
        .orderBy("day_epoch")
    )


# Revenue bridge: month-over-month change decomposed into price,
# volume, and cross effects on the matched-part basket, with new and
# exited parts as explicit residual buckets — Σ effects == Δ revenue
# EXACTLY (every term is integer cent-units; the identity
# p1q1 − p0q0 = (p1−p0)q0 + p0(q1−q0) + (p1−p0)(q1−q0) holds in
# integers).  The finance "walk" behind category_price_index.
@register(
    "revenue_bridge",
    """
    WITH pm AS (
      SELECT DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS month,
             l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      GROUP BY 1, 2
    ),
    paired AS (
      SELECT COALESCE(c.month, p.month + INTERVAL 1 MONTH) AS month,
             COALESCE(c.l_partkey, p.l_partkey) AS l_partkey,
             c.cents AS c1, c.qty AS q1,
             p.cents AS c0, p.qty AS q0
      FROM pm c
      FULL OUTER JOIN pm p
        ON c.l_partkey = p.l_partkey
       AND c.month = p.month + INTERVAL 1 MONTH
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(SUM(CASE WHEN c1 IS NOT NULL AND c0 IS NOT NULL
                THEN ((c1 // q1) - (c0 // q0)) * q0 ELSE 0 END)
                AS BIGINT) / 100.0 AS price_effect,
           CAST(SUM(CASE WHEN c1 IS NOT NULL AND c0 IS NOT NULL
                THEN (c0 // q0) * (q1 - q0) ELSE 0 END)
                AS BIGINT) / 100.0 AS volume_effect,
           CAST(SUM(CASE WHEN c1 IS NOT NULL AND c0 IS NOT NULL
                THEN ((c1 // q1) - (c0 // q0)) * (q1 - q0)
                     + (c1 - (c1 // q1) * q1) - (c0 - (c0 // q0) * q0)
                ELSE 0 END) AS BIGINT) / 100.0 AS cross_effect,
           CAST(SUM(CASE WHEN c0 IS NULL THEN c1 ELSE 0 END)
                AS BIGINT) / 100.0 AS new_parts,
           CAST(SUM(CASE WHEN c1 IS NULL THEN -c0 ELSE 0 END)
                AS BIGINT) / 100.0 AS exited_parts,
           CAST(SUM(COALESCE(c1, 0)) - SUM(COALESCE(c0, 0)) AS BIGINT)
             / 100.0 AS total_change
    FROM paired
    WHERE month IS NOT NULL
    GROUP BY month
    ORDER BY month
    """,
)
def revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue walk per part basket: price / volume /
    cross effects on matched parts (floored integer unit prices; the
    sub-cent floor residual folds into the cross term so the five
    effects sum to the total change EXACTLY), plus new/exited part
    buckets.  One (part, month) rollup, one self full-outer join on
    the shifted month."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.trunc(F.col("l_shipdate").cast("date"), "MM").alias("month"),
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    pm = li.groupBy("month", "l_partkey").agg(
        F.sum("cents").alias("cents"), F.sum("qty").alias("qty")
    ).localCheckpoint(eager=False)  # both sides of the shifted join
    c = pm.select(
        F.col("month").alias("cm"),
        F.col("l_partkey").alias("ck"),
        F.col("cents").alias("c1"),
        F.col("qty").alias("q1"),
    )
    prv = pm.select(
        F.add_months(F.col("month"), 1).alias("pm_next"),
        F.col("l_partkey").alias("pk"),
        F.col("cents").alias("c0"),
        F.col("qty").alias("q0"),
    )
    paired = c.join(
        prv,
        (F.col("ck") == F.col("pk")) & (F.col("cm") == F.col("pm_next")),
        "full_outer",
    ).select(
        F.coalesce("cm", "pm_next").alias("month"),
        "c1",
        "q1",
        "c0",
        "q0",
    ).where(F.col("month").isNotNull())
    matched = F.col("c1").isNotNull() & F.col("c0").isNotNull()
    u1 = F.expr("c1 div q1")
    u0 = F.expr("c0 div q0")
    return (
        paired.groupBy("month")
        .agg(
            (
                F.sum(F.when(matched, (u1 - u0) * F.col("q0")).otherwise(0))
                / 100.0
            ).alias("price_effect"),
            (
                F.sum(
                    F.when(matched, u0 * (F.col("q1") - F.col("q0"))).otherwise(0)
                )
                / 100.0
            ).alias("volume_effect"),
            (
                F.sum(
                    F.when(
                        matched,
                        (u1 - u0) * (F.col("q1") - F.col("q0"))
                        + (F.col("c1") - u1 * F.col("q1"))
                        - (F.col("c0") - u0 * F.col("q0")),
                    ).otherwise(0)
                )
                / 100.0
            ).alias("cross_effect"),
            (
                F.sum(F.when(F.col("c0").isNull(), F.col("c1")).otherwise(0))
                / 100.0
            ).alias("new_parts"),
            (
                F.sum(F.when(F.col("c1").isNull(), -F.col("c0")).otherwise(0))
                / 100.0
            ).alias("exited_parts"),
            (
                (F.sum(F.coalesce("c1", F.lit(0))) - F.sum(F.coalesce("c0", F.lit(0))))
                / 100.0
            ).alias("total_change"),
        )
        .orderBy("month")
    )


# Weekday x hour traffic heatmap: the ops dashboard grid, exact
# integer cells (one scan, one groupBy).
@register(
    "events_dow_hour_heatmap",
    """
    SELECT dayofweek(CAST(ts AS DATE)) AS weekday,
           CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday x hour event-count/value grid (DuckDB dayofweek is
    0=Sunday; Spark's is 1=Sunday — reconciled with -1).  One scan,
    one vocabulary-sized groupBy."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek(F.col("ts").cast("date")) - 1).alias("weekday"),
            F.expr("unix_timestamp(ts) % 86400 div 3600").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 100).cast("long")) / 100.0
            ).alias("total_value"),
        )
        .orderBy("weekday", "hour")
    )


# ------ SLA attainment / reorder intervals / adjusted outliers

# Priority SLA attainment: each order's LAST line must ship within its
# priority's SLA window; attainment in exact ppm per priority.  SLA
# days interpolate from one dict into operator and oracle alike.
PRIORITY_SLA_DAYS = {
    "1-URGENT": 30,
    "2-HIGH": 60,
    "3-MEDIUM": 90,
    "4-NOT SPECIFIED": 120,
    "5-LOW": 180,
}


@register(
    "order_priority_sla",
    f"""
    WITH per_order AS (
      SELECT o_orderkey, o_orderpriority,
             date_diff('day', CAST(o_orderdate AS DATE),
                       MAX(CAST(l_shipdate AS DATE))) AS lag_days
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2, CAST(o_orderdate AS DATE)
    ),
    scored AS (
      SELECT o_orderpriority, lag_days,
             CASE o_orderpriority
               {" ".join(f"WHEN '{k}' THEN {v}"
                          for k, v in PRIORITY_SLA_DAYS.items())}
             END AS sla_days
      FROM per_order
    )
    SELECT o_orderpriority, sla_days,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN lag_days <= sla_days THEN 1 ELSE 0 END)
                AS BIGINT) AS n_met,
           CAST(SUM(CASE WHEN lag_days <= sla_days THEN 1 ELSE 0 END)
                AS BIGINT) * 1000000 // COUNT(*) AS attainment_ppm
    FROM scored
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def order_priority_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA attainment per order priority: completion = the order's
    latest line-ship date, window from PRIORITY_SLA_DAYS (one shared
    constant drives both engines), attainment in exact ppm."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "od")
        .agg(F.max("sd").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff("last_ship", "od").alias("lag_days"),
        )
    )
    sla = F.create_map(
        *[
            x
            for k, v in PRIORITY_SLA_DAYS.items()
            for x in (F.lit(k), F.lit(v))
        ]
    )[F.col("o_orderpriority")]
    met = F.col("lag_days") <= F.col("sla_days")
    return (
        per_order.withColumn("sla_days", sla)
        .groupBy("o_orderpriority", "sla_days")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(met, 1).otherwise(0)).alias("n_met"),
            F.expr(
                "sum(CASE WHEN lag_days <= sla_days THEN 1 ELSE 0 END)"
                " * 1000000 div count(1)"
            ).alias("attainment_ppm"),
        )
        .orderBy("o_orderpriority")
    )


# Repeat-purchase cadence: the distribution of days between a
# customer's consecutive orders, profiled per market segment — the
# replenishment-cycle input to any reorder-reminder feature.
@register(
    "reorder_interval_profile",
    """
    WITH seq AS (
      SELECT c_mktsegment,
             date_diff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment,
           COUNT(gap_days) AS n_intervals,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)
                AS BIGINT) AS median_gap,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_days)
                AS BIGINT) AS p90_gap,
           CAST(SUM(CASE WHEN gap_days = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_day
    FROM seq
    WHERE gap_days IS NOT NULL
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def reorder_interval_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days-between-orders profile per segment: customer-partitioned
    lag (key-tiebroken by orderkey for same-day orders), grouped
    exact discrete percentiles + same-day counts."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    seq = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("gap_days", F.datediff("od", F.lag("od").over(w)))
        .where(F.col("gap_days").isNotNull())
    )
    return (
        seq.groupBy("c_mktsegment")
        .agg(
            F.count("gap_days").alias("n_intervals"),
            F.expr(
                "cast(percentile_disc(0.5) within group"
                " (order by gap_days) as bigint)"
            ).alias("median_gap"),
            F.expr(
                "cast(percentile_disc(0.9) within group"
                " (order by gap_days) as bigint)"
            ).alias("p90_gap"),
            F.sum(
                F.when(F.col("gap_days") == 0, 1).otherwise(0)
            ).alias("n_same_day"),
        )
        .orderBy("c_mktsegment")
    )


# Seasonality-adjusted anomalies: daily counts scored against the SAME
# WEEKDAY's median and MAD — the screen that stops flagging every
# weekend as an outage.  Composes the weekday profile with the robust
# MAD fence, all integers.
@register(
    "events_weekday_adjusted_outliers",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) AS wd,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    ref AS (
      SELECT event_type, wd,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
                  AS BIGINT) AS med
      FROM daily GROUP BY 1, 2
    ),
    dev AS (
      SELECT d.event_type, d.day, d.wd, d.n, r.med,
             ABS(d.n - r.med) AS adev
      FROM daily d JOIN ref r
        ON d.event_type = r.event_type AND d.wd = r.wd
    ),
    mad AS (
      SELECT event_type, wd,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)
                  AS BIGINT) AS mad
      FROM dev GROUP BY 1, 2
    )
    SELECT d.event_type, CAST(d.day AS DATE) AS day, d.n, d.med,
           m.mad,
           ABS(d.n - d.med) > 3 * m.mad AS is_outlier
    FROM dev d JOIN mad m
      ON d.event_type = m.event_type AND d.wd = m.wd
    WHERE ABS(d.n - d.med) > 3 * m.mad AND m.mad > 0
    ORDER BY d.event_type, d.day
    """,
)
def events_weekday_adjusted_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekday-conditioned MAD outliers on daily counts: per (type,
    weekday) median + MAD (exact discrete percentiles over integers),
    3-MAD fence, zero-MAD cells excluded (a degenerate fence flags
    everything).  Both percentile passes run on the |types|x7-keyed
    daily rollup — vocabulary-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    daily = ev.groupBy(
        "event_type", "day", F.dayofweek("day").alias("wd_s")
    ).agg(F.count(F.lit(1)).alias("n"))
    # NOTE Spark dayofweek is 1=Sunday vs DuckDB 0=Sunday; the weekday
    # only KEYS the reference groups (it never appears in the output),
    # so the off-by-one origin is irrelevant as long as it is a
    # bijection — both engines group the same days together.
    ref = daily.groupBy("event_type", "wd_s").agg(
        F.expr(
            "cast(percentile_disc(0.5) within group (order by n) as bigint)"
        ).alias("med")
    )
    dev = daily.join(ref, ["event_type", "wd_s"]).withColumn(
        "adev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type", "wd_s").agg(
        F.expr(
            "cast(percentile_disc(0.5) within group (order by adev)"
            " as bigint)"
        ).alias("mad")
    )
    return (
        dev.join(mad, ["event_type", "wd_s"])
        .where(
            (F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad"))
            & (F.col("mad") > 0)
        )
        .select(
            "event_type",
            "day",
            "n",
            "med",
            "mad",
            (F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad")).alias(
                "is_outlier"
            ),
        )
        .orderBy("event_type", "day")
    )


# Order quadrant segmentation: every order placed in the 2x2 grid of
# (lines vs median, value vs median) — the merchandising view of
# basket size against basket value.
@register(
    "basket_size_value_quadrants",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY l_orderkey
    ),
    med AS (
      SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_lines)
                  AS BIGINT) AS med_lines,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                  AS BIGINT) AS med_cents
      FROM per_order
    )
    SELECT CASE WHEN n_lines > med_lines THEN 'many_lines'
                ELSE 'few_lines' END AS lines_half,
           CASE WHEN cents > med_cents THEN 'high_value'
                ELSE 'low_value' END AS value_half,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS revenue
    FROM per_order CROSS JOIN med
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def basket_size_value_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 order segmentation against the median line count and median
    value (exact discrete medians, 1-row broadcast): counts and
    revenue per quadrant."""
    per_order = load_table(spark, sf_dir, "lineitem").groupBy(
        "l_orderkey"
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    med = per_order.agg(
        F.expr(
            "cast(percentile_disc(0.5) within group (order by n_lines)"
            " as bigint)"
        ).alias("med_lines"),
        F.expr(
            "cast(percentile_disc(0.5) within group (order by cents)"
            " as bigint)"
        ).alias("med_cents"),
    )
    return (
        per_order.crossJoin(F.broadcast(med))
        .groupBy(
            F.when(F.col("n_lines") > F.col("med_lines"), "many_lines")
            .otherwise("few_lines")
            .alias("lines_half"),
            F.when(F.col("cents") > F.col("med_cents"), "high_value")
            .otherwise("low_value")
            .alias("value_half"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("cents") / 100.0).alias("revenue"),
        )
        .orderBy("lines_half", "value_half")
    )


# --------------- bot screen / XYZ classes / p-chart SPC

# Abuse/bot screen: per user, the burst ceiling (max events in any
# sliding minute) and gap repetitiveness (repeated inter-arrival gaps
# — a scripted client reuses the same cadence).  The synthetic stream
# is organically human (max 2/min, ~98% distinct gaps), so a hard
# filter is vacuous at every SF; the screen therefore RANKS — top-20
# most suspicious users by (burst ceiling, repeated-gap count), fully
# tie-broken — with the boolean flags riding as columns for the
# thresholds a production stream would trip.
BOT_BURST_LIMIT = 5      # events per minute
BOT_MIN_EVENTS = 8       # don't judge thin histories


@register(
    "user_bot_screen",
    f"""
    WITH ev AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    windowed AS (
      SELECT user_id, sec,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS in_minute,
             sec - lag(sec) OVER (PARTITION BY user_id
               ORDER BY sec, event_id) AS gap
      FROM ev
    ),
    per_user AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             CAST(MAX(in_minute) AS BIGINT) AS max_per_minute,
             COUNT(DISTINCT gap) AS n_distinct_gaps,
             COUNT(gap) AS n_gaps
      FROM windowed GROUP BY user_id
    )
    SELECT user_id, n_events, max_per_minute,
           n_distinct_gaps, n_gaps,
           n_gaps - n_distinct_gaps AS n_repeated_gaps,
           max_per_minute > {{BOT_BURST_LIMIT}} AS burst_flag,
           n_distinct_gaps * 4 <= n_gaps AS periodic_flag
    FROM per_user
    WHERE n_events >= {{BOT_MIN_EVENTS}}
    ORDER BY max_per_minute DESC, n_gaps - n_distinct_gaps DESC, user_id
    LIMIT 20
    """.format(BOT_BURST_LIMIT=BOT_BURST_LIMIT, BOT_MIN_EVENTS=BOT_MIN_EVENTS),
)
def user_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bot-suspicion ranking: sliding-minute burst ceiling
    (RANGE window over epoch seconds) and repeated-gap counts per
    user (≥8 events), ordered (burst desc, repeats desc, user_id) so
    LIMIT is deterministic; threshold flags ride as columns.  One
    user-keyed window pass, one rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-59, Window.currentRow)
    )
    w_lag = Window.partitionBy("user_id").orderBy("sec", "event_id")
    windowed = ev.select(
        "user_id",
        F.count(F.lit(1)).over(w_range).alias("in_minute"),
        (F.col("sec") - F.lag("sec").over(w_lag)).alias("gap"),
    )
    per_user = windowed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("in_minute").alias("max_per_minute"),
        F.countDistinct("gap").alias("n_distinct_gaps"),
        F.count("gap").alias("n_gaps"),
    )
    return (
        per_user.where(F.col("n_events") >= BOT_MIN_EVENTS)
        .select(
            "user_id",
            "n_events",
            "max_per_minute",
            "n_distinct_gaps",
            "n_gaps",
            (F.col("n_gaps") - F.col("n_distinct_gaps")).alias(
                "n_repeated_gaps"
            ),
            (F.col("max_per_minute") > BOT_BURST_LIMIT).alias("burst_flag"),
            (F.col("n_distinct_gaps") * 4 <= F.col("n_gaps")).alias(
                "periodic_flag"
            ),
        )
        .orderBy(
            F.col("max_per_minute").desc(),
            (F.col("n_gaps") - F.col("n_distinct_gaps")).desc(),
            "user_id",
        )
        .limit(20)
    )


# XYZ demand-variability classes (the ABC complement): squared
# coefficient of variation of weekly demand per part, exact integer
# ppm (cv² = (nΣq² − (Σq)²)·1e6 div (Σq)²), classed X/Y/Z at the
# conventional 0.25/1.0 cv² breaks — inventory policy picks by cell.
@register(
    "part_xyz_classes",
    """
    WITH weekly AS (
      SELECT l_partkey,
             CAST(floor(epoch(CAST(l_shipdate AS DATE))) AS BIGINT)
               // 604800 AS wk,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    stats AS (
      SELECT l_partkey,
             COUNT(*) AS n_weeks,
             CAST(SUM(q) AS BIGINT) AS sq,
             CAST(SUM(q * q) AS BIGINT) AS sqq
      FROM weekly GROUP BY l_partkey
    ),
    classed AS (
      SELECT l_partkey AS p_partkey, n_weeks,
             (n_weeks * sqq - sq * sq) * 1000000 // (sq * sq) AS cv2_ppm
      FROM stats WHERE sq > 0
    )
    SELECT CASE WHEN cv2_ppm <= 250000 THEN 'X'
                WHEN cv2_ppm <= 1000000 THEN 'Y'
                ELSE 'Z' END AS xyz,
           COUNT(*) AS n_parts,
           CAST(MIN(cv2_ppm) AS BIGINT) AS min_cv2_ppm,
           CAST(MAX(cv2_ppm) AS BIGINT) AS max_cv2_ppm
    FROM classed
    GROUP BY 1
    ORDER BY 1
    """,
)
def part_xyz_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ variability classification of parts from weekly demand:
    cv² in exact integer ppm ((nΣq²−(Σq)²)·1e6 div (Σq)²; magnitudes
    bounded by weekly-qty sums « 2^31), X ≤ 0.25, Y ≤ 1.0, Z above.
    Two part-keyed aggregates, 3-row output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "unix_timestamp(CAST(l_shipdate AS DATE)) div 604800"
        ).alias("wk"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    weekly = li.groupBy("l_partkey", "wk").agg(F.sum("qty").alias("q"))
    stats = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    classed = stats.where(F.col("sq") > 0).select(
        F.expr(
            "(n_weeks * sqq - sq * sq) * 1000000 div (sq * sq)"
        ).alias("cv2_ppm")
    )
    xyz = (
        F.when(F.col("cv2_ppm") <= 250000, "X")
        .when(F.col("cv2_ppm") <= 1000000, "Y")
        .otherwise("Z")
    )
    return (
        classed.groupBy(xyz.alias("xyz"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("cv2_ppm").alias("min_cv2_ppm"),
            F.max("cv2_ppm").alias("max_cv2_ppm"),
        )
        .orderBy("xyz")
    )


# p-chart (SPC control chart): weekly return-rate against 3-sigma
# limits from the pooled rate — the statistical-process-control view
# of quality drift.  Limits use only +,-,*,/ and sqrt (IEEE-exact) in
# fixed order from exact integer counts.
@register(
    "returns_p_chart",
    """
    WITH weekly AS (
      SELECT CAST(floor(epoch(CAST(l_shipdate AS DATE))) AS BIGINT)
               // 604800 AS wk,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM lineitem GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(SUM(r) AS BIGINT) AS tr,
             CAST(SUM(n) AS BIGINT) AS tn
      FROM weekly
    )
    SELECT w.wk, w.n, w.r,
           CAST(w.r AS DOUBLE) / w.n AS p_hat,
           CAST(p.tr AS DOUBLE) / p.tn AS p_bar,
           CAST(p.tr AS DOUBLE) / p.tn
             + 3.0 * sqrt((CAST(p.tr AS DOUBLE) / p.tn)
                          * (1.0 - CAST(p.tr AS DOUBLE) / p.tn) / w.n)
             AS ucl,
           CAST(w.r AS DOUBLE) / w.n
             > CAST(p.tr AS DOUBLE) / p.tn
               + 3.0 * sqrt((CAST(p.tr AS DOUBLE) / p.tn)
                            * (1.0 - CAST(p.tr AS DOUBLE) / p.tn) / w.n)
             AS out_of_control
    FROM weekly w CROSS JOIN pooled p
    ORDER BY w.wk
    """,
)
def returns_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly return-rate p-chart: pooled center line, 3σ upper
    control limit per week (binomial σ = sqrt(p̄(1−p̄)/n), IEEE sqrt,
    fixed expression order), out-of-control flags.  One scan, one
    weekly rollup, 1-row pooled broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "unix_timestamp(CAST(l_shipdate AS DATE)) div 604800"
        ).alias("wk"),
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
    )
    weekly = li.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n"), F.sum("ret").alias("r")
    )
    pooled = weekly.agg(
        F.sum("r").alias("tr"), F.sum("n").alias("tn")
    )
    p_bar = F.col("tr").cast("double") / F.col("tn")
    p_hat = F.col("r").cast("double") / F.col("n")
    ucl = p_bar + F.lit(3.0) * F.sqrt(
        p_bar * (F.lit(1.0) - p_bar) / F.col("n")
    )
    return (
        weekly.crossJoin(F.broadcast(pooled))
        .select(
            "wk",
            "n",
            "r",
            p_hat.alias("p_hat"),
            p_bar.alias("p_bar"),
            ucl.alias("ucl"),
            (p_hat > ucl).alias("out_of_control"),
        )
        .orderBy("wk")
    )


# ------------- exact stratified split / top movers

# Stratified train/val/test split with EXACT per-stratum proportions:
# unlike the hash-threshold split (whose strata sizes are only
# binomially close to 80/10/10), each (lang, source) stratum gets
# Hamilton-apportioned exact counts, assigned by md5 rank within the
# stratum — deterministic, leakage-free, and auditable to the row.
SPLIT_TRAIN_PCT, SPLIT_VAL_PCT = 80, 10


@register(
    "corpus_stratified_split",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY lang, source
               ORDER BY md5('strat-' || CAST(doc_id AS VARCHAR)), doc_id)
               AS rk,
             COUNT(*) OVER (PARTITION BY lang, source) AS n
      FROM documents
    ),
    quota AS (
      SELECT lang, source, n,
             n * {SPLIT_TRAIN_PCT} // 100 AS base_train,
             n * {SPLIT_VAL_PCT} // 100 AS base_val
      FROM (SELECT DISTINCT lang, source, n FROM ranked)
    ),
    labeled AS (
      SELECT r.doc_id, r.lang, r.source,
             CASE WHEN r.rk <= q.base_train THEN 'train'
                  WHEN r.rk <= q.base_train + q.base_val THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked r JOIN quota q
        ON r.lang = q.lang AND r.source = q.source
    )
    SELECT lang, source, split, COUNT(*) AS n_docs
    FROM labeled
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def corpus_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-proportion stratified split audit: per (lang, source)
    stratum, md5-ranked docs filled into floor-quota train/val buckets
    (floor residue falls to test — the conservative default for
    held-out data), reported as per-cell counts.  One stratum-keyed
    window; quotas are vocabulary-sized."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.concat(F.lit("strat-"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    wn = Window.partitionBy("lang", "source")
    ranked = docs.select(
        "doc_id",
        "lang",
        "source",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    split = (
        F.when(
            F.col("rk") <= F.expr(f"n * {SPLIT_TRAIN_PCT} div 100"), "train"
        )
        .when(
            F.col("rk")
            <= F.expr(
                f"n * {SPLIT_TRAIN_PCT} div 100 + n * {SPLIT_VAL_PCT} div 100"
            ),
            "val",
        )
        .otherwise("test")
    )
    return (
        ranked.groupBy("lang", "source", split.alias("split"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "source", "split")
    )


# Movers report: the parts whose month-over-month revenue moved most,
# both directions, fully tie-broken — the retail Monday-morning view
# on top of the bridge decomposition.
@register(
    "part_movers_topk",
    """
    WITH pm AS (
      SELECT DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS month,
             l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    last_months AS (
      SELECT MAX(month) AS m1, MAX(month) - INTERVAL 1 MONTH AS m0
      FROM pm
    ),
    paired AS (
      SELECT COALESCE(c.l_partkey, p.l_partkey) AS p_partkey,
             COALESCE(c.cents, 0) AS c1,
             COALESCE(p.cents, 0) AS c0
      FROM (SELECT pm.* FROM pm CROSS JOIN last_months
            WHERE month = m1) c
      FULL OUTER JOIN
           (SELECT pm.* FROM pm CROSS JOIN last_months
            WHERE month = m0) p
        ON c.l_partkey = p.l_partkey
    )
    SELECT p_partkey,
           c0 / 100.0 AS prev_revenue,
           c1 / 100.0 AS curr_revenue,
           (c1 - c0) / 100.0 AS delta,
           CASE WHEN c1 >= c0 THEN 'up' ELSE 'down' END AS direction
    FROM paired
    ORDER BY ABS(c1 - c0) DESC, p_partkey
    LIMIT 15
    """,
)
def part_movers_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 movers between the two latest months by absolute revenue
    change (absent months count as zero — new and lapsed parts rank
    too), fully tie-broken LIMIT."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.trunc(F.col("l_shipdate").cast("date"), "MM").alias("month"),
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    pm = li.groupBy("month", "l_partkey").agg(
        F.sum("cents").alias("cents")
    ).localCheckpoint(eager=False)  # bounds + both month slices
    lm = pm.agg(
        F.max("month").alias("m1"),
        F.add_months(F.max("month"), -1).alias("m0"),
    )
    c = (
        pm.crossJoin(F.broadcast(lm))
        .where(F.col("month") == F.col("m1"))
        .select(F.col("l_partkey").alias("ck"), F.col("cents").alias("c1"))
    )
    p = (
        pm.crossJoin(F.broadcast(lm))
        .where(F.col("month") == F.col("m0"))
        .select(F.col("l_partkey").alias("pk"), F.col("cents").alias("c0"))
    )
    paired = c.join(p, F.col("ck") == F.col("pk"), "full_outer").select(
        F.coalesce("ck", "pk").alias("p_partkey"),
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c0", F.lit(0)).alias("c0"),
    )
    return (
        paired.select(
            "p_partkey",
            (F.col("c0") / 100.0).alias("prev_revenue"),
            (F.col("c1") / 100.0).alias("curr_revenue"),
            ((F.col("c1") - F.col("c0")) / 100.0).alias("delta"),
            F.when(F.col("c1") >= F.col("c0"), "up")
            .otherwise("down")
            .alias("direction"),
        )
        .orderBy(F.abs(F.col("curr_revenue") - F.col("prev_revenue")).desc(), "p_partkey")
        .limit(15)
    )


# --------------------------- PCA (top principal component)

# Top principal component of the embedding corpus — PCA as a QUERY.
# The trick that keeps it exact and scale-correct: the corpus is
# touched ONCE to build the 64x64 CENTERED second-moment matrix from
# integer sufficient statistics (Σ x_d·x_d' and Σ x_d, both exact
# int64 — the matrix is vocabulary-sized, 4096 cells), and the power
# iteration runs entirely on that tiny table: 5 unrolled iterations
# of w = C·v with dim-ordered HOF folds (deterministic double
# summation) and sqrt normalization (IEEE-exact).  At 100 TB the
# only fact-sized work is the one sufficient-statistics scan — the
# same shape ANALYZE uses; the eigen-solve costs nothing.
PCA_POWER_ITERATIONS = 5


def _pca_iter_sql(n_iter: int) -> str:
    # v0 = all-ones; each step: w = C v (fold in d2 order), v = w/|w|
    steps = []
    prev = "v0"
    steps.append(
        "v0 AS (SELECT list_transform(range(1, 65), i -> 1.0) AS v)"
    )
    for t in range(1, n_iter + 1):
        steps.append(f"""
    w{t} AS (
      SELECT list(s ORDER BY d1) AS w FROM (
        SELECT g.d1,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, 65), j ->
                   g.row[j] * pv.v[j])),
                 (a, b) -> a + b) AS s
        FROM gram_rows g CROSS JOIN {prev} pv
      )
    ),
    n{t} AS (
      SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(w, x -> x * x)), (a, b) -> a + b)) AS nn
      FROM w{t}
    ),
    v{t} AS (
      SELECT list_transform(wt.w, x -> x / nt.nn) AS v
      FROM w{t} wt CROSS JOIN n{t} nt
    )""")
        prev = f"v{t}"
    return ",\n".join(steps), prev


_PCA_STEPS, _PCA_LAST = _pca_iter_sql(PCA_POWER_ITERATIONS)


@register(
    "embedding_top_pc",
    f"""
    WITH ve AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    longf AS (
      SELECT u.i AS dim,
             CAST(floor(ve.e[u.i] * 1000000) AS BIGINT) AS xi
      FROM ve CROSS JOIN UNNEST(range(1, len(e) + 1)) AS u(i)
    ),
    -- exact integer sufficient statistics: one conceptual corpus scan
    sums AS (
      SELECT dim, CAST(SUM(xi) AS BIGINT) AS s FROM longf GROUP BY dim
    ),
    n AS (SELECT COUNT(*) AS n FROM ve),
    cross_terms AS (
      SELECT a.dim AS d1, b.dim AS d2,
             CAST(SUM(a.xi * b.xi) AS BIGINT) AS sxy
      FROM (SELECT ve.vec_id AS rid, u.i AS dim,
                   CAST(floor(ve.e[u.i] * 1000000) AS BIGINT) AS xi
            FROM ve CROSS JOIN UNNEST(range(1, len(e) + 1)) AS u(i)) a
      JOIN (SELECT ve.vec_id AS rid, u.i AS dim,
                   CAST(floor(ve.e[u.i] * 1000000) AS BIGINT) AS xi
            FROM ve CROSS JOIN UNNEST(range(1, len(e) + 1)) AS u(i)) b
        ON a.rid = b.rid
      GROUP BY a.dim, b.dim
    ),
    gram AS (
      SELECT c.d1, c.d2,
             (CAST(c.sxy AS DOUBLE)
              - CAST(sa.s AS DOUBLE) * sb.s / (SELECT n FROM n))
               AS cval
      FROM cross_terms c
      JOIN sums sa ON c.d1 = sa.dim
      JOIN sums sb ON c.d2 = sb.dim
    ),
    gram_rows AS (
      SELECT d1, list(cval ORDER BY d2) AS row
      FROM gram GROUP BY d1
    ),
    {_PCA_STEPS},
    rayleigh AS (
      -- eigenvalue estimate: |C v| with the final unit v
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(w, x -> x * x)), (a, b) -> a + b) AS wsq
      FROM w{PCA_POWER_ITERATIONS}
    )
    SELECT u.i AS dim,
           (SELECT v FROM {_PCA_LAST})[u.i]
             * (CASE WHEN (SELECT v FROM {_PCA_LAST})[1] < 0
                THEN -1.0 ELSE 1.0 END) AS loading,
           sqrt((SELECT wsq FROM rayleigh)) AS eigenvalue_scaled
    FROM UNNEST(range(1, 65)) AS u(i)
    ORDER BY dim
    """,
)
def embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component via 5 power iterations on the exactly-
    computed centered 64x64 second-moment matrix.  Spark plan: ONE
    Arrow scan of the corpus emits per-batch integer partials
    (m.T @ m, Σx, n — each 64x64/64/1 regardless of batch size);
    a 4096-key reduction over the handful of partial rows yields the
    exact centered gram, which collects to the driver (model-sized,
    corpus-independent) for the eigen-solve with the oracle's exact
    left-fold order.  Sign fixed by forcing loading[1] >= 0
    (eigenvectors are sign-ambiguous).  The corpus is touched once."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("rid"),
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("xs"),
    )
    # ONE Arrow pass accumulates all three sufficient statistics as
    # per-batch int64 numpy partials (m.T @ m is 64x64 regardless of
    # batch size): exact — |x| <= ~1 so xi <= 1e6, per-batch products
    # <= 10k rows * 1e12 = 1e16 << int64 max; the cross-partial SUM
    # stays exact up to ~9e6 corpus rows per the same bound (assert
    # would trip the gram cell first).  Exploding per-row outer
    # products instead costs 4096x row amplification (22 s vs <2 s at
    # sf0.1) for the identical integer sums.
    import numpy as np  # noqa: PLC0415 — worker-side import
    import pandas as pd  # noqa: PLC0415

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["xs"].to_numpy()).astype(np.int64)
            yield pd.DataFrame(
                {
                    "g": [(m.T @ m).reshape(-1).tolist()],
                    "s": [m.sum(axis=0).tolist()],
                    "nrows": [len(pdf)],
                }
            )

    partials = emb.select("xs").mapInPandas(
        gram_partials, "g array<long>, s array<long>, nrows long"
    )
    # a handful of 4161-value partial rows -> tiny final reduction
    partials = partials.localCheckpoint(eager=True)
    cross_terms = (
        partials.select(F.posexplode("g").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("sxy"))
        .select(
            F.expr("idx div 64").alias("d1"),
            (F.col("idx") % 64).alias("d2"),
            "sxy",
        )
    )
    sums = (
        partials.select(F.posexplode("s").alias("d0", "sv"))
        .groupBy("d0")
        .agg(F.sum("sv").alias("s"))
    )
    n = partials.agg(F.sum("nrows").alias("n"))
    sa = sums.select(F.col("d0").alias("d1"), F.col("s").alias("s1"))
    sb = sums.select(F.col("d0").alias("d2"), F.col("s").alias("s2"))
    gram = (
        cross_terms.join(F.broadcast(sa), "d1")
        .join(F.broadcast(sb), "d2")
        .crossJoin(F.broadcast(n))
        .select(
            "d1",
            "d2",
            (
                F.col("sxy").cast("double")
                - F.col("s1").cast("double") * F.col("s2") / F.col("n")
            ).alias("cval"),
        )
    )
    # Model-state collect (the k-means precedent): the centered gram
    # matrix is 64x64 = 4096 doubles REGARDLESS of corpus size — the
    # distributed job ends here; the eigen-solve is driver-side pure
    # Python with the oracle's exact left-fold order (deterministic
    # IEEE doubles, d2-ascending inner sum), so both engines walk the
    # same float trajectory.  (Unrolling the iterations as nested HOF
    # expressions doubles the Catalyst tree per step — analysis blows
    # up; don't.)
    cells = gram.collect()
    m = [[0.0] * 64 for _ in range(64)]
    for r in cells:
        m[r["d1"]][r["d2"]] = r["cval"]

    def _matvec(v):
        w = []
        for i in range(64):
            s = 0.0
            for j in range(64):
                s += m[i][j] * v[j]
            w.append(s)
        return w

    def _unit(w):
        s = 0.0
        for x in w:
            s += x * x
        nn = math.sqrt(s)
        return [x / nn for x in w]

    v = [1.0] * 64
    w = v
    for _ in range(PCA_POWER_ITERATIONS):
        w = _matvec(v)
        v = _unit(w)
    ssq = 0.0
    for x in w:
        ssq += x * x
    ev = math.sqrt(ssq)
    # eigenvectors are sign-ambiguous: force loading[1] >= 0 so both
    # engines pick one sign
    sign = -1.0 if v[0] < 0 else 1.0
    rows = [(i + 1, v[i] * sign, ev) for i in range(64)]
    return spark.createDataFrame(
        rows, "dim INT, loading DOUBLE, eigenvalue_scaled DOUBLE"
    ).orderBy("dim")


# --------------------------- autocorrelation of daily revenue

# Pearson autocorrelation of the daily-revenue series at lags 1..14 —
# the "is there weekly structure worth a seasonal model" diagnostic
# that precedes any forecast.  Exactness recipe: the series is integer
# dollars; per-lag means are FLOORED integers, so the deviation
# products and squares are exact int64 (bound: |dev| <= ~1e8 dollars/
# day keeps sums under int64 at ~1e4 days); only the final
# sqrt/divide runs in IEEE doubles from identical integers on both
# engines.  One fact-sized date rollup; everything after is
# |days| x |lags| (~tens of k rows).
ACF_MAX_LAG = 14


@register(
    "revenue_acf",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT CAST(u.k AS BIGINT) AS lag
             FROM UNNEST(range(1, {ACF_MAX_LAG} + 1)) AS u(k)),
    pairs AS (
      SELECT l.lag, a.rev AS x, b.rev AS y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.de = a.de + l.lag
    ),
    stats AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) // COUNT(*) AS mx,
             CAST(SUM(y) AS BIGINT) // COUNT(*) AS my
      FROM pairs GROUP BY lag
    ),
    devs AS (
      SELECT p.lag, s.n,
             CAST(SUM((p.x - s.mx) * (p.y - s.my)) AS BIGINT) AS sxy,
             CAST(SUM((p.x - s.mx) * (p.x - s.mx)) AS BIGINT) AS sxx,
             CAST(SUM((p.y - s.my) * (p.y - s.my)) AS BIGINT) AS syy
      FROM pairs p JOIN stats s ON p.lag = s.lag
      GROUP BY p.lag, s.n
    )
    SELECT lag, n AS n_pairs,
           CAST(floor(CAST(sxy AS DOUBLE) * 1000000
             / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))))
             AS BIGINT) AS acf_ppm
    FROM devs
    ORDER BY lag
    """,
)
def revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..14 autocorrelation of daily order revenue: integer-
    dollar daily rollup -> 14-row lag spine broadcast -> calendar-
    aligned self-join (equi on epoch-day + lag) -> floored integer
    means -> exact int64 deviation sums -> one double sqrt/divide at
    the very end.  Per-lag Pearson over the aligned pairs (means
    recomputed per lag), the standard cross-correlogram form."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1970-01-01").cast("date")).alias("de")
        )
        .agg(F.sum(F.floor("o_totalprice").cast("bigint")).alias("rev"))
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = daily.select("de", F.col("rev").alias("x"))
    b = daily.select(F.col("de").alias("de_b"), F.col("rev").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("de_b") == F.col("de") + F.col("lag"))
        .select("lag", "x", "y")
    )
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(x) AS BIGINT) div COUNT(*)").alias("mx"),
        F.expr("CAST(SUM(y) AS BIGINT) div COUNT(*)").alias("my"),
    )
    devs = (
        pairs.join(F.broadcast(stats), "lag")
        .groupBy("lag", "n")
        .agg(
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            .alias("sxy"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
            .alias("sxx"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .alias("syy"),
        )
    )
    return devs.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.expr(
            "CAST(floor(CAST(sxy AS DOUBLE) * 1000000"
            " / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))))"
            " AS BIGINT)"
        ).alias("acf_ppm"),
    ).orderBy("lag")


# --------------------------- newsvendor stock levels

# Critical-fractile stock level per part: the smallest daily-demand
# quantity q with P(D <= q) >= cu/(cu+co) — the closed-form
# newsvendor answer with underage cost 3x overage.  Discrete quantile
# realized as a per-part window (value at sorted position
# ceil(CF*n)), NOT percentile_disc, so both engines share one
# tie-agnostic definition (the value at a fixed sorted position is
# unique even when row_number among ties is not).
NEWSVENDOR_UNDERAGE = 3
NEWSVENDOR_OVERAGE = 1


@register(
    "part_newsvendor_stock",
    f"""
    WITH daily AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS demand
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT l_partkey, demand,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY demand) AS rn,
             COUNT(*) OVER (PARTITION BY l_partkey) AS n_days,
             CAST(SUM(demand) OVER (PARTITION BY l_partkey) AS BIGINT)
               AS tot_demand
      FROM daily
    )
    SELECT l_partkey, n_days, tot_demand,
           demand AS stock_level
    FROM ranked
    WHERE rn = ({NEWSVENDOR_UNDERAGE} * n_days
                + {NEWSVENDOR_UNDERAGE} + {NEWSVENDOR_OVERAGE} - 1)
               // ({NEWSVENDOR_UNDERAGE} + {NEWSVENDOR_OVERAGE})
    ORDER BY l_partkey
    """,
)
def part_newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stock: per part, daily demand (sum of shipped
    quantity per ship-date) and its critical-fractile discrete
    quantile at CF = cu/(cu+co) = 3/4 — the value at sorted position
    ceil(CF*n).  One fact rollup, one per-part sort window; output is
    part-vocabulary-sized."""
    from pyspark.sql import Window

    cf_num = NEWSVENDOR_UNDERAGE
    cf_den = NEWSVENDOR_UNDERAGE + NEWSVENDOR_OVERAGE
    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("demand"))
    )
    w = Window.partitionBy("l_partkey")
    ranked = daily.select(
        "l_partkey",
        "demand",
        F.row_number().over(w.orderBy("demand")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_days"),
        F.sum("demand").over(w).alias("tot_demand"),
    )
    return (
        ranked.where(
            F.col("rn")
            == F.expr(f"({cf_num} * n_days + {cf_den} - 1) div {cf_den}")
        )
        .select(
            "l_partkey",
            "n_days",
            "tot_demand",
            F.col("demand").alias("stock_level"),
        )
        .orderBy("l_partkey")
    )


# --------------------------- OLS demand slope per category

# Linear price-sensitivity of demand per category: the OLS slope of
# quantity on unit price over line items — the "does demand fall as
# price rises, and how fast" regression.  Exactness: prices are
# integer cents and quantities integers, per-category means are
# FLOORED integers, deviation sums are exact int64 (dev <= ~1e6
# cents, rows per category <= ~1e6 keeps sums under int64); the final
# slope/r2 division is one double op from identical integers.  No
# logs anywhere — log() is not IEEE-correctly-rounded and differs
# across libm implementations, so a quantized-log design would NOT be
# engine-portable (sqrt/div are exact; that's all we use).
@register(
    "category_demand_slope",
    """
    WITH pts AS (
      SELECT p_type AS category,
             CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)
               AS price_cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    m AS (
      SELECT category, COUNT(*) AS n,
             CAST(SUM(price_cents) AS BIGINT) // COUNT(*) AS mx,
             CAST(SUM(qty) AS BIGINT) // COUNT(*) AS my
      FROM pts GROUP BY category
    ),
    d AS (
      SELECT p.category, m.n,
             CAST(SUM((p.price_cents - m.mx) * (p.qty - m.my)) AS BIGINT)
               AS sxy,
             CAST(SUM((p.price_cents - m.mx) * (p.price_cents - m.mx))
               AS BIGINT) AS sxx,
             CAST(SUM((p.qty - m.my) * (p.qty - m.my)) AS BIGINT) AS syy
      FROM pts p JOIN m ON p.category = m.category
      GROUP BY p.category, m.n
    )
    SELECT category, n AS n_lines,
           CAST(floor(CAST(sxy AS DOUBLE) * 1000000000
                      / CAST(sxx AS DOUBLE)) AS BIGINT)
             AS slope_qty_per_cent_e9,
           CAST(floor(CAST(sxy AS DOUBLE) * sxy * 1000000
                      / (CAST(sxx AS DOUBLE) * syy)) AS BIGINT)
             AS r2_ppm
    FROM d
    ORDER BY category
    """,
)
def category_demand_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category OLS of quantity on unit price (integer cents):
    fact-sized scan -> per-category floored-integer means (broadcast
    back) -> exact int64 deviation sums -> slope*1e9 and r^2 ppm via
    one final double division.  Category-keyed partial aggregation;
    the dim join broadcasts part."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)"
        ).alias("price_cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_type").alias("category")
    )
    pts = li.join(F.broadcast(part), "l_partkey").select(
        "category", "price_cents", "qty"
    )
    m = pts.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(price_cents) AS BIGINT) div COUNT(*)").alias("mx"),
        F.expr("CAST(SUM(qty) AS BIGINT) div COUNT(*)").alias("my"),
    )
    d = (
        pts.join(F.broadcast(m), "category")
        .groupBy("category", "n")
        .agg(
            F.sum(
                (F.col("price_cents") - F.col("mx"))
                * (F.col("qty") - F.col("my"))
            ).alias("sxy"),
            F.sum(
                (F.col("price_cents") - F.col("mx"))
                * (F.col("price_cents") - F.col("mx"))
            ).alias("sxx"),
            F.sum(
                (F.col("qty") - F.col("my")) * (F.col("qty") - F.col("my"))
            ).alias("syy"),
        )
    )
    return d.select(
        "category",
        F.col("n").alias("n_lines"),
        F.expr(
            "CAST(floor(CAST(sxy AS DOUBLE) * 1000000000"
            " / CAST(sxx AS DOUBLE)) AS BIGINT)"
        ).alias("slope_qty_per_cent_e9"),
        F.expr(
            "CAST(floor(CAST(sxy AS DOUBLE) * sxy * 1000000"
            " / (CAST(sxx AS DOUBLE) * syy)) AS BIGINT)"
        ).alias("r2_ppm"),
    ).orderBy("category")


# --------------------------- embedding centroid outliers

# The farthest-from-centroid audit that precedes embedding-space
# cleaning: rank vectors by distance to the corpus centroid without
# materializing a float mean.  Exactness recipe: with S_d = Σ x_d and
# n the corpus count (both exact int64 over micro-quantized ints),
# n^2 * dist^2 = Σ_d (n*x_d - S_d)^2 — each per-dim difference is an
# exact int64 (~|n*x| <= 1e6 * n), squared in DOUBLE and folded in
# dim order, so both engines walk identical IEEE sequences.  One
# corpus scan for sums, one for scoring (centroid rides as a 1-row
# broadcast).
EMBEDDING_OUTLIER_TOPK = 20


@register(
    "embedding_centroid_outliers",
    f"""
    WITH ve AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000) AS BIGINT)) AS xs
      FROM embeddings
    ),
    longf AS (
      SELECT ve.vec_id, u.i AS dim, xs[u.i] AS xi
      FROM ve CROSS JOIN UNNEST(range(1, len(xs) + 1)) AS u(i)
    ),
    cent AS (
      SELECT list(s ORDER BY dim) AS sv, MAX(n) AS n FROM (
        SELECT dim, CAST(SUM(xi) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM longf GROUP BY dim
      )
    )
    SELECT vec_id,
           CAST(floor(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, 65), j ->
               CAST(c.n * ve.xs[j] - c.sv[j] AS DOUBLE)
               * CAST(c.n * ve.xs[j] - c.sv[j] AS DOUBLE))),
             (a, b) -> a + b))) AS BIGINT) AS ndist_micro
    FROM ve CROSS JOIN cent c
    ORDER BY ndist_micro DESC, vec_id
    LIMIT {EMBEDDING_OUTLIER_TOPK}
    """,
)
def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 embedding outliers by (n-scaled) distance to the global
    centroid: per-dim integer sums -> 1-row broadcast centroid ->
    per-row dim-ordered double fold of exact int64 differences ->
    floor(sqrt).  TakeOrdered top-k; corpus touched twice (sums +
    scoring), no shuffle beyond the 64-key sum."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("xs"),
    )
    longf = emb.select("vec_id", F.posexplode("xs").alias("d0", "xi"))
    cent = (
        longf.groupBy("d0")
        .agg(F.sum("xi").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d0, s))),"
                " p -> p.s)"
            ).alias("sv"),
            F.max("cnt").alias("n"),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.expr(
                "CAST(floor(sqrt(aggregate(sequence(1, 64),"
                " CAST(0.0 AS DOUBLE), (a, j) ->"
                " a + CAST(n * element_at(xs, j) - element_at(sv, j)"
                "     AS DOUBLE)"
                "   * CAST(n * element_at(xs, j) - element_at(sv, j)"
                "     AS DOUBLE)))) AS BIGINT)"
            ).alias("ndist_micro"),
        )
        .orderBy(F.col("ndist_micro").desc(), "vec_id")
        .limit(EMBEDDING_OUTLIER_TOPK)
    )


# --------------------------- label propagation communities

# Synchronous min-label propagation on the co-purchase graph: after K
# rounds every part carries the smallest partkey within K hops — the
# cheap community/cluster detector that needs no union-find state and
# is embarrassingly parallel (each round is one equi-join + one min).
# Complements dedup_clusters (async star-contraction to FULL
# convergence on the doc-similarity graph): here rounds are FIXED so
# the result is a deterministic K-hop invariant, same recipe as
# part_pagerank's unrolled iterations.
PLP_ROUNDS = 3
PLP_MIN_SUPPORT = 2


def _plp_oracle() -> str:
    steps = ["""
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {sup}
    ),
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL SELECT dst AS src, src AS dst FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)
    """.format(sup=PLP_MIN_SUPPORT)]
    prev = "l0"
    for t in range(1, PLP_ROUNDS + 1):
        steps.append(f"""
    l{t} AS (
      SELECT p.node,
             LEAST(p.label, MIN(q.label)) AS label
      FROM {prev} p
      JOIN edges e ON e.src = p.node
      JOIN {prev} q ON q.node = e.dst
      GROUP BY p.node, p.label
    )""")
        prev = f"l{t}"
    return (
        "WITH " + ",".join(steps)
        + f"""
    SELECT node AS p_partkey, label AS community,
           COUNT(*) OVER (PARTITION BY label) AS community_size
    FROM {prev}
    ORDER BY community, p_partkey
    """
    )


@register("part_label_propagation", _plp_oracle())
def part_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=3 rounds of synchronous min-label propagation over support-
    pruned co-purchase edges.  Per round: edges equi-join labels on
    dst, groupBy src MIN — partial-aggregated, label table is
    node-sized.  Every node in the edge set has degree >= 1 (edges
    are symmetric), so the round join never drops nodes.  Labels are
    localCheckpoint'ed per round to stop plan re-expansion
    (part_pagerank lesson)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= PLP_MIN_SUPPORT)
        .select("src", "dst")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(PLP_ROUNDS):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr.withColumnRenamed("src", "node"), "node")
            .select(
                "node", F.least("label", F.col("nbr_min")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    from pyspark.sql import Window

    return labels.select(
        F.col("node").alias("p_partkey"),
        F.col("label").alias("community"),
        F.count(F.lit(1))
        .over(Window.partitionBy("label"))
        .alias("community_size"),
    ).orderBy("community", "p_partkey")


# --------------------------- minhash as a mergeable register

# MinHash signatures as MERGEABLE sketch registers — the HLL/CMS/Bloom
# family's missing member: a per-source signature is the element-wise
# MIN over the source's shingle hashes, so merging sources is the same
# MIN — one commutative/associative aggregate both builds and unions
# sketches (min is dedup-insensitive, so no per-source distinct pass
# is even needed).  The estimate column (share of matching components)
# is graded against the exact shingle-set Jaccard per source pair.
# The oracle interpolates dedup.py's hash constants (the
# HLL_ROLLING_DAYS drift-proofing pattern) so the two sides cannot
# diverge.
from data_pipeline_for_e_commerce_shop_spark.operators.dedup import (  # noqa: E402
    MINHASH_A as _MH_A_CONST,
    MINHASH_B as _MH_B_CONST,
    MINHASH_P as MINHASH_P_CONST,
)

MINHASH_AB_CONST = list(zip(_MH_A_CONST, _MH_B_CONST))


@register(
    "minhash_union_rollup",
    f"""
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT source, shingle FROM (
        SELECT source,
               unnest(list_transform(generate_series(1, len(t) - 2),
                 i -> array_to_string(t[i:i+2], ' '))) AS shingle
        FROM toks WHERE len(t) >= 3
      )
    ),
    hashed AS (
      SELECT source,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh
    ),
    sig AS (
      SELECT source,
             {", ".join(
                 f"MIN((h * {a} + {b}) % {MINHASH_P_CONST}) AS mh{i}"
                 for i, (a, b) in enumerate(MINHASH_AB_CONST)
             )},
             COUNT(*) AS n_shingles
      FROM hashed GROUP BY source
    ),
    est AS (
      SELECT sa.source AS source_a, sb.source AS source_b,
             sa.n_shingles AS n_a, sb.n_shingles AS n_b,
             ({" + ".join(
                 f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
                 for i in range(8)
             )}) * 1000000 // 8 AS est_jaccard_ppm
      FROM sig sa JOIN sig sb ON sa.source < sb.source
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle
                         AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT e.source_a, e.source_b, e.est_jaccard_ppm,
           COALESCE(i.n_inter, 0) * 1000000
             // (e.n_a + e.n_b - COALESCE(i.n_inter, 0))
             AS exact_jaccard_ppm
    FROM est e LEFT JOIN inter i
      ON e.source_a = i.source_a AND e.source_b = i.source_b
    ORDER BY e.source_a, e.source_b
    """,
)
def minhash_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level MinHash registers: shingle once, hash once, then
    ONE min-aggregate per source builds the 8-component signature
    (mergeable: the same MIN unions registers).  Source pairs expand
    from a collect_list of the |sources|-row signature table (no
    self-join); the exact-Jaccard audit is one shingle-keyed equi-join
    over the deduped (source, shingle) set."""
    from data_pipeline_for_e_commerce_shop_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        _shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        _shingles(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
        .localCheckpoint(eager=True)  # feeds signature + exact audit
    )
    hashed = sh.withColumn(
        "h", F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    )
    sig = hashed.groupBy("source").agg(
        *[
            F.min(
                (F.col("h") * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_P
            ).alias(f"mh{i}")
            for i in range(8)
        ],
        F.count(F.lit(1)).alias("n_shingles"),
    )
    # |sources| rows -> expand ordered pairs without a self-join
    match_sum = " + ".join(
        f"IF(x.mh{i} = y.mh{i}, 1, 0)" for i in range(8)
    )
    est = (
        sig.agg(
            F.expr(
                "array_sort(collect_list(struct(source, mh0, mh1, mh2,"
                " mh3, mh4, mh5, mh6, mh7, n_shingles)))"
            ).alias("sigs")
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sigs, (x, i) ->"
                    " transform(slice(sigs, i + 2, size(sigs)), y ->"
                    " struct(x.source AS source_a, y.source AS source_b,"
                    f" x.n_shingles AS n_a, y.n_shingles AS n_b,"
                    f" CAST(({match_sum}) * 1000000 div 8 AS BIGINT)"
                    " AS est_jaccard_ppm))))"
                )
            ).alias("p")
        )
        .select("p.*")
    )
    ia = sh.select(F.col("source").alias("source_a"), "shingle")
    ib = sh.select(F.col("source").alias("source_b"), "shingle")
    inter = (
        ia.join(ib, "shingle")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        est.join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_jaccard_ppm",
            F.expr(
                "COALESCE(n_inter, 0) * 1000000"
                " div (n_a + n_b - COALESCE(n_inter, 0))"
            ).alias("exact_jaccard_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------- robust trend (Theil–Sen + Mann–Kendall)

# Robust trend diagnosis of the daily-revenue series: the Theil–Sen
# slope (median of all pairwise slopes — 29% breakdown point vs OLS's
# zero) and the Mann–Kendall S/z test (distribution-free monotone
# trend).  The pair grid is CALENDAR-BOUNDED (|days|^2, ~3M at any
# scale factor — the fact-sized work is only the daily rollup), so
# the O(n^2) is a constant, not a scale risk.  Integer S and
# tie-corrected variance; the only doubles are each pair's slope
# division and the final z — identical op order on both engines.
@register(
    "revenue_trend_robust",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.de - a.de) AS slope,
             CASE WHEN b.rev > a.rev THEN 1
                  WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON b.de > a.de
    ),
    med AS (
      SELECT slope FROM (
        SELECT slope,
               ROW_NUMBER() OVER (ORDER BY slope) AS rn,
               COUNT(*) OVER () AS np
        FROM pairs
      ) WHERE rn = (np + 1) // 2
    ),
    s AS (
      SELECT CAST(SUM(sgn) AS BIGINT) AS mk_s, COUNT(*) AS n_pairs
      FROM pairs
    ),
    nn AS (SELECT COUNT(*) AS n FROM daily),
    ties AS (
      SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
               AS tie_term
      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY rev)
      WHERE t > 1
    )
    SELECT nn.n AS n_days, s.n_pairs,
           CAST(floor(med.slope * 1000000) AS BIGINT)
             AS theil_sen_slope_e6,
           s.mk_s,
           CAST(floor(
             (CASE WHEN s.mk_s > 0 THEN s.mk_s - 1
                   WHEN s.mk_s < 0 THEN s.mk_s + 1
                   ELSE 0 END)
             * 1000000
             / sqrt((CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2 * nn.n + 5)
                     - ties.tie_term) / 18)) AS BIGINT) AS mk_z_e6
    FROM s CROSS JOIN nn CROSS JOIN med CROSS JOIN ties
    """,
)
def revenue_trend_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen median slope + Mann–Kendall z over daily revenue.
    Daily rollup (fact-sized) -> calendar-bounded pair grid (one
    inequality join of two |days|-row aggregates) -> positional lower
    median by sort window + exact integer S with tie-corrected
    variance.  Single-row output assembled from 1-row broadcasts."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1970-01-01").cast("date")).alias("de")
        )
        .agg(F.sum(F.floor("o_totalprice").cast("bigint")).alias("rev"))
        .localCheckpoint(eager=True)  # feeds pairs, n, ties
    )
    a = daily.select(F.col("de").alias("de_a"), F.col("rev").alias("rev_a"))
    b = daily.select(F.col("de").alias("de_b"), F.col("rev").alias("rev_b"))
    pairs = (
        a.join(F.broadcast(b), F.col("de_b") > F.col("de_a"))
        .select(
            ((F.col("rev_b") - F.col("rev_a")).cast("double")
             / (F.col("de_b") - F.col("de_a"))).alias("slope"),
            F.signum(F.col("rev_b") - F.col("rev_a")).cast("bigint")
            .alias("sgn"),
        )
        .localCheckpoint(eager=True)  # feeds median + S
    )
    from pyspark.sql import Window

    # Distributed positional median: bucket the ~|days|^2/2 slopes by
    # a coarse key, walk the SMALL bucket-count table to the bucket
    # holding rank (np+1)/2, then sort ONLY that bucket (partitioned
    # window) — no global single-partition sort.  The picked VALUE is
    # the same positional element the oracle's plain ROW_NUMBER
    # selects.
    bucketed = pairs.select(
        "slope", F.floor(F.col("slope") / 10000).cast("long").alias("bk")
    )
    bcounts = bucketed.groupBy("bk").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    target_bucket = (
        bcounts.select(
            "bk",
            "cnt",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_all).alias("np"),
        )
        .where(
            (F.col("cum") >= F.expr("(np + 1) div 2"))
            & (F.col("cum") - F.col("cnt") < F.expr("(np + 1) div 2"))
        )
        .select(
            "bk",
            (F.expr("(np + 1) div 2") - (F.col("cum") - F.col("cnt")))
            .alias("offset"),
        )
    )
    med = (
        bucketed.join(F.broadcast(target_bucket), "bk")
        .select(
            "slope",
            "offset",
            F.row_number()
            .over(Window.partitionBy("bk").orderBy("slope"))
            .alias("rn"),
        )
        .where(F.col("rn") == F.col("offset"))
        .select("slope")
    )
    s = pairs.agg(
        F.sum("sgn").alias("mk_s"), F.count(F.lit(1)).alias("n_pairs")
    )
    nn = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0).cast("bigint"),
            ).alias("tie_term")
        )
    )
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_days"),
            "n_pairs",
            F.expr("CAST(floor(slope * 1000000) AS BIGINT)")
            .alias("theil_sen_slope_e6"),
            "mk_s",
            F.expr(
                "CAST(floor("
                " (CASE WHEN mk_s > 0 THEN mk_s - 1"
                "       WHEN mk_s < 0 THEN mk_s + 1 ELSE 0 END)"
                " * 1000000"
                " / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
                "         - tie_term) / 18)) AS BIGINT)"
            ).alias("mk_z_e6"),
        )
    )


# --------------------------- binary-segmentation changepoint

# Best single split of the daily-revenue series: the t minimizing
# SSE(1..t) + SSE(t+1..N) — one step of binary segmentation, the
# changepoint primitive CUSUM only approximates.  SSE decomposes over
# exact integer prefix sums (Q_t - S_t^2/n), so each candidate split
# is O(1) from two running windows; the argmin is a positional pick
# with smallest-t tie-break.
@register(
    "revenue_best_split",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT de, rev,
             ROW_NUMBER() OVER (ORDER BY de) AS t,
             CAST(SUM(rev) OVER (ORDER BY de) AS BIGINT) AS s_t,
             CAST(SUM(rev * rev) OVER (ORDER BY de) AS BIGINT) AS q_t,
             COUNT(*) OVER () AS n,
             CAST(SUM(rev) OVER () AS BIGINT) AS s_n,
             CAST(SUM(rev * rev) OVER () AS BIGINT) AS q_n
      FROM daily
    ),
    costs AS (
      SELECT de, t, n, s_t, s_n,
             (CAST(q_t AS DOUBLE)
              - CAST(s_t AS DOUBLE) * s_t / t)
             + (CAST(q_n - q_t AS DOUBLE)
                - CAST(s_n - s_t AS DOUBLE) * (s_n - s_t) / (n - t))
               AS split_sse,
             CAST(q_n AS DOUBLE)
              - CAST(s_n AS DOUBLE) * s_n / n AS total_sse
      FROM pre WHERE t < n
    )
    SELECT DATE '1970-01-01' + INTERVAL (de) DAY AS split_after_day,
           t AS n_left, n - t AS n_right,
           s_t // t AS mean_left,
           (s_n - s_t) // (n - t) AS mean_right,
           CAST(floor((total_sse - split_sse) * 1000000 / total_sse)
             AS BIGINT) AS sse_drop_ppm
    FROM costs
    ORDER BY split_sse, t
    LIMIT 1
    """,
)
def revenue_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One step of binary segmentation on daily revenue: running
    integer prefix sums (S_t, Q_t) in a single ordered window, O(1)
    double SSE per candidate split, argmin with smallest-t tie-break
    via orderBy+limit.  Everything after the daily rollup is
    |days|-sized."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1970-01-01").cast("date")).alias("de")
        )
        .agg(F.sum(F.floor("o_totalprice").cast("bigint")).alias("rev"))
    )
    w_run = Window.orderBy("de").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = daily.select(
        "de",
        F.row_number().over(Window.orderBy("de")).alias("t"),
        F.sum("rev").over(w_run).alias("s_t"),
        F.sum(F.col("rev") * F.col("rev")).over(w_run).alias("q_t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("rev").over(w_all).alias("s_n"),
        F.sum(F.col("rev") * F.col("rev")).over(w_all).alias("q_n"),
    )
    costs = pre.where(F.col("t") < F.col("n")).select(
        "de",
        "t",
        "n",
        "s_t",
        "s_n",
        F.expr(
            "(CAST(q_t AS DOUBLE) - CAST(s_t AS DOUBLE) * s_t / t)"
            " + (CAST(q_n - q_t AS DOUBLE)"
            "    - CAST(s_n - s_t AS DOUBLE) * (s_n - s_t) / (n - t))"
        ).alias("split_sse"),
        F.expr(
            "CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n"
        ).alias("total_sse"),
    )
    return (
        costs.orderBy("split_sse", "t")
        .limit(1)
        .select(
            F.expr("date_add(DATE '1970-01-01', CAST(de AS INT))")
            .alias("split_after_day"),
            F.col("t").alias("n_left"),
            (F.col("n") - F.col("t")).alias("n_right"),
            F.expr("s_t div t").alias("mean_left"),
            F.expr("(s_n - s_t) div (n - t)").alias("mean_right"),
            F.expr(
                "CAST(floor((total_sse - split_sse) * 1000000"
                " / total_sse) AS BIGINT)"
            ).alias("sse_drop_ppm"),
        )
    )


# --------------------------- exact type-7 quantile bands

# Per-category price quartiles with R's default type-7 LINEAR
# INTERPOLATION computed EXACTLY: at p = k/4 the interpolation
# fraction is a quarter, so reporting values in QUARTER-CENTS
# (4*lo + r*(hi-lo), r = ((n-1)*k) mod 4) keeps the whole quantile in
# integers — no float quantile disagreement possible.  Complements
# percentile_disc (segment_price_quantiles) and the sketch twin
# (_approx): this is the exact-interpolated rung of the ladder.
@register(
    "category_quantile_bands",
    """
    WITH pts AS (
      SELECT p_type AS category,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    ranked AS (
      SELECT category, cents,
             ROW_NUMBER() OVER (PARTITION BY category
                                ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY category) AS n
      FROM pts
    ),
    pos AS (
      SELECT category, n, u.k AS k,
             ((n - 1) * u.k) // 4 + 1 AS lo_rank,
             ((n - 1) * u.k) % 4 AS r
      FROM (SELECT DISTINCT category, n FROM ranked)
      CROSS JOIN UNNEST(range(1, 4)) AS u(k)
    ),
    picked AS (
      SELECT p.category, p.k,
             MAX(CASE WHEN r.rn = p.lo_rank THEN r.cents END) AS lo,
             MAX(CASE WHEN r.rn = p.lo_rank + 1 THEN r.cents END) AS hi,
             p.r, p.n
      FROM pos p
      JOIN ranked r ON r.category = p.category
                   AND r.rn IN (p.lo_rank, p.lo_rank + 1)
      GROUP BY p.category, p.k, p.r, p.n
    )
    SELECT category, MAX(n) AS n_lines,
           MAX(CASE WHEN k = 1 THEN 4 * lo + r * (COALESCE(hi, lo) - lo)
               END) AS q25_qcents,
           MAX(CASE WHEN k = 2 THEN 4 * lo + r * (COALESCE(hi, lo) - lo)
               END) AS q50_qcents,
           MAX(CASE WHEN k = 3 THEN 4 * lo + r * (COALESCE(hi, lo) - lo)
               END) AS q75_qcents
    FROM picked
    GROUP BY category
    ORDER BY category
    """,
)
def category_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-7 quartiles per category in quarter-cents: one
    per-category sort window, a 3-row position spine from the counts,
    and positional picks of lo/hi neighbors — the interpolated
    quantile with zero floating point.  (hi is NULL only at p=1.0
    edge cases where r=0; COALESCE keeps the algebra total.)"""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    pts = li.join(F.broadcast(part), "l_partkey").select("category", "cents")
    w = Window.partitionBy("category")
    ranked = pts.select(
        "category",
        "cents",
        F.row_number().over(w.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    ks = spark.range(1, 4).select(F.col("id").alias("k"))
    pos = (
        ranked.select("category", "n")
        .distinct()
        .crossJoin(F.broadcast(ks))
        .select(
            "category",
            "n",
            "k",
            F.expr("((n - 1) * k) div 4 + 1").alias("lo_rank"),
            F.expr("((n - 1) * k) % 4").alias("r"),
        )
    )
    ranked2 = ranked.select(
        F.col("category").alias("cat_r"), "cents", "rn"
    )
    picked = (
        pos.join(
            ranked2,
            (F.col("cat_r") == F.col("category"))
            & (
                (F.col("rn") == F.col("lo_rank"))
                | (F.col("rn") == F.col("lo_rank") + 1)
            ),
        )
        .groupBy("category", "k", "r", "n")
        .agg(
            F.max(F.when(F.col("rn") == F.col("lo_rank"), F.col("cents")))
            .alias("lo"),
            F.max(
                F.when(F.col("rn") == F.col("lo_rank") + 1, F.col("cents"))
            ).alias("hi"),
        )
    )
    band = F.expr("4 * lo + r * (COALESCE(hi, lo) - lo)")
    return (
        picked.groupBy("category")
        .agg(
            F.max("n").alias("n_lines"),
            F.max(F.when(F.col("k") == 1, band)).alias("q25_qcents"),
            F.max(F.when(F.col("k") == 2, band)).alias("q50_qcents"),
            F.max(F.when(F.col("k") == 3, band)).alias("q75_qcents"),
        )
        .orderBy("category")
    )


# --------------------------- k-core peeling

# Four peeling rounds toward the 2-core of the co-purchase graph:
# each round drops nodes with degree < k and the edges touching them
# — the standard "dense enough to matter" filter before community or
# influence analysis.  Fixed rounds (like part_pagerank /
# part_label_propagation) keep the result a deterministic invariant;
# each round is one degree count + two semi joins, all equi-keyed.
KCORE_K = 2
KCORE_ROUNDS = 4
# sup=2/k=2 keeps the peeling discriminative at every test SF
# (sup2-k3 empties at sf0.1; sup1 graphs are so dense nothing peels)
KCORE_MIN_SUPPORT = 2


def _kcore_oracle() -> str:
    steps = [f"""
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {KCORE_MIN_SUPPORT}
    ),
    e0 AS (
      SELECT src, dst FROM pairs
      UNION ALL SELECT dst AS src, src AS dst FROM pairs
    )"""]
    prev = "e0"
    for t in range(1, KCORE_ROUNDS + 1):
        steps.append(f"""
    k{t} AS (
      SELECT src FROM {prev} GROUP BY src
      HAVING COUNT(*) >= {KCORE_K}
    ),
    e{t} AS (
      SELECT e.src, e.dst FROM {prev} e
      JOIN k{t} a ON e.src = a.src
      JOIN k{t} b ON e.dst = b.src
    )""")
        prev = f"e{t}"
    return (
        "WITH " + ",".join(steps)
        + f"""
    SELECT src AS p_partkey, COUNT(*) AS degree
    FROM {prev} GROUP BY src
    ORDER BY p_partkey
    """
    )


@register("part_kcore", _kcore_oracle())
def part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peel toward the 2-core: per round, degree count (groupBy) then
    two semi joins restrict edges to surviving endpoints; edge tables
    are localCheckpoint'ed per round (plan re-expansion lesson).
    Output: surviving parts with their within-subgraph degree after
    4 rounds."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= KCORE_MIN_SUPPORT)
        .select("src", "dst")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= KCORE_K)
            .select("src")
        )
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
    return (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("src").alias("p_partkey"), "degree")
        .orderBy("p_partkey")
    )


# --------------------------- Neyman sample allocation

# Optimal stratified-sampling design: allocate a fixed label/audit
# budget across (lang, source) strata proportional to N_h * sigma_h
# (Neyman allocation minimizes the estimator variance for the mean of
# n_chars).  sigma from exact integer sums; quotas by the same
# Hamilton largest-remainder recipe as revenue_recognition, so the
# allocation sums to the budget EXACTLY.  All post-rollup work is
# strata-vocabulary-sized.
NEYMAN_BUDGET = 1000


@register(
    "neyman_allocation",
    f"""
    WITH strata AS (
      SELECT lang, source, COUNT(*) AS n_h,
             CAST(SUM(n_chars) AS BIGINT) AS s_h,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS q_h
      FROM documents GROUP BY 1, 2
    ),
    w AS (
      SELECT lang, source, n_h,
             n_h * sqrt(
               (CAST(q_h AS DOUBLE) * n_h - CAST(s_h AS DOUBLE) * s_h)
               / (CAST(n_h AS DOUBLE) * GREATEST(n_h - 1, 1))) AS wgt
      FROM strata
    ),
    tot AS (SELECT SUM(wgt) AS wsum FROM w),
    quota AS (
      SELECT lang, source, n_h, wgt,
             CAST(floor({NEYMAN_BUDGET} * wgt / wsum) AS BIGINT) AS base,
             {NEYMAN_BUDGET} * wgt / wsum
               - floor({NEYMAN_BUDGET} * wgt / wsum) AS rem
      FROM w CROSS JOIN tot
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rr,
             {NEYMAN_BUDGET} - CAST(SUM(base) OVER () AS BIGINT)
               AS shortfall
      FROM quota
    )
    SELECT lang, source, n_h,
           CAST(floor(wgt * 1000) AS BIGINT) AS weight_e3,
           base + CASE WHEN rr <= shortfall THEN 1 ELSE 0 END AS alloc_n
    FROM ranked
    ORDER BY lang, source
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation of a {NEYMAN_BUDGET}-unit audit budget over
    (lang, source) strata: one fact-sized rollup to exact integer
    (n, sum, sum-of-squares), sigma and weights in deterministic
    doubles, Hamilton largest-remainder top-ups (rem desc, lang,
    source tie-break) so allocations sum to the budget exactly."""
    from pyspark.sql import Window

    strata = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.sum("n_chars").alias("s_h"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("q_h"),
        )
    )
    w = strata.select(
        "lang",
        "source",
        "n_h",
        F.expr(
            "n_h * sqrt("
            " (CAST(q_h AS DOUBLE) * n_h - CAST(s_h AS DOUBLE) * s_h)"
            " / (CAST(n_h AS DOUBLE) * GREATEST(n_h - 1, 1)))"
        ).alias("wgt"),
    )
    tot = w.agg(F.sum("wgt").alias("wsum"))
    quota = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_h",
        "wgt",
        F.expr(
            f"CAST(floor({NEYMAN_BUDGET} * wgt / wsum) AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"{NEYMAN_BUDGET} * wgt / wsum"
            f" - floor({NEYMAN_BUDGET} * wgt / wsum)"
        ).alias("rem"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = quota.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "lang", "source"))
        .alias("rr"),
        (F.lit(NEYMAN_BUDGET) - F.sum("base").over(w_all)).alias(
            "shortfall"
        ),
    )
    return ranked.select(
        "lang",
        "source",
        "n_h",
        F.expr("CAST(floor(wgt * 1000) AS BIGINT)").alias("weight_e3"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("shortfall"), 1).otherwise(0)
        ).alias("alloc_n"),
    ).orderBy("lang", "source")


# --------------------------- maximum drawdown

# Worst peak-to-trough drop of the daily-revenue series — the
# finance-style stability gauge.  The running peak and both argmax
# tie-breaks (earliest peak day, earliest trough day) are encoded as
# single BIGINTs (rev*1e5 - epoch_day is injective while epoch_day <
# 1e5, i.e. until year 2243), so the whole query is integer windows +
# one integer global max: zero floats, zero ordering ambiguity.
@register(
    "revenue_max_drawdown",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    runpk AS (
      SELECT de, rev,
             CAST(MAX(rev * 100000 - de) OVER (ORDER BY de) AS BIGINT)
               AS peak_code
      FROM daily
    ),
    dd AS (
      SELECT de, rev, peak_code,
             (peak_code + 100000 - 1) // 100000 AS peak_rev,
             ((peak_code + 100000 - 1) // 100000) - rev AS draw
      FROM runpk
    ),
    best AS (
      SELECT CAST(MAX(draw * 100000 - de) AS BIGINT) AS best_code
      FROM dd
    )
    SELECT d.peak_rev * 100000 - d.peak_code AS peak_day_epoch,
           d.de AS trough_day_epoch,
           d.peak_rev, d.rev AS trough_rev, d.draw AS drawdown,
           d.draw * 1000000 // d.peak_rev AS drawdown_ppm
    FROM dd d JOIN best b
      ON d.draw * 100000 - d.de = b.best_code
    """,
)
def revenue_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown of daily revenue: one ordered running-max window
    (integer-encoded argmax), one global integer max, one equi-join
    back to decode the winning row.  |days|-sized after the rollup."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1970-01-01").cast("date")).alias("de")
        )
        .agg(F.sum(F.floor("o_totalprice").cast("bigint")).alias("rev"))
    )
    runpk = daily.select(
        "de",
        "rev",
        F.max(F.col("rev") * 100000 - F.col("de"))
        .over(Window.orderBy("de").rowsBetween(Window.unboundedPreceding, 0))
        .alias("peak_code"),
    )
    dd = runpk.select(
        "de",
        "rev",
        "peak_code",
        F.expr("(peak_code + 100000 - 1) div 100000").alias("peak_rev"),
        F.expr(
            "((peak_code + 100000 - 1) div 100000) - rev"
        ).alias("draw"),
    ).localCheckpoint(eager=False)  # feeds best + decode join
    best = dd.agg(
        F.max(F.col("draw") * 100000 - F.col("de")).alias("best_code")
    )
    return (
        dd.join(
            F.broadcast(best),
            F.col("draw") * 100000 - F.col("de") == F.col("best_code"),
        )
        .select(
            (F.col("peak_rev") * 100000 - F.col("peak_code"))
            .alias("peak_day_epoch"),
            F.col("de").alias("trough_day_epoch"),
            "peak_rev",
            F.col("rev").alias("trough_rev"),
            F.col("draw").alias("drawdown"),
            F.expr("draw * 1000000 div peak_rev").alias("drawdown_ppm"),
        )
    )


# --------------------------- common-neighbor link prediction

# Recommender-graph link prediction: for part pairs NOT yet
# co-purchased, count shared co-purchase neighbors — the classic
# common-neighbors score whose top pairs are "customers who buy both
# of these buy the same third things".  Two-hop paths come from one
# edge-edge equi-join on the middle node; existing edges are removed
# with an anti join; all integer counts with full (score desc, a, b)
# tie-break.
LINKPRED_TOPK = 20


@register(
    "part_link_prediction",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {PLP_MIN_SUPPORT}
    ),
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL SELECT dst AS src, src AS dst FROM pairs
    ),
    two_hop AS (
      SELECT e1.src AS a, e2.dst AS b, COUNT(DISTINCT e1.dst) AS cn
      FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
      WHERE e1.src < e2.dst
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT t.a, t.b, t.cn
      FROM two_hop t
      LEFT JOIN pairs p ON t.a = p.src AND t.b = p.dst
      WHERE p.src IS NULL
    )
    SELECT a AS part_a, b AS part_b, cn AS common_neighbors
    FROM cand
    ORDER BY cn DESC, a, b
    LIMIT {LINKPRED_TOPK}
    """,
)
def part_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links on the support-2 co-purchase graph by
    common-neighbor count: edge-edge equi-join on the middle node ->
    distinct-middle count per (a < b) -> anti join against existing
    edges -> TakeOrdered.  Everything is equi-keyed; the two-hop
    fan-out is bounded by the pruned graph's degree."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= PLP_MIN_SUPPORT)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # feeds edges + anti join
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("z"))
    e2 = edges.select(F.col("src").alias("z"), F.col("dst").alias("b"))
    two_hop = (
        e1.join(e2, "z")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.countDistinct("z").alias("cn"))
    )
    cand = two_hop.join(
        pairs.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return (
        cand.select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("cn").alias("common_neighbors"),
        )
        .orderBy(F.col("common_neighbors").desc(), "part_a", "part_b")
        .limit(LINKPRED_TOPK)
    )


# --------------------------- two-way ANOVA

# Two-way ANOVA with interaction on order value: does revenue-per-
# order differ by customer nation, by order priority, and by their
# interaction?  The whole decomposition reduces over ONE cell-level
# rollup (nation x priority: n, sum, sum-of-squares in exact integer
# cents); SS terms and F ratios are computed from those integers in
# fixed-order doubles.  Unbalanced design uses the classic
# "factor-margin" (Type I sequential, A then B) sums of squares.
@register(
    "anova_nation_priority",
    """
    WITH cells AS (
      SELECT n_name AS nation, o_orderpriority AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(floor(o_totalprice) AS BIGINT))
               AS BIGINT) AS s,
             CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)
                      * CAST(floor(o_totalprice) AS BIGINT))
               AS BIGINT) AS q
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    grand AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS BIGINT) AS ss,
             CAST(SUM(q) AS BIGINT) AS qq,
             COUNT(*) AS n_cells,
             COUNT(DISTINCT nation) AS n_a,
             COUNT(DISTINCT priority) AS n_b
      FROM cells
    ),
    ma AS (
      SELECT nation, CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS s
      FROM cells GROUP BY nation
    ),
    mb AS (
      SELECT priority, CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS s
      FROM cells GROUP BY priority
    ),
    ea AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(s AS DOUBLE) * s / n ORDER BY nation)),
             (a, b) -> a + b) AS v FROM ma
    ),
    eb AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(s AS DOUBLE) * s / n ORDER BY priority)),
             (a, b) -> a + b) AS v FROM mb
    ),
    ec AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(s AS DOUBLE) * s / n
                    ORDER BY nation, priority)),
             (a, b) -> a + b) AS v FROM cells
    ),
    terms AS (
      SELECT
        (SELECT v FROM ea)
          - (SELECT CAST(ss AS DOUBLE) * ss / nn FROM grand) AS ss_a,
        (SELECT v FROM eb)
          - (SELECT CAST(ss AS DOUBLE) * ss / nn FROM grand) AS ss_b,
        (SELECT v FROM ec)
          - (SELECT v FROM ea)
          - (SELECT v FROM eb)
          + (SELECT CAST(ss AS DOUBLE) * ss / nn FROM grand) AS ss_ab,
        (SELECT CAST(qq AS DOUBLE) FROM grand)
          - (SELECT v FROM ec) AS ss_e,
        (SELECT n_a FROM grand) AS n_a,
        (SELECT n_b FROM grand) AS n_b,
        (SELECT n_cells FROM grand) AS n_cells,
        (SELECT nn FROM grand) AS nn
    )
    SELECT effect, df, CAST(floor(ss_term) AS BIGINT)
             AS ss_dollars2,
           CAST(floor((ss_term / df)
                      / (ss_e / (nn - n_cells)) * 1000) AS BIGINT)
             AS f_stat_e3
    FROM (
      SELECT 'nation' AS effect, n_a - 1 AS df, ss_a AS ss_term,
             ss_e, nn, n_cells FROM terms
      UNION ALL
      SELECT 'priority', n_b - 1, ss_b, ss_e, nn, n_cells FROM terms
      UNION ALL
      SELECT 'interaction', n_cells - n_a - n_b + 1, ss_ab, ss_e, nn,
             n_cells FROM terms
    )
    ORDER BY effect
    """,
)
def anova_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA (nation x priority) on order value: one
    fact-sized rollup to 125 cells of exact integer (n, Σdollars,
    Σdollars² — dollars, not cents, so Σx² stays under int64 up to
    ~sf30); margins, grand totals, SS terms and F stats all reduce
    from those integers in deterministic doubles.  Dims broadcast;
    the 1-row term table assembles via crossJoins."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice) AS BIGINT)").alias("dol"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    cells = (
        orders.join(F.broadcast(cust), "o_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dol").alias("s"),
            F.sum(F.col("dol") * F.col("dol")).alias("q"),
        )
        .localCheckpoint(eager=True)  # feeds grand/margins/cell term
    )
    grand = cells.agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("nation").alias("n_a"),
        F.countDistinct("priority").alias("n_b"),
    )
    # key-ordered double folds (collect_list -> sort -> aggregate):
    # a plain SUM of doubles is partition-order dependent and flips
    # floor() at SS boundaries — the fold pins one IEEE order that
    # the oracle's list(... ORDER BY key) replays exactly
    def _fold(col_expr: str, keys: str, alias: str):
        return F.expr(
            "aggregate(array_sort(collect_list(named_struct("
            f"{keys}, 'v', {col_expr}))), CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + x.v)"
        ).alias(alias)

    ta = cells.groupBy("nation").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    ).agg(_fold("CAST(s AS DOUBLE) * s / n", "'k1', nation", "expl_a"))
    tb = cells.groupBy("priority").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    ).agg(_fold("CAST(s AS DOUBLE) * s / n", "'k1', priority", "expl_b"))
    tc = cells.agg(
        _fold(
            "CAST(s AS DOUBLE) * s / n",
            "'k1', nation, 'k2', priority",
            "expl_cells",
        )
    )
    terms = (
        grand.crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tc))
        .select(
            F.expr("expl_a - CAST(ss AS DOUBLE) * ss / nn").alias("ss_a"),
            F.expr("expl_b - CAST(ss AS DOUBLE) * ss / nn").alias("ss_b"),
            F.expr(
                "expl_cells - expl_a - expl_b"
                " + CAST(ss AS DOUBLE) * ss / nn"
            ).alias("ss_ab"),
            F.expr("CAST(qq AS DOUBLE) - expl_cells").alias("ss_e"),
            "n_a",
            "n_b",
            "n_cells",
            "nn",
        )
    )
    rows = terms.selectExpr(
        "stack(3,"
        " 'nation', CAST(n_a - 1 AS BIGINT), ss_a,"
        " 'priority', CAST(n_b - 1 AS BIGINT), ss_b,"
        " 'interaction', CAST(n_cells - n_a - n_b + 1 AS BIGINT), ss_ab)"
        " AS (effect, df, ss_term)",
        "ss_e",
        "nn",
        "n_cells",
    )
    return rows.select(
        "effect",
        "df",
        F.expr("CAST(floor(ss_term) AS BIGINT)").alias(
            "ss_dollars2"
        ),
        F.expr(
            "CAST(floor((ss_term / df) / (ss_e / (nn - n_cells))"
            " * 1000) AS BIGINT)"
        ).alias("f_stat_e3"),
    ).orderBy("effect")


# --------------------------- packing efficiency planner

# Sequence-packing cost planner: for each candidate context length,
# how many tokens survive truncation, how much padding the naive
# one-doc-per-row layout wastes, and how many rows a greedy packer
# would need (ceil(kept/ctx) — the information-theoretic floor).
# This is the "which context size do we train at" table; every value
# is an exact integer ratio.  One doc scan fanned by a 4-row
# broadcast spine.
PACKING_CTX_SIZES = (128, 256, 512, 1024)


@register(
    "corpus_packing_efficiency",
    f"""
    WITH toks AS (
      SELECT len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    spine AS (SELECT CAST(u.c AS BIGINT) AS ctx
              FROM UNNEST([{", ".join(str(c) for c in PACKING_CTX_SIZES)}])
                AS u(c)),
    per AS (
      SELECT s.ctx,
             COUNT(*) AS n_docs,
             CAST(SUM(t.n_tok) AS BIGINT) AS total_tokens,
             CAST(SUM(LEAST(t.n_tok, s.ctx)) AS BIGINT) AS kept_tokens,
             CAST(SUM(CASE WHEN t.n_tok > s.ctx THEN 1 ELSE 0 END)
               AS BIGINT) AS n_truncated
      FROM toks t CROSS JOIN spine s
      GROUP BY s.ctx
    )
    SELECT ctx, n_docs, total_tokens, kept_tokens, n_truncated,
           (n_docs * ctx - kept_tokens) * 1000000 // (n_docs * ctx)
             AS pad_waste_ppm,
           (kept_tokens + ctx - 1) // ctx AS packed_rows,
           (((kept_tokens + ctx - 1) // ctx) * ctx - kept_tokens)
             * 1000000 // (((kept_tokens + ctx - 1) // ctx) * ctx)
             AS packed_waste_ppm
    FROM per
    ORDER BY ctx
    """,
)
def corpus_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation/padding/packing economics per candidate context
    length: whitespace token counts once per doc, a broadcast ctx
    spine, integer LEAST/ceil arithmetic — the exact planning table
    for sequence packing."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    spine = spark.createDataFrame(
        [(c,) for c in PACKING_CTX_SIZES], "ctx long"
    )
    per = (
        toks.crossJoin(F.broadcast(spine))
        .groupBy("ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.least("n_tok", "ctx")).alias("kept_tokens"),
            F.sum(
                F.when(F.col("n_tok") > F.col("ctx"), 1).otherwise(0)
            ).alias("n_truncated"),
        )
    )
    return per.select(
        "ctx",
        "n_docs",
        "total_tokens",
        "kept_tokens",
        "n_truncated",
        F.expr(
            "(n_docs * ctx - kept_tokens) * 1000000 div (n_docs * ctx)"
        ).alias("pad_waste_ppm"),
        F.expr("(kept_tokens + ctx - 1) div ctx").alias("packed_rows"),
        F.expr(
            "(((kept_tokens + ctx - 1) div ctx) * ctx - kept_tokens)"
            " * 1000000 div (((kept_tokens + ctx - 1) div ctx) * ctx)"
        ).alias("packed_waste_ppm"),
    ).orderBy("ctx")


# --------------------------- hard-negative mining

# Contrastive-pair mining for embedding training: per query vector,
# the best same-label match (positive) and the best OTHER-label match
# (hard negative) by exact int64 micro-unit dot product, plus the
# margin between them — the pairs that make metric-learning batches
# informative.  Same broadcast-queries-vs-corpus shape as
# brute_force_topk (plan-exempt); all scoring integer-exact with
# smallest-corpus-id tie-break via integer argmax encoding.
HARDNEG_N_QUERIES = 10


@register(
    "embedding_hard_negatives",
    f"""
    WITH ve AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000) AS BIGINT)) AS xs
      FROM embeddings
    ),
    q AS (SELECT * FROM ve WHERE vec_id < {HARDNEG_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS corpus_id, c.label AS corpus_label,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 65), j -> q.xs[j] * c.xs[j])),
               (a, b) -> a + b) AS dot_micro2
      FROM q JOIN ve c ON c.vec_id <> q.vec_id
    ),
    picked AS (
      SELECT query_id, query_label, corpus_id, corpus_label,
             dot_micro2,
             ROW_NUMBER() OVER (
               PARTITION BY query_id,
                            (corpus_label = query_label)
               ORDER BY dot_micro2 DESC, corpus_id) AS rn
      FROM scored
    )
    SELECT query_id, query_label,
           MAX(CASE WHEN corpus_label = query_label
               THEN corpus_id END) AS pos_id,
           MAX(CASE WHEN corpus_label = query_label
               THEN dot_micro2 END) AS pos_dot_micro2,
           MAX(CASE WHEN corpus_label <> query_label
               THEN corpus_id END) AS hneg_id,
           MAX(CASE WHEN corpus_label <> query_label
               THEN dot_micro2 END) AS hneg_dot_micro2,
           MAX(CASE WHEN corpus_label = query_label
               THEN dot_micro2 END)
             - MAX(CASE WHEN corpus_label <> query_label
                   THEN dot_micro2 END) AS margin_micro2
    FROM picked WHERE rn = 1
    GROUP BY query_id, query_label
    ORDER BY query_id
    """,
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per query (vec_id < 10): best same-label (positive) and best
    other-label (hard negative) corpus vectors by exact int64
    micro-dot, picked with a per-(query, same-label?) window ordered
    (dot desc, corpus_id) — fully deterministic — then pivoted to one
    row per query with the contrastive margin.  Queries broadcast
    against one corpus scan (brute_force_topk shape)."""
    from pyspark.sql import Window

    ve = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("xs"),
    )
    q = ve.where(F.col("vec_id") < HARDNEG_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("xs").alias("q_xs"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(ve)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("corpus_id"),
            F.col("label").alias("corpus_label"),
            F.expr(
                "aggregate(zip_with(q_xs, xs, (x, y) -> x * y),"
                " CAST(0 AS BIGINT), (a, v) -> a + v)"
            ).alias("dot_micro2"),
        )
    )
    picked = scored.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy(
                "query_id", F.col("corpus_label") == F.col("query_label")
            ).orderBy(F.col("dot_micro2").desc(), "corpus_id")
        )
        .alias("rn"),
    ).where(F.col("rn") == 1)
    same = F.col("corpus_label") == F.col("query_label")
    return (
        picked.groupBy("query_id", "query_label")
        .agg(
            F.max(F.when(same, F.col("corpus_id"))).alias("pos_id"),
            F.max(F.when(same, F.col("dot_micro2"))).alias(
                "pos_dot_micro2"
            ),
            F.max(F.when(~same, F.col("corpus_id"))).alias("hneg_id"),
            F.max(F.when(~same, F.col("dot_micro2"))).alias(
                "hneg_dot_micro2"
            ),
        )
        .select(
            "*",
            (F.col("pos_dot_micro2") - F.col("hneg_dot_micro2")).alias(
                "margin_micro2"
            ),
        )
        .orderBy("query_id")
    )


# --------------------------- sequential purchase rules

# "Bought A, next order contains B": association rules ACROSS
# consecutive orders of the same customer — the sequential complement
# to basket_rules (within one basket) and events_transition_matrix
# (event types).  Consecutive orders pair by a per-customer
# row_number self-join; the A x B fan-out is bounded by parts-per-
# order squared; lift is exact integer ppm from first/second-position
# marginals.
SEQRULE_TOPK = 20


@register(
    "part_sequence_rules",
    f"""
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    consec AS (
      SELECT a.o_orderkey AS ok1, b.o_orderkey AS ok2
      FROM seq a JOIN seq b ON a.o_custkey = b.o_custkey
                           AND b.rn = a.rn + 1
    ),
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ab AS (
      SELECT p1.l_partkey AS part_a, p2.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM consec c
      JOIN li p1 ON p1.l_orderkey = c.ok1
      JOIN li p2 ON p2.l_orderkey = c.ok2
      WHERE p1.l_partkey <> p2.l_partkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM consec),
    ma AS (
      SELECT p1.l_partkey AS part_a, COUNT(DISTINCT c.ok1) AS n_a
      FROM consec c JOIN li p1 ON p1.l_orderkey = c.ok1
      GROUP BY 1
    ),
    mb AS (
      SELECT p2.l_partkey AS part_b, COUNT(DISTINCT c.ok2) AS n_b
      FROM consec c JOIN li p2 ON p2.l_orderkey = c.ok2
      GROUP BY 1
    )
    SELECT ab.part_a, ab.part_b, ab.n_ab,
           ab.n_ab * t.n_pairs * 1000000 // (ma.n_a * mb.n_b)
             AS lift_ppm
    FROM ab
    JOIN ma ON ab.part_a = ma.part_a
    JOIN mb ON ab.part_b = mb.part_b
    CROSS JOIN tot t
    ORDER BY ab.n_ab DESC, ab.part_a, ab.part_b
    LIMIT {SEQRULE_TOPK}
    """,
)
def part_sequence_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 next-order purchase rules: per-customer order ranking
    window, consecutive-pair self-join (equi on custkey + rank),
    part fan-in from two lineitem joins, exact integer lift vs the
    first/second-position marginals, TakeOrdered tie-broken
    (n desc, a, b)."""
    from pyspark.sql import Window

    seq = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("rn"),
    )
    a = seq.select("o_custkey", F.col("o_orderkey").alias("ok1"), "rn")
    b = seq.select(
        "o_custkey",
        F.col("o_orderkey").alias("ok2"),
        (F.col("rn") - 1).alias("rn"),
    )
    consec = a.join(b, ["o_custkey", "rn"]).select("ok1", "ok2")
    consec = consec.localCheckpoint(eager=True)  # feeds ab/tot/ma/mb
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    p1 = li.select(
        F.col("l_orderkey").alias("ok1"), F.col("l_partkey").alias("part_a")
    )
    p2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    withp = consec.join(p1, "ok1").join(p2, "ok2")
    ab = (
        withp.where(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    tot = consec.agg(F.count(F.lit(1)).alias("n_pairs"))
    ma = (
        consec.join(p1, "ok1")
        .groupBy("part_a")
        .agg(F.countDistinct("ok1").alias("n_a"))
    )
    mb = (
        consec.join(p2, "ok2")
        .groupBy("part_b")
        .agg(F.countDistinct("ok2").alias("n_b"))
    )
    return (
        ab.join(ma, "part_a")
        .join(mb, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr(
                "n_ab * n_pairs * 1000000 div (n_a * n_b)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("n_ab").desc(), "part_a", "part_b")
        .limit(SEQRULE_TOPK)
    )


# --------------------------- LATERAL correlated top-k

# Top-3 suppliers per nation expressed as a correlated LATERAL
# subquery — the SQL-surface rung Spark 4 added (correlated
# subqueries in FROM): the engine decorrelates the per-nation
# ORDER BY ... LIMIT into the same window plan topk_per_group builds
# by hand, which is exactly what the plan contract asserts (no
# nested-loop re-execution per outer row).  Money kept in integer
# cents; ordering fully tie-broken.
@register(
    "lateral_topk_suppliers",
    """
    SELECT n.n_name AS nation, x.s_name, x.bal_cents, x.rnk
    FROM nation n,
    LATERAL (
      SELECT s_name,
             CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_cents,
             ROW_NUMBER() OVER (
               ORDER BY CAST(floor(s_acctbal * 100) AS BIGINT) DESC,
                        s_suppkey) AS rnk
      FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY bal_cents DESC, s_suppkey
      LIMIT 3
    ) x
    ORDER BY nation, x.rnk
    """,
)
def lateral_topk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-3 per nation, written as SQL so
    Catalyst's decorrelation (RewriteLateralSubquery) produces the
    windowed top-k plan — the declarative twin of topk_per_group.
    Dims are vocabulary-sized; supplier is scanned once."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "lat_nation"
    )
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "lat_supplier"
    )
    return spark.sql(
        """
        SELECT n.n_name AS nation, x.s_name, x.bal_cents, x.rnk
        FROM lat_nation n,
        LATERAL (
          SELECT s_name,
                 CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_cents,
                 ROW_NUMBER() OVER (
                   ORDER BY CAST(floor(s_acctbal * 100) AS BIGINT) DESC,
                            s_suppkey) AS rnk
          FROM lat_supplier s
          WHERE s.s_nationkey = n.n_nationkey
          ORDER BY bal_cents DESC, s_suppkey
          LIMIT 3
        ) x
        ORDER BY nation, x.rnk
        """
    )


# --------------------------- inclusion-dependency audit

# Foreign-key DISCOVERY (not verification): for every declared or
# suspected child->parent column pair, measure containment — what
# fraction of distinct child values exist in the parent — plus both
# distinct cardinalities.  1.0 containment = a real FK (ri_orphans'
# precondition); partial containment flags drifting references.  Each
# pair costs two distinct-aggregations and one left anti join on
# ALREADY-DISTINCT keys; the pair list is fixed metadata, so the
# whole audit is a union of small key-space queries.
FK_CANDIDATE_PAIRS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
)


def _fk_oracle() -> str:
    parts = []
    for child, ckey, parent, pkey in FK_CANDIDATE_PAIRS:
        parts.append(f"""
    SELECT '{child}.{ckey}' AS child_col,
           '{parent}.{pkey}' AS parent_col,
           (SELECT COUNT(DISTINCT {ckey}) FROM {child}) AS n_child,
           (SELECT COUNT(DISTINCT {pkey}) FROM {parent}) AS n_parent,
           (SELECT COUNT(*) FROM (
              SELECT DISTINCT {ckey} AS v FROM {child}
              WHERE {ckey} IS NOT NULL
           ) c WHERE c.v IN (SELECT {pkey} FROM {parent}))
             * 1000000
             // (SELECT COUNT(DISTINCT {ckey}) FROM {child})
             AS containment_ppm""")
    return " UNION ALL ".join(parts) + " ORDER BY child_col, parent_col"


@register("fk_inclusion_audit", _fk_oracle())
def fk_inclusion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency profile over the declared candidate FK
    pairs: per pair, distinct cardinalities both sides and
    containment ppm via a semi join of the deduped child key space
    against the parent.  Results union into one metadata table."""
    out = None
    for child, ckey, parent, pkey in FK_CANDIDATE_PAIRS:
        c = (
            load_table(spark, sf_dir, child)
            .select(F.col(ckey).alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
        )
        p = load_table(spark, sf_dir, parent).select(
            F.col(pkey).alias("v")
        )
        stats = (
            c.join(p.distinct(), "v", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_contained"))
            .crossJoin(
                F.broadcast(c.agg(F.count(F.lit(1)).alias("n_child")))
            )
            .crossJoin(
                F.broadcast(
                    p.agg(F.countDistinct("v").alias("n_parent"))
                )
            )
            .select(
                F.lit(f"{child}.{ckey}").alias("child_col"),
                F.lit(f"{parent}.{pkey}").alias("parent_col"),
                "n_child",
                "n_parent",
                F.expr(
                    "n_contained * 1000000 div n_child"
                ).alias("containment_ppm"),
            )
        )
        out = stats if out is None else out.unionByName(stats)
    return out.orderBy("child_col", "parent_col")


# --------------------------- VARIANT semi-structured path

# Spark 4's VARIANT type as the semi-structured fast path: props
# parses ONCE into the binary variant encoding (parse_json), then
# typed paths extract JVM-side (variant_get / try_variant_get) — the
# engine-native successor to get_json_object string re-parsing that
# scalar_json demonstrates.  The rollup grades extraction totals,
# missing-path behavior (try_variant_get -> NULL, never an error),
# and type-cast strictness per event type.
@register(
    "variant_props_kpis",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS n_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS max_k,
           COUNT(json_extract_string(props, '$.missing')) AS n_missing
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_props_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse props to VARIANT once, extract '$.k' as a typed BIGINT
    and a deliberately missing path via try_variant_get (NULL, not an
    error), then a per-type rollup — one scan, all extraction inside
    codegen on the binary variant encoding."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    return (
        ev.select(
            "event_type",
            F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
            F.expr("try_variant_get(v, '$.missing', 'string')").alias(
                "miss"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("miss").alias("n_missing"),
        )
        .orderBy("event_type")
    )


# --------------------------- Observation metrics

# Spark's Observation API as the pipeline-instrumentation surface:
# named aggregate metrics ride ON the production query (df.observe)
# and are harvested from the SAME pass — no second scan, no sampling
# — the mechanism a 100-TB job uses to publish row counts / null
# rates / money totals to its run ledger.  The observed numbers are
# returned as a table and graded against a direct SQL computation.
@register(
    "pipeline_observed_metrics",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END)
             AS BIGINT) AS n_null_price,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
    FROM orders
    """,
)
def pipeline_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach four named metrics to the orders scan via df.observe,
    drive the pass with a count(), and return Observation.get as a
    one-row table — run-ledger instrumentation for free on the
    production plan."""
    from pyspark.sql import Observation

    obs = Observation("orders_metrics")
    orders = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias(
            "n_null_price"
        ),
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
            "revenue_cents"
        ),
        F.max("o_orderkey").alias("max_orderkey"),
    )
    orders.count()  # one action materializes the metrics
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_price"],
                m["revenue_cents"],
                m["max_orderkey"],
            )
        ],
        "n_rows long, n_null_price long, revenue_cents long,"
        " max_orderkey long",
    )


# --------------------------- inventory policy replay

# Deterministic (s, S) inventory simulation as a QUERY: replay each
# part's day-ordered demand through an order-up-to policy (reorder
# point s = mean daily demand, order-up-to S = 3x mean) counting
# stockout days, lost units and replenishment orders — "what would
# this policy have done" over history, entirely in exact integers.
# The per-part day array is calendar-bounded, so the fold is O(days)
# per part inside one partial-aggregated groupBy; no joins at all
# after the rollup.
# DuckDB's list_reduce mis-folds STRUCT accumulators (field lanes
# reduce independently — verified with a trace probe), so the oracle
# replays the identical policy as three scalar folds whose packed
# state is metric*1e5 + inventory (inventory < 1e5 by the 3x-mean
# bound; metrics bounded by days/total-units, margins ~1e6x).
def _inv_fold(metric_expr: str) -> str:
    inv = "(a % 100000)"
    served = f"LEAST({inv}, e)"
    rem = f"({inv} - {served})"
    invp = (
        f"CASE WHEN {rem} <= mean_q THEN 3 * mean_q ELSE {rem} END"
    )
    return (
        "list_reduce(list_prepend(3 * mean_q, seq),"
        f" (a, e) -> ({metric_expr}) * 100000 + ({invp}))"
    )


_INV_ORDERS = _inv_fold(
    "(a // 100000) + CASE WHEN (a % 100000)"
    " - LEAST(a % 100000, e) <= mean_q THEN 1 ELSE 0 END"
)
_INV_SO = _inv_fold(
    "(a // 100000) + CASE WHEN e > (a % 100000) THEN 1 ELSE 0 END"
)
_INV_LOST = _inv_fold("(a // 100000) + e - LEAST(a % 100000, e)")


@register(
    "part_inventory_replay",
    f"""
    WITH daily AS (
      SELECT l_partkey,
             CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    seqs AS (
      SELECT l_partkey,
             COUNT(*) AS n_days,
             CAST(SUM(q) AS BIGINT) // COUNT(*) AS mean_q,
             list(q ORDER BY de) AS seq
      FROM daily GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, n_days, mean_q,
           {_INV_ORDERS} // 100000 AS n_orders,
           {_INV_SO} // 100000 AS stockout_days,
           {_INV_LOST} // 100000 AS lost_units,
           {_INV_ORDERS} % 100000 AS end_inventory
    FROM seqs
    ORDER BY p_partkey
    """,
)
def part_inventory_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, S) policy replay per part: one fact rollup to (part, day,
    qty), one groupBy collecting the day-ordered demand array, one
    integer HOF fold carrying (inventory, orders, stockout days,
    lost units) in a named_struct accumulator.  (The oracle packs the
    same recursion into scalar folds — DuckDB list_reduce mis-folds
    struct accumulators; see the oracle comment.)"""
    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("de"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    seqs = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("CAST(SUM(q) AS BIGINT) div COUNT(*)").alias("mean_q"),
        F.expr(
            "transform(array_sort(collect_list(struct(de, q))),"
            " p -> p.q)"
        ).alias("seq"),
    )
    served = "LEAST(a.inv, e.inv)"
    fold = (
        "aggregate("
        " transform(seq, x -> named_struct("
        "  'inv', x, 'orders', CAST(0 AS BIGINT),"
        "  'so_days', CAST(0 AS BIGINT), 'lost', CAST(0 AS BIGINT))),"
        " named_struct('inv', 3 * mean_q, 'orders', CAST(0 AS BIGINT),"
        "  'so_days', CAST(0 AS BIGINT), 'lost', CAST(0 AS BIGINT)),"
        " (a, e) -> named_struct("
        f" 'inv', CASE WHEN a.inv - {served} <= mean_q THEN 3 * mean_q"
        f"         ELSE a.inv - {served} END,"
        f" 'orders', a.orders + CASE WHEN a.inv - {served} <= mean_q"
        "           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END,"
        " 'so_days', a.so_days + CASE WHEN e.inv > a.inv"
        "           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END,"
        f" 'lost', a.lost + e.inv - {served}))"
    )
    return (
        seqs.select(
            "l_partkey",
            "n_days",
            "mean_q",
            F.expr(fold).alias("st"),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "n_days",
            "mean_q",
            F.col("st.orders").alias("n_orders"),
            F.col("st.so_days").alias("stockout_days"),
            F.col("st.lost").alias("lost_units"),
            F.col("st.inv").alias("end_inventory"),
        )
        .orderBy("p_partkey")
    )


# --------------------------- Shapley channel attribution

# Game-theoretic channel attribution (Zhao et al.'s simplified
# Shapley): users' pre-conversion channel SETS form a 4-bit lattice
# (view=1, click=2, signup=4, error=8); v(S) is the exact ppm
# conversion rate of users with exactly set S (0 for unobserved
# sets); each channel's Shapley value sums w(|S|)·(v(S∪i)−v(S)) over
# the 8 subsets not containing it, with the factorial weights
# |S|!(4−|S|−1)! carried as INTEGER numerators over 4!=24 (output is
# the x24-scaled sum — no negative integer division, whose floor/
# truncate semantics differ between engines).  Everything after the
# per-user mask rollup is a 16-row lattice self-join.
SHAPLEY_CHANNELS = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))


@register(
    "events_shapley_attribution",
    """
    WITH fp AS (
      SELECT user_id, MIN(ts) AS first_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    pre AS (
      SELECT e.user_id,
             MAX(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
               AS b_view,
             MAX(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END)
               AS b_click,
             MAX(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END)
               AS b_signup,
             MAX(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)
               AS b_error
      FROM events e
      LEFT JOIN fp ON e.user_id = fp.user_id
      WHERE e.event_type <> 'purchase'
        AND (fp.first_purchase IS NULL OR e.ts < fp.first_purchase)
      GROUP BY e.user_id
    ),
    users AS (
      SELECT u.user_id,
             COALESCE(p.b_view, 0) + 2 * COALESCE(p.b_click, 0)
               + 4 * COALESCE(p.b_signup, 0)
               + 8 * COALESCE(p.b_error, 0) AS mask,
             CASE WHEN f.user_id IS NULL THEN 0 ELSE 1 END AS conv
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN pre p ON u.user_id = p.user_id
      LEFT JOIN fp f ON u.user_id = f.user_id
    ),
    masks AS (
      SELECT mask, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c
      FROM users GROUP BY mask
    ),
    lattice AS (
      SELECT CAST(u.s AS BIGINT) AS s,
             COALESCE(m.c * 1000000 // m.n, 0) AS rate_ppm
      FROM UNNEST(range(0, 16)) AS u(s)
      LEFT JOIN masks m ON m.mask = u.s
    ),
    chan AS (
      SELECT * FROM (VALUES ('view', CAST(1 AS BIGINT)),
                            ('click', CAST(2 AS BIGINT)),
                            ('signup', CAST(4 AS BIGINT)),
                            ('error', CAST(8 AS BIGINT)))
        AS t(channel, bit)
    ),
    contrib AS (
      SELECT ch.channel, ch.bit,
             CASE (l.s % 2) + ((l.s // 2) % 2) + ((l.s // 4) % 2)
                  + ((l.s // 8) % 2)
               WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
               * (lw.rate_ppm - l.rate_ppm) AS term
      FROM chan ch
      JOIN lattice l ON ((l.s // ch.bit) % 2) = 0
      JOIN lattice lw ON lw.s = l.s + ch.bit
    )
    SELECT c.channel,
           (SELECT COUNT(*) FROM users u
            WHERE ((u.mask // c.bit) % 2) = 1) AS touched_users,
           (SELECT CAST(SUM(term) AS BIGINT) FROM contrib t
            WHERE t.channel = c.channel) AS shapley_x24_ppm
    FROM chan c
    ORDER BY c.channel
    """,
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified Shapley attribution: per-user pre-first-purchase
    channel mask (one fact pass + broadcast first-purchase table),
    16-cell lattice of exact ppm conversion rates, factorial-weighted
    marginal contributions summed per channel over the 8 relevant
    subsets.  All integers; the only joins after the user rollup are
    16x16-row lattice lookups."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    pre = (
        ev.join(F.broadcast(fp), "user_id", "left")
        .where(
            (F.col("event_type") != "purchase")
            & (
                F.col("first_purchase").isNull()
                | (F.col("ts") < F.col("first_purchase"))
            )
        )
        .groupBy("user_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("event_type") == name, bit).otherwise(0)
                ).alias(f"b_{name}")
                for name, bit in SHAPLEY_CHANNELS
            ]
        )
    )
    users = (
        ev.select("user_id")
        .distinct()
        .join(F.broadcast(pre), "user_id", "left")
        .join(
            F.broadcast(fp.withColumn("conv", F.lit(1))).select(
                "user_id", "conv"
            ),
            "user_id",
            "left",
        )
        .select(
            "user_id",
            sum(
                [F.coalesce(F.col(f"b_{name}"), F.lit(0))
                 for name, _ in SHAPLEY_CHANNELS],
                F.lit(0),
            ).alias("mask"),
            F.coalesce("conv", F.lit(0)).alias("conv"),
        )
        .localCheckpoint(eager=True)  # feeds masks + touched counts
    )
    masks = users.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    lattice = (
        spark.range(0, 16)
        .select(F.col("id").alias("s"))
        .join(F.broadcast(masks), F.col("s") == F.col("mask"), "left")
        .select(
            "s",
            F.coalesce(
                F.expr("c * 1000000 div n"), F.lit(0).cast("long")
            ).alias("rate_ppm"),
        )
    )
    chan = spark.createDataFrame(
        list(SHAPLEY_CHANNELS), "channel string, bit long"
    )
    lw = lattice.select(
        F.col("s").alias("sw"), F.col("rate_ppm").alias("rate_w")
    )
    contrib = (
        chan.join(
            F.broadcast(lattice),
            F.expr("(s div bit) % 2 = 0"),
        )
        .join(F.broadcast(lw), F.expr("sw = s + bit"))
        .select(
            "channel",
            "bit",
            F.expr(
                "CASE (s % 2) + ((s div 2) % 2) + ((s div 4) % 2)"
                " + ((s div 8) % 2)"
                " WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"
                " * (rate_w - rate_ppm)"
            ).alias("term"),
        )
        .groupBy("channel", "bit")
        .agg(F.sum("term").alias("shapley_x24_ppm"))
    )
    touched = (
        chan.join(
            F.broadcast(users),
            F.expr("(mask div bit) % 2 = 1"),
        )
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("touched_users"))
    )
    return (
        contrib.join(F.broadcast(touched), "channel", "left")
        .select(
            "channel",
            F.coalesce("touched_users", F.lit(0).cast("long")).alias(
                "touched_users"
            ),
            "shapley_x24_ppm",
        )
        .orderBy("channel")
    )


# --------------------------- NDCG retrieval grading

# NDCG@5 for the approximate indexes, graded against brute-force
# ground truth: relevance of a retrieved item is 6 - its brute rank
# (0 if outside the exact top-5), position discounts are the standard
# 1/log2(pos+1) — but FROZEN as integer micro-unit literals on both
# engines (log2 is not correctly-rounded-portable; five constants
# are), so DCG is a pure integer dot product and NDCG an exact ppm.
# Extends ann_recall (set overlap) with rank-sensitive quality.
NDCG_W_E6 = (1000000, 630929, 500000, 430676, 386852)
NDCG_IDCG_E6 = sum((5 - i) * w for i, w in enumerate(NDCG_W_E6))


def _ndcg_oracle() -> str:
    w_vals = ", ".join(
        f"({i + 1}, CAST({w} AS BIGINT))" for i, w in enumerate(NDCG_W_E6)
    )
    return f"""
    WITH brute AS ({ORACLES["ann_brute_topk"]}),
    lsh AS ({ORACLES["ann_lsh_topk"]}),
    ivf AS ({ORACLES["ann_ivf_topk"]}),
    w AS (SELECT * FROM (VALUES {w_vals}) AS t(pos, w_e6)),
    graded AS (
      SELECT m.method, m.query_id,
             CAST(SUM(COALESCE(6 - b.rank, 0) * w.w_e6) AS BIGINT)
               AS dcg_e6
      FROM (
        SELECT 'lsh' AS method, query_id, corpus_id, rank FROM lsh
        UNION ALL
        SELECT 'ivf', query_id, corpus_id, rank FROM ivf
      ) m
      JOIN w ON w.pos = m.rank
      LEFT JOIN brute b ON b.query_id = m.query_id
                       AND b.corpus_id = m.corpus_id
      GROUP BY m.method, m.query_id
    )
    SELECT query_id,
           MAX(CASE WHEN method = 'lsh' THEN
               dcg_e6 * 1000000 // {NDCG_IDCG_E6} END) AS lsh_ndcg_ppm,
           MAX(CASE WHEN method = 'ivf' THEN
               dcg_e6 * 1000000 // {NDCG_IDCG_E6} END) AS ivf_ndcg_ppm
    FROM graded
    GROUP BY query_id
    ORDER BY query_id
    """


@register("ann_ndcg", _ndcg_oracle())
def ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 per query for LSH and IVF vs the brute ranking:
    equi-joins over n_queries x 5 rows, integer relevance x frozen
    integer discounts, exact ppm.  The heavy work is the three index
    scans themselves (the measurement panel is tiny) — identical
    cost shape to ann_recall."""
    from data_pipeline_for_e_commerce_shop_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    brute = brute_force_topk(spark, sf_dir, k=5).select(
        "query_id", "corpus_id", F.col("rank").alias("brank")
    )
    w = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(NDCG_W_E6)],
        "pos int, w_e6 long",
    )
    retrieved = (
        lsh_topk(spark, sf_dir, k=5)
        .select("query_id", "corpus_id", "rank")
        .withColumn("method", F.lit("lsh"))
        .unionByName(
            ivf_topk(spark, sf_dir, k=5)
            .select("query_id", "corpus_id", "rank")
            .withColumn("method", F.lit("ivf"))
        )
    )
    graded = (
        retrieved.join(
            F.broadcast(w), retrieved["rank"] == w["pos"]
        )
        .join(F.broadcast(brute), ["query_id", "corpus_id"], "left")
        .groupBy("method", "query_id")
        .agg(
            F.sum(
                F.coalesce(F.lit(6) - F.col("brank"), F.lit(0))
                * F.col("w_e6")
            ).alias("dcg_e6")
        )
    )
    return (
        graded.groupBy("query_id")
        .agg(
            F.max(
                F.when(
                    F.col("method") == "lsh",
                    F.expr(f"dcg_e6 * 1000000 div {NDCG_IDCG_E6}"),
                )
            ).alias("lsh_ndcg_ppm"),
            F.max(
                F.when(
                    F.col("method") == "ivf",
                    F.expr(f"dcg_e6 * 1000000 div {NDCG_IDCG_E6}"),
                )
            ).alias("ivf_ndcg_ppm"),
        )
        .orderBy("query_id")
    )


# --------------------------- time-decay attribution

# Time-decay multi-touch attribution with EXACT weights: a touch
# k weeks before the conversion earns 1e6 / 2^k micro-credits
# (half-life = 7 days) — powers of two keep the decay integer-exact,
# where an exp() decay would hit non-portable libm rounding.
# Completes the attribution ladder: position-based, U-shaped,
# Shapley, time-decay.  One user-keyed equi-join bounded by the
# 28-day window.
TIMEDECAY_WINDOW_DAYS = 28
TIMEDECAY_HALFLIFE_DAYS = 7


@register(
    "events_time_decay_attribution",
    f"""
    WITH purch AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_type AS channel,
             CAST(floor(epoch(ts)) AS BIGINT) AS tt
      FROM events WHERE event_type <> 'purchase'
    ),
    credited AS (
      SELECT t.channel,
             1000000 // CAST(power(2,
               ((p.pt - t.tt) // 86400) // {TIMEDECAY_HALFLIFE_DAYS})
               AS BIGINT) AS w_e6
      FROM touch t JOIN purch p ON t.user_id = p.user_id
      WHERE t.tt <= p.pt
        AND p.pt - t.tt < {TIMEDECAY_WINDOW_DAYS} * 86400
    ),
    per AS (
      SELECT channel, COUNT(*) AS n_credited_touches,
             CAST(SUM(w_e6) AS BIGINT) AS weight_e6
      FROM credited GROUP BY channel
    ),
    tot AS (SELECT CAST(SUM(weight_e6) AS BIGINT) AS w FROM per)
    SELECT channel, n_credited_touches, weight_e6,
           weight_e6 * 1000000 // tot.w AS share_ppm
    FROM per CROSS JOIN tot
    ORDER BY channel
    """,
)
def events_time_decay_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-channel time-decayed conversion credit: purchases and
    touches split from one scan, user-keyed equi-join with the 28-day
    residual predicate, integer 2^-k weights (k = age-weeks), share
    of total as exact ppm."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("sec").alias("pt")
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("channel"),
        F.col("sec").alias("tt"),
    )
    credited = (
        touch.join(purch, "user_id")
        .where(
            (F.col("tt") <= F.col("pt"))
            & (
                F.col("pt") - F.col("tt")
                < TIMEDECAY_WINDOW_DAYS * 86400
            )
        )
        .select(
            "channel",
            F.expr(
                "1000000 div CAST(power(2,"
                f" ((pt - tt) div 86400) div {TIMEDECAY_HALFLIFE_DAYS})"
                " AS BIGINT)"
            ).alias("w_e6"),
        )
    )
    per = credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        F.sum("w_e6").alias("weight_e6"),
    )
    tot = per.agg(F.sum("weight_e6").alias("w"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_credited_touches",
            "weight_e6",
            F.expr("weight_e6 * 1000000 div w").alias("share_ppm"),
        )
        .orderBy("channel")
    )


# --------------------------- empirical-Bayes return rates

# Small-sample stabilization: per-part return rates shrunk toward the
# global prior with integer beta-binomial pseudo-counts (alpha/beta
# derived from the corpus rate over a fixed prior strength) — the
# ranking you'd actually act on, where a 1-for-1 part no longer beats
# a 40-for-400 part.  Entirely integer: raw ppm, shrunk ppm, and the
# top-20 shrunk ranking with full tie-break.
SHRINKAGE_PRIOR_N = 50


@register(
    "part_return_shrinkage",
    f"""
    WITH per AS (
      SELECT l_partkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_returns
      FROM lineitem GROUP BY l_partkey
    ),
    g AS (
      SELECT CAST(SUM(n_returns) AS BIGINT) AS tot_r,
             CAST(SUM(n_lines) AS BIGINT) AS tot_n
      FROM per
    ),
    scored AS (
      SELECT p.l_partkey AS p_partkey, p.n_lines, p.n_returns,
             p.n_returns * 1000000 // p.n_lines AS raw_ppm,
             (p.n_returns * g.tot_n + {SHRINKAGE_PRIOR_N} * g.tot_r)
               * 1000000
               // ((p.n_lines + {SHRINKAGE_PRIOR_N}) * g.tot_n)
               AS shrunk_ppm
      FROM per p CROSS JOIN g
    )
    SELECT * FROM scored
    ORDER BY shrunk_ppm DESC, p_partkey
    LIMIT 20
    """,
)
def part_return_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-binomial shrinkage of per-part return rates: one fact
    rollup, 1-row global prior broadcast, exact integer shrunk rate
    (returns + prior_n * global_rate) / (n + prior_n) cross-
    multiplied to ppm, top-20 tie-broken."""
    per = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returns"),
        )
    )
    g = per.agg(
        F.sum("n_returns").alias("tot_r"), F.sum("n_lines").alias("tot_n")
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "n_lines",
            "n_returns",
            F.expr("n_returns * 1000000 div n_lines").alias("raw_ppm"),
            F.expr(
                f"(n_returns * tot_n + {SHRINKAGE_PRIOR_N} * tot_r)"
                " * 1000000"
                f" div ((n_lines + {SHRINKAGE_PRIOR_N}) * tot_n)"
            ).alias("shrunk_ppm"),
        )
        .orderBy(F.col("shrunk_ppm").desc(), "p_partkey")
        .limit(20)
    )


# --------------------------- price waterfall

# Gross-to-net price waterfall per category: list revenue, discount
# give-back, tax add-on, and net — every tier an exact per-line
# integer-cents floor (floor(ext*100), floor(ext*disc*100),
# floor(ext*(1-disc)*tax*100)), so the waterfall reconciles to the
# cent and the discount leakage ppm is an exact ratio.  One fact scan
# + broadcast dim, category-keyed partial agg.
@register(
    "category_price_waterfall",
    """
    WITH lines AS (
      SELECT p_type AS category,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS gross_c,
             CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)
               AS disc_c,
             CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                        * 100) AS BIGINT) AS tax_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT category,
           COUNT(*) AS n_lines,
           CAST(SUM(gross_c) AS BIGINT) AS gross_cents,
           CAST(SUM(disc_c) AS BIGINT) AS discount_cents,
           CAST(SUM(tax_c) AS BIGINT) AS tax_cents,
           CAST(SUM(gross_c) - SUM(disc_c) + SUM(tax_c) AS BIGINT)
             AS net_cents,
           CAST(SUM(disc_c) AS BIGINT) * 1000000
             // CAST(SUM(gross_c) AS BIGINT) AS discount_leakage_ppm
    FROM lines
    GROUP BY category
    ORDER BY category
    """,
)
def category_price_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross -> -discount -> +tax -> net per category in exact
    integer cents (per-line floors on both engines), with discount
    leakage as ppm of gross."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "gross_c"
        ),
        F.expr(
            "CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)"
        ).alias("disc_c"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * l_tax"
            " * 100) AS BIGINT)"
        ).alias("tax_c"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    return (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("gross_c").alias("gross_cents"),
            F.sum("disc_c").alias("discount_cents"),
            F.sum("tax_c").alias("tax_cents"),
        )
        .select(
            "category",
            "n_lines",
            "gross_cents",
            "discount_cents",
            "tax_cents",
            (
                F.col("gross_cents")
                - F.col("discount_cents")
                + F.col("tax_cents")
            ).alias("net_cents"),
            F.expr(
                "discount_cents * 1000000 div gross_cents"
            ).alias("discount_leakage_ppm"),
        )
        .orderBy("category")
    )


# --------------------------- degree assortativity

# Degree assortativity of the co-purchase graph: the Pearson
# correlation of endpoint degrees over all (directed) edges — do
# popular parts co-sell with popular parts (assortative, r>0) or with
# niche ones (disassortative, r<0)?  Same exactness recipe as
# revenue_acf: floored integer means, exact int64 deviation sums
# (bounded: deg <= ~1e5, edges <= ~1e7 keeps sums under int64), one
# final double sqrt/divide.
@register(
    "graph_assortativity",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {PLP_MIN_SUPPORT}
    ),
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL SELECT dst AS src, src AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY src),
    ed AS (
      SELECT da.d AS x, db.d AS y
      FROM edges e
      JOIN deg da ON e.src = da.node
      JOIN deg db ON e.dst = db.node
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) // COUNT(*) AS mx,
             CAST(SUM(y) AS BIGINT) // COUNT(*) AS my
      FROM ed
    ),
    d2 AS (
      SELECT m.n,
             CAST(SUM((e.x - m.mx) * (e.y - m.my)) AS BIGINT) AS sxy,
             CAST(SUM((e.x - m.mx) * (e.x - m.mx)) AS BIGINT) AS sxx,
             CAST(SUM((e.y - m.my) * (e.y - m.my)) AS BIGINT) AS syy
      FROM ed e CROSS JOIN m
      GROUP BY m.n
    )
    SELECT n AS n_directed_edges,
           CAST(floor(CAST(sxy AS DOUBLE) * 1000000
             / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))))
             AS BIGINT) AS assortativity_ppm
    FROM d2
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-endpoint degree correlation: support-pruned symmetric
    edges, degree table joined onto both endpoints (equi), floored
    integer means broadcast back, exact deviation sums, one double
    sqrt/divide.  Completes the graph family: pagerank, triangles,
    components, label-prop, k-core, link prediction, degree profile,
    assortativity."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("nn"))
        .where(F.col("nn") >= PLP_MIN_SUPPORT)
        .select("src", "dst")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)  # feeds deg + edge-join
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = (
        edges.join(
            F.broadcast(deg.select(F.col("src"), F.col("d").alias("x"))),
            "src",
        )
        .join(
            F.broadcast(
                deg.select(F.col("src").alias("dst"), F.col("d").alias("y"))
            ),
            "dst",
        )
        .select("x", "y")
    )
    m = ed.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(x) AS BIGINT) div COUNT(*)").alias("mx"),
        F.expr("CAST(SUM(y) AS BIGINT) div COUNT(*)").alias("my"),
    )
    d2 = (
        ed.crossJoin(F.broadcast(m))
        .groupBy("n")
        .agg(
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            .alias("sxy"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
            .alias("sxx"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .alias("syy"),
        )
    )
    return d2.select(
        F.col("n").alias("n_directed_edges"),
        F.expr(
            "CAST(floor(CAST(sxy AS DOUBLE) * 1000000"
            " / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))))"
            " AS BIGINT)"
        ).alias("assortativity_ppm"),
    )


# --------------------------- forecast backtesting

# Rolling-origin backtest of the seasonal-naive forecaster (predict
# each day with the value 7 days earlier) — model EVALUATION as a
# query: MAE in exact cents, MAPE and bias in exact ppm, coverage
# count.  The "model" is a calendar self-join, so the whole backtest
# is one equi-join on epoch-day + 7 over the daily rollup; extending
# to other lags is a spine away (revenue_acf shape).
FORECAST_LAG_DAYS = 7


@register(
    "forecast_backtest",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT a.de, a.rev_c AS actual_c, p.rev_c AS pred_c
      FROM daily a
      JOIN daily p ON p.de = a.de - {FORECAST_LAG_DAYS}
    )
    SELECT COUNT(*) AS n_scored,
           CAST(SUM(ABS(actual_c - pred_c)) AS BIGINT) // COUNT(*)
             AS mae_cents,
           CAST(SUM(ABS(actual_c - pred_c) * 1000000 // actual_c)
             AS BIGINT) // COUNT(*) AS mape_ppm,
           CAST(SUM(pred_c - actual_c) AS BIGINT) * 1000000
             // CAST(SUM(actual_c) AS BIGINT) AS bias_ppm
    FROM scored
    """,
)
def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (t-7) rolling backtest over daily revenue:
    daily rollup, one lag equi-join, exact integer MAE/MAPE/bias.
    Per-row MAPE terms floor to ppm BEFORE averaging (the usual
    definition), so everything stays integer."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1970-01-01").cast("date")).alias("de")
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
            ).alias("rev_c")
        )
    )
    a = daily.select("de", F.col("rev_c").alias("actual_c"))
    p = daily.select(
        (F.col("de") + FORECAST_LAG_DAYS).alias("de"),
        F.col("rev_c").alias("pred_c"),
    )
    return (
        a.join(p, "de")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("actual_c") - F.col("pred_c"))).alias(
                "sae"
            ),
            F.sum(
                F.expr(
                    "ABS(actual_c - pred_c) * 1000000 div actual_c"
                )
            ).alias("sape"),
            F.sum(F.col("pred_c") - F.col("actual_c")).alias("sdiff"),
            F.sum("actual_c").alias("sact"),
        )
        .select(
            F.col("n").alias("n_scored"),
            F.expr("sae div n").alias("mae_cents"),
            F.expr("sape div n").alias("mape_ppm"),
            F.expr("sdiff * 1000000 div sact").alias("bias_ppm"),
        )
    )


# --------------------------- dispersion diagnostics

# Overdispersion screen on daily event counts per type: a Poisson
# process has variance = mean (index-of-dispersion 1e6 ppm); real
# traffic is bursty (index >> 1e6).  Exact integers end-to-end:
# D = var/mean = (n·Σx² − (Σx)²)/((n−1)·Σx), the index as one
# integer ratio — the diagnostic that decides between Poisson and
# negative-binomial rate models downstream.
@register(
    "events_dispersion_index",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS q
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days, s AS n_events,
           s * 1000000 // n_days AS mean_ppm,
           (n_days * q - s * s) * 1000000
             // ((n_days - 1) * s) AS dispersion_index_ppm,
           (n_days * q - s * s) // (n_days * (n_days - 1))
             AS var_floor,
           CASE WHEN (n_days * q - s * s) // (n_days * (n_days - 1))
                     * n_days > s THEN 1 ELSE 0 END AS overdispersed
    FROM m
    ORDER BY event_type
    """,
)
def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-count dispersion: one date rollup, one
    vocabulary-sized aggregate, exact integer variance floor and
    mean; the overdispersion flag cross-multiplies (var > mean)
    without any division at all."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    return m.select(
        "event_type",
        "n_days",
        F.col("s").alias("n_events"),
        F.expr("s * 1000000 div n_days").alias("mean_ppm"),
        F.expr(
            "(n_days * q - s * s) * 1000000"
            " div ((n_days - 1) * s)"
        ).alias("dispersion_index_ppm"),
        F.expr(
            "(n_days * q - s * s) div (n_days * (n_days - 1))"
        ).alias("var_floor"),
        F.expr(
            "CASE WHEN (n_days * q - s * s)"
            " div (n_days * (n_days - 1)) * n_days > s"
            " THEN 1 ELSE 0 END"
        ).alias("overdispersed"),
    ).orderBy("event_type")


# --------------------------- z-order pruning audit

# WHY z-order: simulate two physical layouts of the same fact rows —
# natural (arrival) order vs Morton-interleaved (l_partkey,
# l_suppkey) — carve each into 1000-row "files", collect per-file
# min/max zone maps, and replay 20 deterministic two-column point
# probes against the zone maps.  The output is the data-skipping
# table: how many files each layout lets a (partkey, suppkey) probe
# prune.  The global sort IS the simulated writer (a real z-order
# write range-partitions the same key); everything after is
# |files|x|probes| sized.
ZORDER_AUDIT_FILE_ROWS = 1000
ZORDER_AUDIT_N_PROBES = 20


def _zaudit_oracle() -> str:
    morton = (
        f"({_spread_sql('l_partkey')}"
        f" | ({_spread_sql('l_suppkey')} << 1))"
    )
    return f"""
    WITH base AS (
      SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
             {morton} AS mz,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_partkey, l_suppkey) AS rn_nat,
             ROW_NUMBER() OVER (ORDER BY {morton}, l_orderkey,
                                l_linenumber, l_partkey, l_suppkey)
               AS rn_z,
             COUNT(*) OVER () AS n
      FROM lineitem
    ),
    probes AS (
      SELECT l_partkey AS pk, l_suppkey AS sk
      FROM base CROSS JOIN
        UNNEST(range(1, {ZORDER_AUDIT_N_PROBES} + 1)) AS u(k)
      WHERE rn_nat = u.k * (n // ({ZORDER_AUDIT_N_PROBES} + 1))
    ),
    files AS (
      SELECT layout, file_id,
             MIN(l_partkey) AS lo_pk, MAX(l_partkey) AS hi_pk,
             MIN(l_suppkey) AS lo_sk, MAX(l_suppkey) AS hi_sk
      FROM (
        SELECT 'natural' AS layout,
               (rn_nat - 1) // {ZORDER_AUDIT_FILE_ROWS} AS file_id,
               l_partkey, l_suppkey FROM base
        UNION ALL
        SELECT 'zorder',
               (rn_z - 1) // {ZORDER_AUDIT_FILE_ROWS},
               l_partkey, l_suppkey FROM base
      ) GROUP BY layout, file_id
    ),
    hits AS (
      SELECT f.layout, COUNT(*) AS candidate_files
      FROM probes p
      JOIN files f ON p.pk BETWEEN f.lo_pk AND f.hi_pk
                  AND p.sk BETWEEN f.lo_sk AND f.hi_sk
      GROUP BY f.layout
    ),
    nf AS (SELECT layout, COUNT(*) AS n_files FROM files
           GROUP BY layout)
    SELECT nf.layout, nf.n_files,
           {ZORDER_AUDIT_N_PROBES} AS n_probes,
           COALESCE(h.candidate_files, 0) AS candidate_files,
           (nf.n_files * {ZORDER_AUDIT_N_PROBES}
            - COALESCE(h.candidate_files, 0)) * 1000000
             // (nf.n_files * {ZORDER_AUDIT_N_PROBES})
             AS skipped_ppm
    FROM nf LEFT JOIN hits h ON nf.layout = h.layout
    ORDER BY nf.layout
    """


@register("layout_zorder_pruning_audit", _zaudit_oracle())
def layout_zorder_pruning_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone-map skipping simulation: natural vs Morton layout, 1000-
    row files, 20 positional two-column point probes; candidate =
    probe inside the file's (partkey, suppkey) min/max box.  Reuses
    layout.morton_code (one bit-interleave source of truth)."""
    from pyspark.sql import Window

    from data_pipeline_for_e_commerce_shop_spark.operators.layout import (
        morton_code,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    base = li.select(
        "*",
        morton_code(F.col("l_partkey"), F.col("l_suppkey")).alias("mz"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = base.select(
        "*",
        F.row_number()
        .over(
            Window.orderBy(
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
            )
        )
        .alias("rn_nat"),
        F.row_number()
        .over(
            Window.orderBy(
                "mz", "l_orderkey", "l_linenumber", "l_partkey",
                "l_suppkey"
            )
        )
        .alias("rn_z"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).localCheckpoint(eager=True)  # feeds probes + both layouts
    ks = spark.range(1, ZORDER_AUDIT_N_PROBES + 1).select(
        F.col("id").alias("k")
    )
    probes = (
        base.crossJoin(F.broadcast(ks))
        .where(
            F.col("rn_nat")
            == F.col("k")
            * F.expr(f"n div ({ZORDER_AUDIT_N_PROBES} + 1)")
        )
        .select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
    )
    nat = base.select(
        F.lit("natural").alias("layout"),
        F.expr(f"(rn_nat - 1) div {ZORDER_AUDIT_FILE_ROWS}").alias(
            "file_id"
        ),
        "l_partkey",
        "l_suppkey",
    )
    zor = base.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"(rn_z - 1) div {ZORDER_AUDIT_FILE_ROWS}").alias(
            "file_id"
        ),
        "l_partkey",
        "l_suppkey",
    )
    files = (
        nat.unionByName(zor)
        .groupBy("layout", "file_id")
        .agg(
            F.min("l_partkey").alias("lo_pk"),
            F.max("l_partkey").alias("hi_pk"),
            F.min("l_suppkey").alias("lo_sk"),
            F.max("l_suppkey").alias("hi_sk"),
        )
        .localCheckpoint(eager=True)  # feeds hits + counts
    )
    hits = (
        F.broadcast(probes)
        .join(
            files,
            (F.col("pk") >= F.col("lo_pk"))
            & (F.col("pk") <= F.col("hi_pk"))
            & (F.col("sk") >= F.col("lo_sk"))
            & (F.col("sk") <= F.col("hi_sk")),
        )
        .groupBy("layout")
        .agg(F.count(F.lit(1)).alias("candidate_files"))
    )
    nf = files.groupBy("layout").agg(F.count(F.lit(1)).alias("n_files"))
    return (
        nf.join(F.broadcast(hits), "layout", "left")
        .select(
            "layout",
            "n_files",
            F.lit(ZORDER_AUDIT_N_PROBES).cast("long").alias("n_probes"),
            F.coalesce("candidate_files", F.lit(0).cast("long")).alias(
                "candidate_files"
            ),
            F.expr(
                f"(n_files * {ZORDER_AUDIT_N_PROBES}"
                " - COALESCE(candidate_files, 0)) * 1000000"
                f" div (n_files * {ZORDER_AUDIT_N_PROBES})"
            ).alias("skipped_ppm"),
        )
        .orderBy("layout")
    )


# --------------------------- top conversion paths

# The top pre-purchase journeys: each converter's LAST 4 channel
# touches before their first purchase, joined into a path string, and
# the most common paths ranked — "what does the road to checkout
# actually look like".  One user-keyed rollup with a deterministic
# (ts, event_id)-ordered array slice; vocabulary-sized top-k.
CONVPATH_MAX_STEPS = 4
CONVPATH_TOPK = 10


@register(
    "events_top_conversion_paths",
    f"""
    WITH fp AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    pre AS (
      SELECT e.user_id,
             list(e.event_type ORDER BY e.ts, e.event_id) AS seq
      FROM events e JOIN fp ON e.user_id = fp.user_id
      WHERE e.event_type <> 'purchase' AND e.ts < fp.t
      GROUP BY e.user_id
    ),
    paths AS (
      SELECT array_to_string(
               seq[GREATEST(len(seq) - {CONVPATH_MAX_STEPS} + 1, 1):
                   len(seq)], '>') AS path
      FROM pre
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {CONVPATH_TOPK}
    """,
)
def events_top_conversion_paths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-10 last-4-touch paths of converting users: first-purchase
    broadcast, per-user (ts, event_id)-sorted type array, tail slice,
    concat, top-k with path tie-break."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    pre = (
        ev.join(F.broadcast(fp), "user_id")
        .where(
            (F.col("event_type") != "purchase") & (F.col("ts") < F.col("t"))
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                " struct(ts, event_id, event_type))), p -> p.event_type)"
            ).alias("seq")
        )
    )
    return (
        pre.select(
            F.expr(
                "array_join(slice(seq,"
                f" GREATEST(size(seq) - {CONVPATH_MAX_STEPS} + 1, 1),"
                f" {CONVPATH_MAX_STEPS}), '>')"
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(CONVPATH_TOPK)
    )


# --------------------------- chi-square independence

# Are discount and tax set independently?  Pearson chi-square test of
# independence on the (discount-band, tax-band) contingency table —
# the INDEPENDENCE complement to events_drift_chi2's goodness-of-fit.
# Counts are exact integers; each cell's (O−E)²/E term and the total
# fold in (band, band) key order (the ANOVA lesson: a plain double
# SUM is placement-dependent at floor boundaries).
@register(
    "discount_tax_independence",
    """
    WITH cells AS (
      SELECT CAST(floor(l_discount * 100) AS BIGINT) AS disc_band,
             CAST(floor(l_tax * 100) AS BIGINT) AS tax_band,
             COUNT(*) AS o
      FROM lineitem GROUP BY 1, 2
    ),
    mr AS (SELECT disc_band, CAST(SUM(o) AS BIGINT) AS r
           FROM cells GROUP BY disc_band),
    mc AS (SELECT tax_band, CAST(SUM(o) AS BIGINT) AS c
           FROM cells GROUP BY tax_band),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                 COUNT(DISTINCT disc_band) AS nr,
                 COUNT(DISTINCT tax_band) AS nc
          FROM cells),
    terms AS (
      SELECT ce.disc_band, ce.tax_band,
             (CAST(ce.o AS DOUBLE)
              - CAST(mr.r AS DOUBLE) * mc.c / n.n)
             * (CAST(ce.o AS DOUBLE)
                - CAST(mr.r AS DOUBLE) * mc.c / n.n)
             / (CAST(mr.r AS DOUBLE) * mc.c / n.n) AS t
      FROM cells ce
      JOIN mr ON ce.disc_band = mr.disc_band
      JOIN mc ON ce.tax_band = mc.tax_band
      CROSS JOIN n
    )
    SELECT (SELECT nr FROM n) AS n_disc_bands,
           (SELECT nc FROM n) AS n_tax_bands,
           ((SELECT nr FROM n) - 1) * ((SELECT nc FROM n) - 1) AS df,
           CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             (SELECT list(t ORDER BY disc_band, tax_band) FROM terms)),
             (a, b) -> a + b) * 1000) AS BIGINT) AS chi2_e3
    """,
)
def discount_tax_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of (discount band, tax band): one fact
    rollup to the ~100-cell contingency table, broadcast margins,
    per-cell (O−E)²/E in doubles from exact integers, key-ordered
    fold (not SUM) for the statistic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(floor(l_discount * 100) AS BIGINT)").alias(
            "disc_band"
        ),
        F.expr("CAST(floor(l_tax * 100) AS BIGINT)").alias("tax_band"),
    )
    cells = li.groupBy("disc_band", "tax_band").agg(
        F.count(F.lit(1)).alias("o")
    )
    mr = cells.groupBy("disc_band").agg(F.sum("o").alias("r"))
    mc = cells.groupBy("tax_band").agg(F.sum("o").alias("c"))
    n = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("disc_band").alias("nr"),
        F.countDistinct("tax_band").alias("nc"),
    )
    terms = (
        cells.join(F.broadcast(mr), "disc_band")
        .join(F.broadcast(mc), "tax_band")
        .crossJoin(F.broadcast(n))
        .select(
            "disc_band",
            "tax_band",
            "nr",
            "nc",
            F.expr(
                "(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)"
                " * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)"
                " / (CAST(r AS DOUBLE) * c / n)"
            ).alias("t"),
        )
    )
    return terms.groupBy("nr", "nc").agg(
        F.expr(
            "CAST(floor(aggregate(array_sort(collect_list("
            " named_struct('k1', disc_band, 'k2', tax_band, 'v', t))),"
            " CAST(0.0 AS DOUBLE), (a, x) -> a + x.v) * 1000)"
            " AS BIGINT)"
        ).alias("chi2_e3")
    ).select(
        F.col("nr").alias("n_disc_bands"),
        F.col("nc").alias("n_tax_bands"),
        F.expr("(nr - 1) * (nc - 1)").alias("df"),
        "chi2_e3",
    )


# --------------------------- segment-popularity recommendations

# The cold-start fallback recommender: for each customer, the top
# categories their market segment buys that THEY haven't bought yet —
# segment-popularity ranking minus own history (anti join), top 3 per
# customer.  Everything is equi-keyed; the segment×category rank
# table is vocabulary-sized and broadcast.
CATREC_TOPK = 3


@register(
    "customer_category_recs",
    f"""
    WITH bought AS (
      SELECT DISTINCT o.o_custkey AS c_custkey, p.p_type AS category
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
    ),
    seg_pop AS (
      SELECT c.c_mktsegment, b.category, COUNT(*) AS n_buyers
      FROM bought b JOIN customer c ON b.c_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT c_mktsegment, category, n_buyers,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n_buyers DESC, category)
               AS seg_rank
      FROM seg_pop
    ),
    cand AS (
      SELECT c.c_custkey, r.category, r.n_buyers, r.seg_rank
      FROM customer c
      JOIN ranked r ON c.c_mktsegment = r.c_mktsegment
      LEFT JOIN bought b ON b.c_custkey = c.c_custkey
                        AND b.category = r.category
      WHERE b.c_custkey IS NULL
    )
    SELECT c_custkey, category, n_buyers, rec_rank FROM (
      SELECT c_custkey, category, n_buyers,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY seg_rank) AS rec_rank
      FROM cand
    ) WHERE rec_rank <= {CATREC_TOPK}
    ORDER BY c_custkey, rec_rank
    """,
)
def customer_category_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 unbought segment-popular categories per customer:
    distinct purchase history, segment-popularity rank (vocabulary-
    sized, broadcast), anti join against own history, per-customer
    re-rank."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    bought = (
        orders.join(
            li, orders["o_orderkey"] == li["l_orderkey"]
        )
        .join(F.broadcast(part), "l_partkey")
        .select(F.col("o_custkey").alias("c_custkey"), "category")
        .distinct()
        .localCheckpoint(eager=True)  # feeds seg_pop + anti join
    )
    seg_pop = (
        bought.join(F.broadcast(cust), "c_custkey")
        .groupBy("c_mktsegment", "category")
        .agg(F.count(F.lit(1)).alias("n_buyers"))
    )
    ranked = seg_pop.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("c_mktsegment").orderBy(
                F.col("n_buyers").desc(), "category"
            )
        )
        .alias("seg_rank"),
    )
    cand = (
        cust.join(F.broadcast(ranked), "c_mktsegment")
        .join(bought, ["c_custkey", "category"], "left_anti")
    )
    return (
        cand.select(
            "c_custkey",
            "category",
            "n_buyers",
            F.row_number()
            .over(
                Window.partitionBy("c_custkey").orderBy("seg_rank")
            )
            .alias("rec_rank"),
        )
        .where(F.col("rec_rank") <= CATREC_TOPK)
        .orderBy("c_custkey", "rec_rank")
    )


# --------------------------- stickiness (DAU/WAU/MAU)

# The product-health trinity per day — DAU, trailing-7 WAU,
# trailing-28 MAU — and the stickiness ratio DAU/MAU as exact ppm.
# Same scale decomposition as rolling_active_users: dedup to
# (day, user) ONCE, explode each pair into the bounded set of window
# ends it serves (1, 7 and 28 rows respectively), semi-join to real
# days, count distinct per end — shuffles spread over users, never a
# per-day rescan or single-partition funnel.
STICKINESS_WAU_DAYS = 7
STICKINESS_MAU_DAYS = 28


@register(
    "events_stickiness_ratio",
    f"""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (
      SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day
    ),
    wau AS (
      SELECT w.day, COUNT(DISTINCT c.user_id) AS wau
      FROM (
        SELECT user_id,
               day + CAST(u.i AS INTEGER) AS day
        FROM du CROSS JOIN
          UNNEST(range(0, {STICKINESS_WAU_DAYS})) AS u(i)
      ) c JOIN days w ON c.day = w.day
      GROUP BY w.day
    ),
    mau AS (
      SELECT m.day, COUNT(DISTINCT c.user_id) AS mau
      FROM (
        SELECT user_id,
               day + CAST(u.i AS INTEGER) AS day
        FROM du CROSS JOIN
          UNNEST(range(0, {STICKINESS_MAU_DAYS})) AS u(i)
      ) c JOIN days m ON c.day = m.day
      GROUP BY m.day
    )
    SELECT d.day, d.dau, w.wau, m.mau,
           d.dau * 1000000 // m.mau AS stickiness_ppm
    FROM dau d JOIN wau w ON d.day = w.day
    JOIN mau m ON d.day = m.day
    ORDER BY d.day
    """,
)
def events_stickiness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-WAU / trailing-MAU per day + DAU/MAU ppm:
    (day, user) dedup once, bounded sequence explodes for the two
    trailing windows, day-keyed distinct counts, one |days|-sized
    3-way join."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)  # feeds dau/wau/mau
    )
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))

    def trailing(n: int, alias: str):
        contrib = du.select(
            "user_id",
            F.explode(
                F.sequence("day", F.date_add("day", n - 1))
            ).alias("day"),
        )
        return (
            contrib.join(days, "day", "left_semi")
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(alias))
        )

    wau = trailing(STICKINESS_WAU_DAYS, "wau")
    mau = trailing(STICKINESS_MAU_DAYS, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.expr("dau * 1000000 div mau").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


# --------------------------- single-source supply risk

# Supply-chain fragility screen: parts bought from exactly one
# supplier, with the trailing revenue that supplier alone carries —
# the "if this supplier fails, this revenue stalls" table, plus the
# category-level share of single-sourced revenue.  Two fact rollups
# and one vocabulary-sized join; all money in exact cents.
@register(
    "part_single_source_risk",
    """
    WITH per AS (
      SELECT l_partkey,
             COUNT(DISTINCT l_suppkey) AS n_suppliers,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ),
    agg AS (
      SELECT p.p_type AS category,
             COUNT(*) AS n_parts,
             CAST(SUM(CASE WHEN per.n_suppliers = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_single_sourced,
             CAST(SUM(per.rev_cents) AS BIGINT) AS rev_cents,
             CAST(SUM(CASE WHEN per.n_suppliers = 1
                      THEN per.rev_cents ELSE 0 END) AS BIGINT)
               AS single_rev_cents
      FROM per JOIN part p ON per.l_partkey = p.p_partkey
      GROUP BY p.p_type
    )
    SELECT category, n_parts, n_single_sourced, rev_cents,
           single_rev_cents,
           single_rev_cents * 1000000 // rev_cents AS at_risk_ppm
    FROM agg
    ORDER BY category
    """,
)
def part_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-supplier exposure per category: per-part supplier
    cardinality + revenue, broadcast dim join, exact at-risk revenue
    share ppm."""
    per = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("rev_cents"),
        )
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    return (
        per.join(F.broadcast(part), "l_partkey")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(
                F.when(F.col("n_suppliers") == 1, 1).otherwise(0)
            ).alias("n_single_sourced"),
            F.sum("rev_cents").alias("rev_cents"),
            F.sum(
                F.when(
                    F.col("n_suppliers") == 1, F.col("rev_cents")
                ).otherwise(0)
            ).alias("single_rev_cents"),
        )
        .select(
            "category",
            "n_parts",
            "n_single_sourced",
            "rev_cents",
            "single_rev_cents",
            F.expr(
                "single_rev_cents * 1000000 div rev_cents"
            ).alias("at_risk_ppm"),
        )
        .orderBy("category")
    )


# --------------------------- double-fire event screen

# Client-side double-fire detection: events from the same user with
# the same type and value landing within 5 seconds of the previous
# one — the telemetry-quality screen that catches retry storms and
# double-submitted beacons before they pollute every downstream rate.
# One (user, type, value)-keyed lag window; summary per type with
# exact ppm incidence.
DOUBLEFIRE_WINDOW_SECONDS = 5


@register(
    "events_double_fire_screen",
    f"""
    WITH seq AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                 PARTITION BY user_id, event_type,
                              CAST(floor(value * 100) AS BIGINT)
                 ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN gap IS NOT NULL
                    AND gap <= {DOUBLEFIRE_WINDOW_SECONDS}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_double_fired,
           CAST(SUM(CASE WHEN gap IS NOT NULL
                    AND gap <= {DOUBLEFIRE_WINDOW_SECONDS}
                    THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // COUNT(*) AS double_fire_ppm
    FROM seq
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_double_fire_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type double-fire incidence: lag gap within (user, type,
    value-cents) ordered by (ts, event_id), flagged when <= 5 s,
    rolled up to exact ppm."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.unix_timestamp("ts").alias("sec"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("vc"),
    )
    w = Window.partitionBy("user_id", "event_type", "vc").orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "event_type",
        (F.col("sec") - F.lag("sec").over(w)).alias("gap"),
    )
    dbl = (
        F.when(
            F.col("gap").isNotNull()
            & (F.col("gap") <= DOUBLEFIRE_WINDOW_SECONDS),
            1,
        ).otherwise(0)
    )
    return (
        seq.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dbl).alias("n_double_fired"),
        )
        .select(
            "event_type",
            "n_events",
            "n_double_fired",
            F.expr(
                "n_double_fired * 1000000 div n_events"
            ).alias("double_fire_ppm"),
        )
        .orderBy("event_type")
    )


# --------------------------- brand switching matrix

# Brand loyalty as a transition matrix: for each customer's
# consecutive order pair, do their brands repeat (stay) or switch?
# Emits the brand->brand matrix over consecutive orders with exact
# row-share ppm — the aggregated-loyalty complement to
# part_sequence_rules (part-level) and customer_segment_migration
# (value-segment level).
@register(
    "brand_switch_matrix",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    consec AS (
      SELECT a.o_orderkey AS ok1, b.o_orderkey AS ok2
      FROM seq a JOIN seq b ON a.o_custkey = b.o_custkey
                           AND b.rn = a.rn + 1
    ),
    ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    trans AS (
      SELECT b1.p_brand AS brand_from, b2.p_brand AS brand_to,
             COUNT(*) AS n
      FROM consec c
      JOIN ob b1 ON b1.l_orderkey = c.ok1
      JOIN ob b2 ON b2.l_orderkey = c.ok2
      GROUP BY 1, 2
    ),
    rowtot AS (
      SELECT brand_from, CAST(SUM(n) AS BIGINT) AS tot
      FROM trans GROUP BY brand_from
    )
    SELECT t.brand_from, t.brand_to, t.n,
           t.n * 1000000 // r.tot AS share_ppm,
           CASE WHEN t.brand_from = t.brand_to THEN 1 ELSE 0 END
             AS is_stay
    FROM trans t JOIN rowtot r ON t.brand_from = r.brand_from
    ORDER BY t.brand_from, t.brand_to
    """,
)
def brand_switch_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand->brand transition counts over consecutive orders per
    customer: rank window, consecutive equi-join, distinct
    order-brand sets joined twice, row-normalized exact ppm."""
    from pyspark.sql import Window

    seq = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("rn"),
    )
    a = seq.select("o_custkey", F.col("o_orderkey").alias("ok1"), "rn")
    b = seq.select(
        "o_custkey",
        F.col("o_orderkey").alias("ok2"),
        (F.col("rn") - 1).alias("rn"),
    )
    consec = a.join(b, ["o_custkey", "rn"]).select("ok1", "ok2")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    ob = (
        li.join(F.broadcast(part), "l_partkey")
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    b1 = ob.select(
        F.col("l_orderkey").alias("ok1"), F.col("p_brand").alias("brand_from")
    )
    b2 = ob.select(
        F.col("l_orderkey").alias("ok2"), F.col("p_brand").alias("brand_to")
    )
    trans = (
        consec.join(b1, "ok1")
        .join(b2, "ok2")
        .groupBy("brand_from", "brand_to")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rowtot = trans.groupBy("brand_from").agg(F.sum("n").alias("tot"))
    return (
        trans.join(F.broadcast(rowtot), "brand_from")
        .select(
            "brand_from",
            "brand_to",
            "n",
            F.expr("n * 1000000 div tot").alias("share_ppm"),
            F.when(F.col("brand_from") == F.col("brand_to"), 1)
            .otherwise(0)
            .alias("is_stay"),
        )
        .orderBy("brand_from", "brand_to")
    )


# --------------------------- A/B power analysis

# Experiment DESIGN from observed data: given each event type's daily
# per-user value variance (exact integer sufficient statistics), how
# many users per arm detect a 2% lift at alpha=.05 / power=.80?
# n = 2 (z_a + z_b)^2 sigma^2 / delta^2, with the two z quantiles
# FROZEN as micro-literals (inverse-normal is not portably
# computable) — completes the experimentation suite: power design ->
# CUPED adjustment -> Wilson/report -> logrank.
POWER_Z_ALPHA_E6 = 1_959_964   # z_{0.975}
POWER_Z_BETA_E6 = 841_621      # z_{0.80}
POWER_MDE_PPM = 20_000         # 2% of the mean


@register(
    "events_power_analysis",
    f"""
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n_users,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS q
      FROM per_user GROUP BY event_type
    )
    SELECT event_type, n_users,
           s // n_users AS mean_cents,
           (n_users * q - s * s) // (n_users * (n_users - 1))
             AS var_floor,
           CAST(ceil(
             2.0 * (({POWER_Z_ALPHA_E6} + {POWER_Z_BETA_E6}) / 1e6)
                 * (({POWER_Z_ALPHA_E6} + {POWER_Z_BETA_E6}) / 1e6)
             * (CAST(n_users * q - s * s AS DOUBLE)
                / (CAST(n_users AS DOUBLE) * (n_users - 1)))
             / ((CAST(s AS DOUBLE) / n_users * {POWER_MDE_PPM} / 1e6)
                * (CAST(s AS DOUBLE) / n_users * {POWER_MDE_PPM}
                   / 1e6))) AS BIGINT) AS n_per_arm
    FROM m
    ORDER BY event_type
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type two-arm sample size for a 2% lift: per-user cent
    totals, exact integer (n, Σv, Σv²), frozen z constants, one
    deterministic double formula with identical op order on both
    engines."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(
                F.expr("CAST(floor(value * 100) AS BIGINT)")
            ).alias("v")
        )
    )
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    z = POWER_Z_ALPHA_E6 + POWER_Z_BETA_E6
    return m.select(
        "event_type",
        "n_users",
        F.expr("s div n_users").alias("mean_cents"),
        F.expr(
            "(n_users * q - s * s) div (n_users * (n_users - 1))"
        ).alias("var_floor"),
        F.expr(
            f"CAST(ceil(2.0 * (({z}) / 1e6) * (({z}) / 1e6)"
            " * (CAST(n_users * q - s * s AS DOUBLE)"
            "    / (CAST(n_users AS DOUBLE) * (n_users - 1)))"
            f" / ((CAST(s AS DOUBLE) / n_users * {POWER_MDE_PPM} / 1e6)"
            f"    * (CAST(s AS DOUBLE) / n_users * {POWER_MDE_PPM}"
            "       / 1e6))) AS BIGINT)"
        ).alias("n_per_arm"),
    ).orderBy("event_type")


# --------------------------- overdue-customer alarm

# The reorder-reminder list: per customer, mean days between orders
# (exact integer), days since their last order relative to the
# corpus horizon (max order date — the "now" of a historical
# snapshot), and an overdue flag when the silence exceeds 2x their
# own cadence.  Output: top-25 overdue by trailing spend, the list a
# win-back campaign would pull.  All integer day/cent arithmetic;
# horizon rides as a 1-row broadcast.
OVERDUE_FACTOR = 2
OVERDUE_TOPK = 25


@register(
    "customer_overdue_alarm",
    f"""
    WITH o AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    h AS (SELECT MAX(de) AS horizon FROM o),
    per AS (
      SELECT o_custkey,
             COUNT(*) AS n_orders,
             MIN(de) AS first_de,
             MAX(de) AS last_de,
             CAST(SUM(cents) AS BIGINT) AS spend_cents
      FROM o GROUP BY o_custkey
    ),
    scored AS (
      SELECT p.o_custkey AS c_custkey, p.n_orders, p.spend_cents,
             (p.last_de - p.first_de) // (p.n_orders - 1) AS mean_gap,
             h.horizon - p.last_de AS silence_days
      FROM per p CROSS JOIN h
      WHERE p.n_orders >= 2
    )
    SELECT c_custkey, n_orders, spend_cents, mean_gap, silence_days
    FROM scored
    WHERE mean_gap > 0
      AND silence_days > {OVERDUE_FACTOR} * mean_gap
    ORDER BY spend_cents DESC, c_custkey
    LIMIT {OVERDUE_TOPK}
    """,
)
def customer_overdue_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 overdue high-value customers: per-customer cadence
    (range/(n-1), exact days), silence vs the 1-row horizon,
    2x-cadence overdue filter, spend-ranked tie-broken LIMIT."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("de"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    h = o.agg(F.max("de").alias("horizon"))
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("de").alias("first_de"),
        F.max("de").alias("last_de"),
        F.sum("cents").alias("spend_cents"),
    )
    return (
        per.where(F.col("n_orders") >= 2)
        .crossJoin(F.broadcast(h))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "n_orders",
            "spend_cents",
            F.expr("(last_de - first_de) div (n_orders - 1)").alias(
                "mean_gap"
            ),
            (F.col("horizon") - F.col("last_de")).alias("silence_days"),
        )
        .where(
            (F.col("mean_gap") > 0)
            & (F.col("silence_days") > OVERDUE_FACTOR * F.col("mean_gap"))
        )
        .orderBy(F.col("spend_cents").desc(), "c_custkey")
        .limit(OVERDUE_TOPK)
    )


# --------------------------- error/purchase cross-correlation

# Do error bursts coincide with purchase dips?  Daily error counts
# vs daily purchase counts, Pearson r via the floored-integer-mean
# deviation recipe (revenue_acf) — the incident-impact gauge that
# justifies paging on error-rate alarms.  One fact rollup; the
# |days|-sized series join is calendar-bounded.
@register(
    "error_purchase_correlation",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'error'
                      THEN 1 ELSE 0 END) AS BIGINT) AS errs,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS purch
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(errs) AS BIGINT) // COUNT(*) AS mx,
             CAST(SUM(purch) AS BIGINT) // COUNT(*) AS my
      FROM daily
    ),
    d AS (
      SELECT m.n,
             CAST(SUM((errs - mx) * (purch - my)) AS BIGINT) AS sxy,
             CAST(SUM((errs - mx) * (errs - mx)) AS BIGINT) AS sxx,
             CAST(SUM((purch - my) * (purch - my)) AS BIGINT) AS syy
      FROM daily CROSS JOIN m
      GROUP BY m.n
    )
    SELECT n AS n_days,
           CAST(floor(CAST(sxy AS DOUBLE) * 1000000
             / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))))
             AS BIGINT) AS corr_ppm
    FROM d
    """,
)
def error_purchase_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily errors vs purchases Pearson r: one conditional-sum
    rollup (both series in one pass), floored integer means, exact
    deviation sums, one final sqrt/divide."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("errs"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purch"),
        )
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(errs) AS BIGINT) div COUNT(*)").alias("mx"),
        F.expr("CAST(SUM(purch) AS BIGINT) div COUNT(*)").alias("my"),
    )
    d = (
        daily.crossJoin(F.broadcast(m))
        .groupBy("n")
        .agg(
            F.sum(
                (F.col("errs") - F.col("mx")) * (F.col("purch") - F.col("my"))
            ).alias("sxy"),
            F.sum(
                (F.col("errs") - F.col("mx")) * (F.col("errs") - F.col("mx"))
            ).alias("sxx"),
            F.sum(
                (F.col("purch") - F.col("my"))
                * (F.col("purch") - F.col("my"))
            ).alias("syy"),
        )
    )
    return d.select(
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(floor(CAST(sxy AS DOUBLE) * 1000000"
            " / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))))"
            " AS BIGINT)"
        ).alias("corr_ppm"),
    )


# --------------------------- money hygiene audit

# Decimal hygiene across every money/quantity column: how many values
# carry sub-cent residue (would be silently floored by the integer-
# cents convention), how many are zero/negative, min/max cents — the
# audit that PROVES the engine's floor(x*100) money convention loses
# nothing on this data (or measures exactly what it would).  One
# conditional-sum pass per table, union of two vocabulary-sized rows
# per column.
@register(
    "money_hygiene_audit",
    """
    SELECT 'orders.o_totalprice' AS col,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN floor(o_totalprice * 100)
                    <> o_totalprice * 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_subcent,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_nonpositive,
           CAST(MIN(CAST(floor(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS min_cents,
           CAST(MAX(CAST(floor(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS max_cents
    FROM orders
    UNION ALL
    SELECT 'lineitem.l_extendedprice', COUNT(*),
           CAST(SUM(CASE WHEN floor(l_extendedprice * 100)
                    <> l_extendedprice * 100 THEN 1 ELSE 0 END)
             AS BIGINT),
           CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
             AS BIGINT),
           CAST(MIN(CAST(floor(l_extendedprice * 100) AS BIGINT))
             AS BIGINT),
           CAST(MAX(CAST(floor(l_extendedprice * 100) AS BIGINT))
             AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_quantity', COUNT(*),
           CAST(SUM(CASE WHEN floor(l_quantity) <> l_quantity
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
             AS BIGINT),
           CAST(MIN(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT),
           CAST(MAX(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
    FROM lineitem
    ORDER BY col
    """,
)
def money_hygiene_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-cent residue / non-positive / range audit for the three
    money-bearing columns — the measured justification for the
    integer-cents convention."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def audit(df, col, label, scale):
        mul = f"{col} * 100" if scale else col
        return df.agg(
            F.lit(label).alias("col"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr(f"CASE WHEN floor({mul}) <> {mul} THEN 1"
                       " ELSE 0 END")
            ).alias("n_subcent"),
            F.sum(
                F.expr(f"CASE WHEN {col} <= 0 THEN 1 ELSE 0 END")
            ).alias("n_nonpositive"),
            F.expr(f"MIN(CAST(floor({mul}) AS BIGINT))").alias(
                "min_cents"
            ),
            F.expr(f"MAX(CAST(floor({mul}) AS BIGINT))").alias(
                "max_cents"
            ),
        )

    return (
        audit(orders, "o_totalprice", "orders.o_totalprice", True)
        .unionByName(
            audit(li, "l_extendedprice", "lineitem.l_extendedprice", True)
        )
        .unionByName(audit(li, "l_quantity", "lineitem.l_quantity", False))
        .orderBy("col")
    )


# --------------------------- peak-day drivers

# The "what happened on our biggest days" report: top-5 revenue days
# with, for each, the leading category and its share of that day's
# revenue — argmax-within-day via a fully tie-broken window, all
# money exact cents.  Fact scanned once through one (day, category)
# rollup.
PEAKDAY_TOPK = 5


@register(
    "peak_day_drivers",
    f"""
    WITH dc AS (
      SELECT CAST(o_orderdate AS DATE) AS day, p.p_type AS category,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    days AS (
      SELECT day, CAST(SUM(cents) AS BIGINT) AS day_cents
      FROM dc GROUP BY day
    ),
    lead AS (
      SELECT day, category AS top_category, cents AS top_cents
      FROM (
        SELECT day, category, cents,
               ROW_NUMBER() OVER (PARTITION BY day
                                  ORDER BY cents DESC, category) AS rn
        FROM dc
      ) WHERE rn = 1
    )
    SELECT d.day, d.day_cents, l.top_category, l.top_cents,
           l.top_cents * 1000000 // d.day_cents AS top_share_ppm
    FROM days d JOIN lead l ON d.day = l.day
    ORDER BY d.day_cents DESC, d.day
    LIMIT {PEAKDAY_TOPK}
    """,
)
def peak_day_drivers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 revenue days with each day's leading category and exact
    share ppm: one (day, category) rollup feeding both the day total
    and the per-day argmax window."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("day")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_partkey",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    dc = (
        li.join(orders, "o_orderkey")
        .join(F.broadcast(part), "l_partkey")
        .groupBy("day", "category")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint(eager=False)  # feeds totals + argmax
    )
    days = dc.groupBy("day").agg(F.sum("cents").alias("day_cents"))
    lead = (
        dc.select(
            "day",
            "category",
            "cents",
            F.row_number()
            .over(
                Window.partitionBy("day").orderBy(
                    F.col("cents").desc(), "category"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "day",
            F.col("category").alias("top_category"),
            F.col("cents").alias("top_cents"),
        )
    )
    return (
        days.join(lead, "day")
        .select(
            "day",
            "day_cents",
            "top_category",
            "top_cents",
            F.expr("top_cents * 1000000 div day_cents").alias(
                "top_share_ppm"
            ),
        )
        .orderBy(F.col("day_cents").desc(), "day")
        .limit(PEAKDAY_TOPK)
    )


# --------------------------- transitivity over-collapse audit

# The known failure mode of clustering LSH matches: transitive chains
# merge documents that are NOT actually similar (A~B, B~C, but A!~C)
# — over-collapse that silently deletes non-duplicates.  This audit
# measures it: for every cluster, the exact shingle-set Jaccard of
# each member against the cluster representative (component min), the
# count below the 0.5 verify threshold, and the worst member.  Verify
# joins touch only cluster members (candidate-sized, not corpus-
# sized).
DEDUP_AUDIT_TAU_PPM = 500_000


@register(
    "dedup_transitivity_audit",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + f"""
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION SELECT doc_b, doc_a FROM cand
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clusters AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    sets AS (
      SELECT doc_id, list_sort(list(DISTINCT shingle)) AS sh_set
      FROM sh GROUP BY doc_id
    ),
    scored AS (
      SELECT c.cluster_id,
             len(list_intersect(sm.sh_set, sr.sh_set)) * 1000000
               // len(list_distinct(list_concat(sm.sh_set, sr.sh_set)))
               AS jac_ppm
      FROM clusters c
      JOIN sets sm ON c.doc_id = sm.doc_id
      JOIN sets sr ON c.cluster_id = sr.doc_id
      WHERE c.doc_id <> c.cluster_id
    )
    SELECT cluster_id,
           COUNT(*) + 1 AS n_members,
           CAST(SUM(CASE WHEN jac_ppm < {DEDUP_AUDIT_TAU_PPM}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_overcollapsed,
           MIN(jac_ppm) AS worst_member_jac_ppm
    FROM scored
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
)
def dedup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member-vs-representative exact Jaccard per LSH cluster:
    components from the star-contraction clustering, shingle sets
    shipped only for members, over-collapse count below the 0.5
    verify threshold + the worst member ppm."""
    from data_pipeline_for_e_commerce_shop_spark.operators.dedup import (
        _shingles,
        duplicate_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    clusters = duplicate_clusters(spark, sf_dir).localCheckpoint(
        eager=True
    )
    sets = _shingles(docs).groupBy("doc_id").agg(
        F.array_sort(F.collect_set("shingle")).alias("sh_set")
    )
    members = clusters.where(F.col("doc_id") != F.col("cluster_id"))
    sm = sets.select("doc_id", F.col("sh_set").alias("m_set"))
    sr = sets.select(
        F.col("doc_id").alias("cluster_id"), F.col("sh_set").alias("r_set")
    )
    scored = (
        members.join(sm, "doc_id")
        .join(sr, "cluster_id")
        .select(
            "cluster_id",
            F.expr(
                "size(array_intersect(m_set, r_set)) * 1000000"
                " div size(array_union(m_set, r_set))"
            ).alias("jac_ppm"),
        )
    )
    return (
        scored.groupBy("cluster_id")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_members"),
            F.sum(
                F.when(
                    F.col("jac_ppm") < DEDUP_AUDIT_TAU_PPM, 1
                ).otherwise(0)
            ).alias("n_overcollapsed"),
            F.min("jac_ppm").alias("worst_member_jac_ppm"),
        )
        .orderBy("cluster_id")
    )


# --------------------------- part lifecycle stages

# Catalog lifecycle classification: split each part's revenue between
# the first and second half of its OWN active span and bucket the
# trajectory — growth (h2 >= 1.5x h1), decline (h2 <= 2/3 h1), mature
# otherwise — plus a lapsed flag when the last sale predates the
# corpus horizon by 90+ days.  Integer cross-multiplication instead
# of ratios, so the stage boundaries are exact.
@register(
    "part_lifecycle_stages",
    """
    WITH li AS (
      SELECT l_partkey,
             CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    h AS (SELECT MAX(de) AS horizon FROM li),
    span AS (
      SELECT l_partkey, MIN(de) AS lo, MAX(de) AS hi
      FROM li GROUP BY l_partkey
    ),
    split AS (
      SELECT l.l_partkey,
             CAST(SUM(CASE WHEN 2 * (l.de - s.lo) <= (s.hi - s.lo)
                      THEN l.cents ELSE 0 END) AS BIGINT) AS h1_cents,
             CAST(SUM(CASE WHEN 2 * (l.de - s.lo) > (s.hi - s.lo)
                      THEN l.cents ELSE 0 END) AS BIGINT) AS h2_cents,
             MAX(s.hi) AS last_de
      FROM li l JOIN span s ON l.l_partkey = s.l_partkey
      GROUP BY l.l_partkey
    )
    SELECT sp.l_partkey AS p_partkey, sp.h1_cents, sp.h2_cents,
           CASE
             WHEN 2 * sp.h2_cents >= 3 * sp.h1_cents THEN 'growth'
             WHEN 3 * sp.h2_cents <= 2 * sp.h1_cents THEN 'decline'
             ELSE 'mature'
           END AS stage,
           CASE WHEN hh.horizon - sp.last_de >= 90 THEN 1 ELSE 0 END
             AS lapsed
    FROM split sp CROSS JOIN h hh
    ORDER BY p_partkey
    """,
)
def part_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth/mature/decline per part from own-span half-split revenue
    (integer cross-multiplied boundaries), with a 90-day lapsed flag
    against the 1-row corpus horizon."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("de"),
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    ).localCheckpoint(eager=False)  # feeds horizon + span + split
    h = li.agg(F.max("de").alias("horizon"))
    span = li.groupBy("l_partkey").agg(
        F.min("de").alias("lo"), F.max("de").alias("hi")
    )
    split = (
        li.join(span, "l_partkey")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.when(
                    2 * (F.col("de") - F.col("lo"))
                    <= (F.col("hi") - F.col("lo")),
                    F.col("cents"),
                ).otherwise(0)
            ).alias("h1_cents"),
            F.sum(
                F.when(
                    2 * (F.col("de") - F.col("lo"))
                    > (F.col("hi") - F.col("lo")),
                    F.col("cents"),
                ).otherwise(0)
            ).alias("h2_cents"),
            F.max("hi").alias("last_de"),
        )
    )
    return (
        split.crossJoin(F.broadcast(h))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "h1_cents",
            "h2_cents",
            F.expr(
                "CASE WHEN 2 * h2_cents >= 3 * h1_cents THEN 'growth'"
                " WHEN 3 * h2_cents <= 2 * h1_cents THEN 'decline'"
                " ELSE 'mature' END"
            ).alias("stage"),
            F.when(
                F.col("horizon") - F.col("last_de") >= 90, 1
            ).otherwise(0).alias("lapsed"),
        )
        .orderBy("p_partkey")
    )


# --------------------------- 4-4-5 fiscal calendar

# Enterprise reporting runs on 4-4-5 fiscal calendars, not ISO
# months: 52-week years of four 13-week quarters split 4+4+5, weeks
# starting Monday.  The mapping is PURE INTEGER arithmetic off a
# fixed Monday epoch (1991-02-04, epoch-day 7704), so both engines
# derive identical periods with zero date-library semantics; the
# (52-week) drift against the Gregorian calendar is absorbed by the
# final period, as real 4-4-5 calendars do with their leap week.
FISCAL_EPOCH_DAY = 7704  # 1991-02-04, a Monday


@register(
    "fiscal_445_rollup",
    f"""
    WITH o AS (
      SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01'
              - {FISCAL_EPOCH_DAY}) // 7 AS week_no,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    mapped AS (
      SELECT 1991 + week_no // 52 AS fiscal_year,
             (week_no % 52) // 13 + 1 AS fiscal_quarter,
             CASE WHEN (week_no % 52) % 13 < 4 THEN 1
                  WHEN (week_no % 52) % 13 < 8 THEN 2
                  ELSE 3 END AS period_in_quarter,
             cents
      FROM o
    )
    SELECT fiscal_year, fiscal_quarter,
           (fiscal_quarter - 1) * 3 + period_in_quarter AS fiscal_period,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM mapped
    GROUP BY 1, 2, 3
    ORDER BY fiscal_year, fiscal_period
    """,
)
def fiscal_445_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by 4-4-5 fiscal (year, quarter, period): integer week
    arithmetic off the fixed Monday epoch, one rollup."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
            f" - {FISCAL_EPOCH_DAY}) div 7"
        ).alias("week_no"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    mapped = o.select(
        (F.lit(1991) + F.expr("week_no div 52")).alias("fiscal_year"),
        F.expr("(week_no % 52) div 13 + 1").alias("fiscal_quarter"),
        F.expr(
            "CASE WHEN (week_no % 52) % 13 < 4 THEN 1"
            " WHEN (week_no % 52) % 13 < 8 THEN 2 ELSE 3 END"
        ).alias("period_in_quarter"),
        "cents",
    )
    return (
        mapped.groupBy("fiscal_year", "fiscal_quarter", "period_in_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            "fiscal_year",
            "fiscal_quarter",
            F.expr(
                "(fiscal_quarter - 1) * 3 + period_in_quarter"
            ).alias("fiscal_period"),
            "n_orders",
            "revenue_cents",
        )
        .orderBy("fiscal_year", "fiscal_period")
    )


# --------------------------- key-space density audit

# Surrogate-key forensics: how densely the orderkey space is used,
# and the largest holes — the audit that catches silent hard-deletes,
# failed backfills, and sequence exhaustion.  One lag window over the
# distinct key set; top-5 gaps fully tie-broken.
@register(
    "orderkey_density_audit",
    """
    WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    lagged AS (
      SELECT k, k - LAG(k) OVER (ORDER BY k) AS gap,
             LAG(k) OVER (ORDER BY k) AS prev_k
      FROM k
    ),
    stats AS (
      SELECT COUNT(*) AS n_keys,
             MIN(k) AS min_key, MAX(k) AS max_key,
             CAST(COUNT(*) AS BIGINT) * 1000000
               // (MAX(k) - MIN(k) + 1) AS density_ppm
      FROM k
    ),
    topgaps AS (
      SELECT prev_k AS gap_after_key, gap
      FROM lagged WHERE gap IS NOT NULL
      ORDER BY gap DESC, prev_k LIMIT 5
    )
    SELECT s.n_keys, s.min_key, s.max_key, s.density_ppm,
           g.gap_after_key, g.gap
    FROM stats s CROSS JOIN topgaps g
    ORDER BY g.gap DESC, g.gap_after_key
    """,
)
def orderkey_density_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-space density + top-5 largest holes in o_orderkey: global
    stats (1 row) crossJoined onto the TakeOrdered gap list; the lag
    window runs on the deduped key column only."""
    from pyspark.sql import Window

    k = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds stats + gaps
    )
    lagged = k.select(
        "k",
        (F.col("k") - F.lag("k").over(Window.orderBy("k"))).alias("gap"),
        F.lag("k").over(Window.orderBy("k")).alias("prev_k"),
    )
    stats = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
        F.expr(
            "CAST(COUNT(*) AS BIGINT) * 1000000"
            " div (MAX(k) - MIN(k) + 1)"
        ).alias("density_ppm"),
    )
    topgaps = (
        lagged.where(F.col("gap").isNotNull())
        .select(F.col("prev_k").alias("gap_after_key"), "gap")
        .orderBy(F.col("gap").desc(), "gap_after_key")
        .limit(5)
    )
    return (
        F.broadcast(stats)
        .crossJoin(topgaps)
        .select(
            "n_keys",
            "min_key",
            "max_key",
            "density_ppm",
            "gap_after_key",
            "gap",
        )
        .orderBy(F.col("gap").desc(), "gap_after_key")
    )


# --------------------------- trailing-window revenue snapshot

# The dashboard header numbers: revenue and order counts in the
# trailing 7 / 30 / 90 days before the corpus horizon, plus the
# 7-day week-over-week growth — all from ONE conditional-sum pass
# (no per-window rescans), all exact integer cents/ppm.
@register(
    "revenue_trailing_windows",
    """
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    h AS (SELECT MAX(de) AS hz FROM o)
    SELECT
      CAST(SUM(CASE WHEN de > hz - 7 THEN cents END) AS BIGINT)
        AS rev_7d_cents,
      CAST(SUM(CASE WHEN de > hz - 14 AND de <= hz - 7 THEN cents END)
        AS BIGINT) AS rev_prev_7d_cents,
      CAST(SUM(CASE WHEN de > hz - 30 THEN cents END) AS BIGINT)
        AS rev_30d_cents,
      CAST(SUM(CASE WHEN de > hz - 90 THEN cents END) AS BIGINT)
        AS rev_90d_cents,
      CAST(COUNT(CASE WHEN de > hz - 7 THEN 1 END) AS BIGINT)
        AS n_orders_7d,
      CAST(SUM(CASE WHEN de > hz - 7 THEN cents END) AS BIGINT)
        * 1000000
        // CAST(SUM(CASE WHEN de > hz - 14 AND de <= hz - 7
                    THEN cents END) AS BIGINT) AS wow_ppm
    FROM o CROSS JOIN h
    """,
)
def revenue_trailing_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7/30/90-day revenue + WoW growth off the 1-row
    horizon: one conditional-sum scan, zero window functions."""
    o = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("de"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    h = o.agg(F.max("de").alias("hz"))
    return (
        o.crossJoin(F.broadcast(h))
        .agg(
            F.sum(F.when(F.col("de") > F.col("hz") - 7, F.col("cents")))
            .alias("rev_7d_cents"),
            F.sum(
                F.when(
                    (F.col("de") > F.col("hz") - 14)
                    & (F.col("de") <= F.col("hz") - 7),
                    F.col("cents"),
                )
            ).alias("rev_prev_7d_cents"),
            F.sum(F.when(F.col("de") > F.col("hz") - 30, F.col("cents")))
            .alias("rev_30d_cents"),
            F.sum(F.when(F.col("de") > F.col("hz") - 90, F.col("cents")))
            .alias("rev_90d_cents"),
            F.count(F.when(F.col("de") > F.col("hz") - 7, 1)).alias(
                "n_orders_7d"
            ),
        )
        .select(
            "*",
            F.expr(
                "rev_7d_cents * 1000000 div rev_prev_7d_cents"
            ).alias("wow_ppm"),
        )
    )


# --------------------------- customer spend concentration

# Specialist or generalist?  Per customer: spend HHI across
# categories (Σ share² in exact ppm, the category-level complement to
# category_hhi's market view), the top category and its share — the
# personalization signal that separates single-category loyalists
# from browsers.  One (customer, category) rollup; shares floored to
# ppm before squaring so the HHI is exact integer arithmetic.
CONC_MIN_ORDERS = 2


@register(
    "customer_spend_concentration",
    f"""
    WITH cc AS (
      SELECT o.o_custkey AS c_custkey, p.p_type AS category,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT c_custkey,
             CAST(SUM(cents) AS BIGINT) AS tot_cents,
             COUNT(*) AS n_categories
      FROM cc GROUP BY c_custkey
    ),
    shares AS (
      SELECT cc.c_custkey, cc.category,
             cc.cents * 1000000 // t.tot_cents AS share_ppm,
             t.n_categories,
             ROW_NUMBER() OVER (PARTITION BY cc.c_custkey
                                ORDER BY cc.cents DESC, cc.category)
               AS rn
      FROM cc JOIN tot t ON cc.c_custkey = t.c_custkey
    )
    SELECT c_custkey, MAX(n_categories) AS n_categories,
           CAST(SUM(share_ppm * share_ppm) AS BIGINT) // 1000000
             AS hhi_ppm,
           MAX(CASE WHEN rn = 1 THEN category END) AS top_category,
           MAX(CASE WHEN rn = 1 THEN share_ppm END)
             AS top_share_ppm
    FROM shares
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def customer_spend_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-customer category HHI (Σ floored-ppm-share², exact) + top
    category and share via a per-customer argmax window."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_partkey",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    cc = (
        li.join(orders, "o_orderkey")
        .join(F.broadcast(part), "l_partkey")
        .groupBy(F.col("o_custkey").alias("c_custkey"), "category")
        .agg(F.sum("cents").alias("cents"))
    )
    tot = cc.groupBy("c_custkey").agg(
        F.sum("cents").alias("tot_cents"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    shares = cc.join(tot, "c_custkey").select(
        "c_custkey",
        "category",
        F.expr("cents * 1000000 div tot_cents").alias("share_ppm"),
        "n_categories",
        F.row_number()
        .over(
            Window.partitionBy("c_custkey").orderBy(
                F.col("cents").desc(), "category"
            )
        )
        .alias("rn"),
    )
    return (
        shares.groupBy("c_custkey")
        .agg(
            F.max("n_categories").alias("n_categories"),
            F.expr(
                "CAST(SUM(share_ppm * share_ppm) AS BIGINT)"
                " div 1000000"
            ).alias("hhi_ppm"),
            F.max(F.when(F.col("rn") == 1, F.col("category"))).alias(
                "top_category"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("share_ppm"))).alias(
                "top_share_ppm"
            ),
        )
        .orderBy("c_custkey")
    )


# --------------------------- region quarterly growth grid

# The exec dashboard grid: revenue per (region, calendar quarter)
# with quarter-over-quarter growth ppm from a region-partitioned lag
# window — regional_revenue's trend extension.  Dims broadcast;
# quarters derived with integer month arithmetic (no date-library
# quarter semantics).
@register(
    "region_quarter_growth",
    """
    WITH rq AS (
      SELECT r.r_name AS region,
             EXTRACT(year FROM o.o_orderdate) * 4
               + (EXTRACT(month FROM o.o_orderdate) - 1) // 3 AS qidx,
             CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region,
           qidx // 4 AS year,
           qidx % 4 + 1 AS quarter,
           cents AS revenue_cents,
           CASE WHEN LAG(qidx) OVER w = qidx - 1
                THEN cents * 1000000 // (LAG(cents) OVER w) END
             AS qoq_ppm
    FROM rq
    WINDOW w AS (PARTITION BY region ORDER BY qidx)
    ORDER BY region, qidx
    """,
)
def region_quarter_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region, quarter) revenue + QoQ ppm: three broadcast dim hops,
    integer quarter index, region-partitioned lag (gap quarters yield
    NULL growth rather than comparing non-adjacent quarters)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "EXTRACT(year FROM o_orderdate) * 4"
            " + CAST((EXTRACT(month FROM o_orderdate) - 1) div 3 AS BIGINT)"
        ).alias("qidx"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"),
        F.col("r_name").alias("region"),
    )
    rq = (
        o.join(F.broadcast(cust), "o_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .join(F.broadcast(region), "n_regionkey")
        .groupBy("region", "qidx")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("region").orderBy("qidx")
    return rq.select(
        "region",
        F.expr("qidx div 4").alias("year"),
        (F.col("qidx") % 4 + 1).alias("quarter"),
        F.col("cents").alias("revenue_cents"),
        F.when(
            F.lag("qidx").over(w) == F.col("qidx") - 1,
            F.expr("cents * 1000000") / F.lag("cents").over(w),
        )
        .cast("long")
        .alias("qoq_ppm"),
        F.col("qidx").alias("_qidx"),
    ).drop("_qidx").orderBy("region", "year", "quarter")


# --------------------------- sample-ratio-mismatch guardrail

# The experiment guardrail that fires BEFORE anyone reads lift
# numbers: users hash into two arms that should split 50/50; a
# chi-square of the observed counts against the even split catches
# broken assignment/logging (SRM).  chi2 for the equal-split case
# reduces to (o1-o2)^2/(o1+o2) — one exact integer ratio; the alarm
# cross-multiplies against the frozen 3.841 critical value, so the
# whole guardrail is division-free integers.
@register(
    "ab_srm_check",
    """
    WITH arms AS (
      SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 2 AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    c AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM arms
    )
    SELECT n_a, n_b,
           (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b)
             AS chi2_e3,
           CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000
                     > 3841 * (n_a + n_b)
                THEN 1 ELSE 0 END AS srm_alarm
    FROM c
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRM chi-square on the md5 arm split of distinct users: exact
    integer (o1−o2)²/(o1+o2) in e3 units, division-free alarm against
    the frozen df=1 critical value."""
    arms = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm")
        )
    )
    return (
        arms.agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        )
        .select(
            "n_a",
            "n_b",
            F.expr(
                "(n_a - n_b) * (n_a - n_b) * 1000 div (n_a + n_b)"
            ).alias("chi2_e3"),
            F.expr(
                "CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000"
                " > 3841 * (n_a + n_b) THEN 1 ELSE 0 END"
            ).alias("srm_alarm"),
        )
    )


# --------------------------- ABC x XYZ policy matrix

# The 9-cell inventory policy matrix: value class (ABC by cumulative
# revenue share) crossed with variability class (XYZ by weekly-demand
# cv²) — AX is "automate replenishment", CZ is "make to order".
# Recomputes both classifications from their single sources of truth
# (identical boundary arithmetic as part_abc_classes /
# part_xyz_classes), then one part-keyed join and a 9-cell rollup.
@register(
    "part_abc_xyz_matrix",
    """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per_part),
    abc AS (
      SELECT l_partkey,
             CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
        FROM per_part
      ) CROSS JOIN tot
    ),
    weekly AS (
      SELECT l_partkey,
             CAST(floor(epoch(CAST(l_shipdate AS DATE))) AS BIGINT)
               // 604800 AS wk,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN (n_weeks * sqq - sq * sq) * 1000000
                       // (sq * sq) <= 250000 THEN 'X'
                  WHEN (n_weeks * sqq - sq * sq) * 1000000
                       // (sq * sq) <= 1000000 THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM (
        SELECT l_partkey, COUNT(*) AS n_weeks,
               CAST(SUM(q) AS BIGINT) AS sq,
               CAST(SUM(q * q) AS BIGINT) AS sqq
        FROM weekly GROUP BY l_partkey
      ) WHERE sq > 0
    )
    SELECT a.abc, x.xyz, COUNT(*) AS n_parts
    FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
    GROUP BY a.abc, x.xyz
    ORDER BY a.abc, x.xyz
    """,
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC x XYZ cell counts: both classifications re-derived with
    the exact boundary arithmetic of their standalone queries, one
    part-keyed equi-join, 9-row output."""
    from pyspark.sql import Window

    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    tot = per_part.agg(F.sum("cents").alias("total"))
    abc = (
        per_part.select(
            "l_partkey",
            "cents",
            F.sum("cents")
            .over(
                Window.orderBy(F.col("cents").desc(), "l_partkey")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cum"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            F.expr(
                "CASE WHEN cum * 100 <= total * 80 THEN 'A'"
                " WHEN cum * 100 <= total * 95 THEN 'B'"
                " ELSE 'C' END"
            ).alias("abc"),
        )
    )
    weekly = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            F.expr(
                "unix_timestamp(CAST(l_shipdate AS DATE)) div 604800"
            ).alias("wk"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    xyz = (
        weekly.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_weeks"),
            F.sum("q").alias("sq"),
            F.sum(F.col("q") * F.col("q")).alias("sqq"),
        )
        .where(F.col("sq") > 0)
        .select(
            "l_partkey",
            F.expr(
                "CASE WHEN (n_weeks * sqq - sq * sq) * 1000000"
                " div (sq * sq) <= 250000 THEN 'X'"
                " WHEN (n_weeks * sqq - sq * sq) * 1000000"
                " div (sq * sq) <= 1000000 THEN 'Y'"
                " ELSE 'Z' END"
            ).alias("xyz"),
        )
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("abc", "xyz")
    )


# --------------------------- int8 quantization recall

# What does int8 ACTUALLY cost in retrieval quality?  Brute top-5
# under symmetric int8 quantization (quantize_embeddings' exact
# floor(x/||v||*127+.5) scheme — integer dot products) graded against
# the full-precision brute top-5 — closing the quantization loop:
# quantize (storage) -> PQ (index) -> THIS (the measured recall
# cost).  Same broadcast-queries shape as every brute gauge.
@register(
    "ann_int8_recall",
    f"""
    WITH brute AS ({{brute}}),
    ve AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    nrm AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(e, x -> x * x)), (a, b) -> a + b)) AS n
      FROM ve
    ),
    qv AS (
      SELECT vec_id,
             list_transform(nrm.e,
               x -> CAST(floor(x / nrm.n * 127 + 0.5) AS BIGINT)) AS q
      FROM nrm
    ),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 65), j -> a.q[j] * b.q[j])),
               (x, y) -> x + y) AS dot8
      FROM qv a JOIN qv b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < 5
    ),
    top8 AS (
      SELECT query_id, corpus_id FROM (
        SELECT query_id, corpus_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dot8 DESC, corpus_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    )
    SELECT t.query_id,
           CAST(COUNT(b.corpus_id) AS BIGINT) AS n_matches,
           CAST(COUNT(b.corpus_id) AS BIGINT) * 1000000 // 5
             AS recall_ppm
    FROM top8 t
    LEFT JOIN brute b ON b.query_id = t.query_id
                     AND b.corpus_id = t.corpus_id
    GROUP BY t.query_id
    ORDER BY t.query_id
    """.format(brute=ORACLES["ann_brute_topk"]),
)
def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of int8-dot brute retrieval vs full-precision brute:
    exact integer int8 dots (quantize_embeddings scheme), per-query
    windowed top-5, equi-join overlap count."""
    from data_pipeline_for_e_commerce_shop_spark.operators.similarity import (
        brute_force_topk,
    )
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    nrm = emb.select(
        "vec_id",
        "e",
        F.expr(
            "sqrt(aggregate(e, CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + x * x))"
        ).alias("n"),
    )
    qv = nrm.select(
        "vec_id",
        F.expr(
            "transform(e, x -> CAST(floor(x / n * 127 + 0.5) AS BIGINT))"
        ).alias("q"),
    )
    queries = qv.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(qv)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("corpus_id"),
            F.expr(
                "aggregate(zip_with(qq, q, (x, y) -> x * y),"
                " CAST(0 AS BIGINT), (a, v) -> a + v)"
            ).alias("dot8"),
        )
    )
    top8 = (
        scored.select(
            "query_id",
            "corpus_id",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("dot8").desc(), "corpus_id"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") <= 5)
        .select("query_id", "corpus_id")
    )
    brute = brute_force_topk(spark, sf_dir, k=5).select(
        "query_id", "corpus_id", F.lit(1).alias("hit")
    )
    return (
        top8.join(brute, ["query_id", "corpus_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").alias("n_matches"))
        .select(
            "query_id",
            "n_matches",
            F.expr("n_matches * 1000000 div 5").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


# --------------------------- source-mix TV distance

# How far is the corpus from the uniform source mix a balanced
# training run wants?  Total-variation distance between the observed
# source shares and uniform, EXACT via cross-multiplication:
# TV = Σ|n_i·S − N| / (2·N·S) — no per-source division at all — plus
# the most over- and under-represented sources.  One vocabulary-
# sized rollup.
@register(
    "corpus_mix_tv_distance",
    """
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, COUNT(*) AS s FROM per
    ),
    dev AS (
      SELECT p.source, p.n,
             p.n * t.s - t.nn AS dev_num,
             t.nn, t.s
      FROM per p CROSS JOIN t
    )
    SELECT MAX(s) AS n_sources, MAX(nn) AS n_docs,
           CAST(SUM(ABS(dev_num)) AS BIGINT) * 1000000
             // (2 * MAX(nn) * MAX(s)) AS tv_uniform_ppm,
           MAX(CASE WHEN dev_num = mx THEN source END)
             AS most_over_source,
           MAX(CASE WHEN dev_num = mn THEN source END)
             AS most_under_source
    FROM (
      SELECT *,
             MAX(dev_num) OVER () AS mx,
             MIN(dev_num) OVER () AS mn
      FROM dev
    )
    """,
)
def corpus_mix_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TV distance of the source mix from uniform (cross-
    multiplied integers, single division at the end) + argmax over/
    under sources."""
    from pyspark.sql import Window

    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = per.agg(
        F.sum("n").alias("nn"), F.count(F.lit(1)).alias("s")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dev = (
        per.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n",
            (F.col("n") * F.col("s") - F.col("nn")).alias("dev_num"),
            "nn",
            "s",
        )
        .select(
            "*",
            F.max("dev_num").over(w_all).alias("mx"),
            F.min("dev_num").over(w_all).alias("mn"),
        )
    )
    return dev.agg(
        F.max("s").alias("n_sources"),
        F.max("nn").alias("n_docs"),
        F.expr(
            "CAST(SUM(ABS(dev_num)) AS BIGINT) * 1000000"
            " div (2 * MAX(nn) * MAX(s))"
        ).alias("tv_uniform_ppm"),
        F.max(
            F.when(F.col("dev_num") == F.col("mx"), F.col("source"))
        ).alias("most_over_source"),
        F.max(
            F.when(F.col("dev_num") == F.col("mn"), F.col("source"))
        ).alias("most_under_source"),
    )


# --------------------------- cross-supplier price consistency

# Procurement leakage: the same part bought at different unit prices
# from different suppliers.  Per (part, supplier): floored mean unit
# price in cents; per part: cheapest/priciest supplier spread as
# exact ppm; top-20 widest spreads with the supplier ids — the
# renegotiation worklist.  Two part-keyed aggregates + one argmin/
# argmax window pass.
PRICECONS_TOPK = 20


@register(
    "part_price_consistency",
    f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT)
               // CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS unit_cents
      FROM lineitem
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT l_partkey, l_suppkey, unit_cents,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cents, l_suppkey)
               AS rn_lo,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cents DESC, l_suppkey)
               AS rn_hi,
             COUNT(*) OVER (PARTITION BY l_partkey) AS n_suppliers
      FROM ps
    )
    SELECT l_partkey AS p_partkey, n_suppliers,
           MAX(CASE WHEN rn_lo = 1 THEN l_suppkey END) AS cheap_supp,
           MAX(CASE WHEN rn_lo = 1 THEN unit_cents END) AS cheap_cents,
           MAX(CASE WHEN rn_hi = 1 THEN l_suppkey END) AS dear_supp,
           MAX(CASE WHEN rn_hi = 1 THEN unit_cents END) AS dear_cents,
           MAX(CASE WHEN rn_hi = 1 THEN unit_cents END) * 1000000
             // MAX(CASE WHEN rn_lo = 1 THEN unit_cents END)
             AS spread_ppm
    FROM ranked
    WHERE n_suppliers >= 2
    GROUP BY l_partkey, n_suppliers
    ORDER BY spread_ppm DESC, p_partkey
    LIMIT {PRICECONS_TOPK}
    """,
)
def part_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 widest cross-supplier unit-price spreads per part:
    floored integer unit prices, cheapest/priciest picked by fully
    tie-broken windows, exact spread ppm."""
    from pyspark.sql import Window

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))"
                " AS BIGINT)"
                " div CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
            ).alias("unit_cents")
        )
    )
    w = Window.partitionBy("l_partkey")
    ranked = ps.select(
        "l_partkey",
        "l_suppkey",
        "unit_cents",
        F.row_number()
        .over(w.orderBy("unit_cents", "l_suppkey"))
        .alias("rn_lo"),
        F.row_number()
        .over(w.orderBy(F.col("unit_cents").desc(), "l_suppkey"))
        .alias("rn_hi"),
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
    )
    return (
        ranked.where(F.col("n_suppliers") >= 2)
        .groupBy("l_partkey", "n_suppliers")
        .agg(
            F.max(
                F.when(F.col("rn_lo") == 1, F.col("l_suppkey"))
            ).alias("cheap_supp"),
            F.max(
                F.when(F.col("rn_lo") == 1, F.col("unit_cents"))
            ).alias("cheap_cents"),
            F.max(
                F.when(F.col("rn_hi") == 1, F.col("l_suppkey"))
            ).alias("dear_supp"),
            F.max(
                F.when(F.col("rn_hi") == 1, F.col("unit_cents"))
            ).alias("dear_cents"),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "n_suppliers",
            "cheap_supp",
            "cheap_cents",
            "dear_supp",
            "dear_cents",
            F.expr(
                "dear_cents * 1000000 div cheap_cents"
            ).alias("spread_ppm"),
        )
        .orderBy(F.col("spread_ppm").desc(), "p_partkey")
        .limit(PRICECONS_TOPK)
    )


# --------------------------- cart abandonment

# Deadline-bounded conversion: for each user's click (the cart
# proxy), did a purchase follow within 24 hours?  Abandonment per
# day = clicks with no purchase inside the deadline — the funnel
# family's "conversion with an SLA" member.  The click->next-purchase
# match is one user-keyed equi-join with a MIN over qualifying
# purchase times (no per-click rescan), all integer epoch seconds.
CART_DEADLINE_SECONDS = 86400


@register(
    "cart_abandonment_rate",
    f"""
    WITH clicks AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ct,
             CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
      SELECT c.event_id, c.day,
             MIN(p.pt) AS first_conv
      FROM clicks c
      LEFT JOIN purch p ON p.user_id = c.user_id
                       AND p.pt >= c.ct
                       AND p.pt < c.ct + {CART_DEADLINE_SECONDS}
      GROUP BY c.event_id, c.day
    )
    SELECT day,
           COUNT(*) AS n_carts,
           CAST(SUM(CASE WHEN first_conv IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_abandoned,
           CAST(SUM(CASE WHEN first_conv IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // COUNT(*) AS abandonment_ppm
    FROM matched
    GROUP BY day
    ORDER BY day
    """,
)
def cart_abandonment_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day 24-hour cart abandonment: clicks left-joined to
    qualifying purchases on user + time-window residual, MIN-reduced
    per click, day rollup in exact ppm."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        F.col("ts").cast("date").alias("day"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("sec").alias("ct"), "day"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("sec").alias("pt")
    )
    matched = (
        clicks.join(
            purch,
            (clicks["user_id"] == purch["user_id"])
            & (F.col("pt") >= F.col("ct"))
            & (F.col("pt") < F.col("ct") + CART_DEADLINE_SECONDS),
            "left",
        )
        .groupBy("event_id", "day")
        .agg(F.min("pt").alias("first_conv"))
    )
    return (
        matched.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_carts"),
            F.sum(
                F.when(F.col("first_conv").isNull(), 1).otherwise(0)
            ).alias("n_abandoned"),
        )
        .select(
            "day",
            "n_carts",
            "n_abandoned",
            F.expr(
                "n_abandoned * 1000000 div n_carts"
            ).alias("abandonment_ppm"),
        )
        .orderBy("day")
    )


# --------------------------- seasonal peak tagging

# Catalog seasonality tags: each part's peak revenue month (argmax
# with earliest-month tie-break), the share of its revenue that month
# carries, and a seasonal flag when the peak holds more than 2x the
# uniform 1/12 share — the input to seasonal merchandising and
# safety-stock policies.  One (part, month) rollup + one per-part
# argmax window; the seasonal test cross-multiplies (share*12 > 2)
# so no division happens per part.
@register(
    "part_peak_season",
    """
    WITH pm AS (
      SELECT l_partkey,
             EXTRACT(month FROM l_shipdate) AS month,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey, CAST(SUM(cents) AS BIGINT) AS tot_cents
      FROM pm GROUP BY l_partkey
    ),
    ranked AS (
      SELECT pm.l_partkey, pm.month, pm.cents, t.tot_cents,
             ROW_NUMBER() OVER (PARTITION BY pm.l_partkey
                                ORDER BY pm.cents DESC, pm.month)
               AS rn
      FROM pm JOIN tot t ON pm.l_partkey = t.l_partkey
    )
    SELECT l_partkey AS p_partkey,
           month AS peak_month,
           cents * 1000000 // tot_cents AS peak_share_ppm,
           CASE WHEN cents * 12 > 2 * tot_cents THEN 1 ELSE 0 END
             AS is_seasonal
    FROM ranked WHERE rn = 1
    ORDER BY p_partkey
    """,
)
def part_peak_season(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak revenue month per part (tie-broken argmax window), exact
    peak share ppm, division-free 2x-uniform seasonal flag."""
    from pyspark.sql import Window

    pm = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            F.expr("EXTRACT(month FROM l_shipdate)").alias("month"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    tot = pm.groupBy("l_partkey").agg(F.sum("cents").alias("tot_cents"))
    ranked = pm.join(tot, "l_partkey").select(
        "l_partkey",
        "month",
        "cents",
        "tot_cents",
        F.row_number()
        .over(
            Window.partitionBy("l_partkey").orderBy(
                F.col("cents").desc(), "month"
            )
        )
        .alias("rn"),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("month").alias("peak_month"),
            F.expr("cents * 1000000 div tot_cents").alias(
                "peak_share_ppm"
            ),
            F.expr(
                "CASE WHEN cents * 12 > 2 * tot_cents THEN 1 ELSE 0 END"
            ).alias("is_seasonal"),
        )
        .orderBy("p_partkey")
    )


# --------------------------- two-NN ratio diagnostic

# Intrinsic-dimension diagnostic without the log: the TwoNN estimator
# keys on the ratio r2/r1 of each point's second- to first-nearest-
# neighbor distance (low ratios => high intrinsic dimension).  The
# MLE itself needs log() (not engine-portable), so the query emits
# the portable sufficient statistic instead: per-panel-point exact
# integer n²·dist² for both neighbors and the ratio in ppm, plus the
# panel's positional median ratio — downstream can apply any
# estimator.  Panel (vec_id % 20 == 0) vs corpus is the brute gauge
# shape; at 100 TB the panel stays fixed while the corpus scan is the
# cost, like every other gauge.
TWONN_PANEL_MOD = 20


@register(
    "embedding_twonn_ratio",
    f"""
    WITH ve AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000) AS BIGINT)) AS xs
      FROM embeddings
    ),
    panel AS (SELECT * FROM ve WHERE vec_id % {TWONN_PANEL_MOD} = 0),
    d2 AS (
      SELECT p.vec_id AS query_id, c.vec_id AS corpus_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, 65), j ->
                 CAST(p.xs[j] - c.xs[j] AS DOUBLE)
                 * CAST(p.xs[j] - c.xs[j] AS DOUBLE))),
               (a, b) -> a + b) AS dist2
      FROM panel p JOIN ve c ON c.vec_id <> p.vec_id
    ),
    nn AS (
      SELECT query_id, corpus_id, dist2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dist2, corpus_id) AS rn
      FROM d2
    ),
    pairs AS (
      SELECT a.query_id,
             CAST(floor(sqrt(a.dist2)) AS BIGINT) AS r1_micro,
             CAST(floor(sqrt(b.dist2)) AS BIGINT) AS r2_micro,
             CAST(floor(sqrt(b.dist2) * 1000000 / sqrt(a.dist2))
               AS BIGINT) AS ratio_ppm
      FROM nn a JOIN nn b ON a.query_id = b.query_id
      WHERE a.rn = 1 AND b.rn = 2
    ),
    med AS (
      SELECT ratio_ppm AS median_ratio_ppm FROM (
        SELECT ratio_ppm,
               ROW_NUMBER() OVER (ORDER BY ratio_ppm, query_id) AS rn,
               COUNT(*) OVER () AS np
        FROM pairs
      ) WHERE rn = (np + 1) // 2
    )
    SELECT p.query_id, p.r1_micro, p.r2_micro, p.ratio_ppm,
           m.median_ratio_ppm
    FROM pairs p CROSS JOIN med m
    ORDER BY p.query_id
    """,
)
def embedding_twonn_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-panel-point first/second-NN distances (exact int64 diffs,
    dim-ordered double fold, floor(sqrt)) and the r2/r1 ratio ppm,
    with the panel's positional median attached — the TwoNN
    intrinsic-dimension sufficient statistic, log-free."""
    from pyspark.sql import Window

    ve = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("xs"),
    )
    panel = ve.where(F.col("vec_id") % TWONN_PANEL_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("xs").alias("q_xs")
    )
    d2 = (
        F.broadcast(panel)
        .crossJoin(ve)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("corpus_id"),
            F.expr(
                "aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE),"
                " (a, j) -> a"
                " + CAST(element_at(q_xs, j) - element_at(xs, j)"
                "   AS DOUBLE)"
                " * CAST(element_at(q_xs, j) - element_at(xs, j)"
                "   AS DOUBLE))"
            ).alias("dist2"),
        )
    )
    nn = d2.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy("dist2", "corpus_id")
        )
        .alias("rn"),
    ).where(F.col("rn") <= 2)
    a = nn.where(F.col("rn") == 1).select(
        "query_id", F.col("dist2").alias("d1")
    )
    b = nn.where(F.col("rn") == 2).select(
        "query_id", F.col("dist2").alias("d2b")
    )
    pairs = a.join(b, "query_id").select(
        "query_id",
        F.expr("CAST(floor(sqrt(d1)) AS BIGINT)").alias("r1_micro"),
        F.expr("CAST(floor(sqrt(d2b)) AS BIGINT)").alias("r2_micro"),
        F.expr(
            "CAST(floor(sqrt(d2b) * 1000000 / sqrt(d1)) AS BIGINT)"
        ).alias("ratio_ppm"),
    )
    med = (
        pairs.select(
            "ratio_ppm",
            F.row_number()
            .over(Window.orderBy("ratio_ppm", "query_id"))
            .alias("rn"),
            F.count(F.lit(1))
            .over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("np"),
        )
        .where(F.col("rn") == F.expr("(np + 1) div 2"))
        .select(F.col("ratio_ppm").alias("median_ratio_ppm"))
    )
    return (
        pairs.crossJoin(F.broadcast(med))
        .select(
            "query_id",
            "r1_micro",
            "r2_micro",
            "ratio_ppm",
            "median_ratio_ppm",
        )
        .orderBy("query_id")
    )


# --------------------------- whale concentration

# Whale analysis on event value: what share of total value do the
# top 1% / 5% / 10% of users carry?  Users rank by exact cent
# totals; the percentile head counts are ceil(n*p) positional (no
# interpolation ambiguity), shares are exact ppm from running sums —
# the user-level complement to revenue_concentration_curve's
# category Lorenz deciles.
@register(
    "user_value_pareto",
    """
    WITH per AS (
      SELECT user_id,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS rn,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             COUNT(*) OVER () AS n,
             CAST(SUM(cents) OVER () AS BIGINT) AS tot
      FROM per
    ),
    cuts AS (SELECT u.p AS pct FROM UNNEST([1, 5, 10]) AS u(p))
    SELECT c.pct,
           (SELECT (r.n * c.pct + 99) // 100 FROM ranked r LIMIT 1)
             AS n_top_users,
           MAX(CASE WHEN rn = (n * c.pct + 99) // 100
               THEN cum END) AS top_cents,
           MAX(CASE WHEN rn = (n * c.pct + 99) // 100
               THEN cum * 1000000 // tot END) AS share_ppm
    FROM ranked CROSS JOIN cuts c
    GROUP BY c.pct
    ORDER BY c.pct
    """,
)
def user_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1/5/10% user share of total event value: one user rollup,
    one desc running-sum window, positional ceil(n·p) cuts, exact
    ppm shares."""
    from pyspark.sql import Window

    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr("CAST(floor(value * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    w_desc = Window.orderBy(F.col("cents").desc(), "user_id")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per.select(
        "cents",
        F.row_number().over(w_desc).alias("rn"),
        F.sum("cents")
        .over(w_desc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cents").over(w_all).alias("tot"),
    )
    cuts = spark.createDataFrame([(1,), (5,), (10,)], "pct long")
    return (
        ranked.crossJoin(F.broadcast(cuts))
        .groupBy("pct")
        .agg(
            F.max(F.expr("(n * pct + 99) div 100")).alias("n_top_users"),
            F.max(
                F.expr(
                    "CASE WHEN rn = (n * pct + 99) div 100"
                    " THEN cum END"
                )
            ).alias("top_cents"),
            F.max(
                F.expr(
                    "CASE WHEN rn = (n * pct + 99) div 100"
                    " THEN cum * 1000000 div tot END"
                )
            ).alias("share_ppm"),
        )
        .orderBy("pct")
    )


# --------------------------- order complexity profile

# Fulfillment complexity: orders bucketed by how many line items,
# distinct suppliers, and distinct categories they touch — the
# operational histogram that prices split-shipment risk.  One
# order-keyed rollup (broadcast dim for categories), grouped into a
# compact (n_items, n_suppliers, n_categories) profile with exact
# average order value per cell.
@register(
    "order_complexity_profile",
    """
    WITH per AS (
      SELECT l.l_orderkey,
             COUNT(*) AS n_items,
             COUNT(DISTINCT l.l_suppkey) AS n_suppliers,
             COUNT(DISTINCT p.p_type) AS n_categories,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY l.l_orderkey
    )
    SELECT n_items, n_suppliers, n_categories,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) // COUNT(*) AS avg_cents
    FROM per
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def order_complexity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(items, suppliers, categories) complexity cells with order
    counts and exact floored average value."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    per = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("category").alias("n_categories"),
            F.sum("cents").alias("cents"),
        )
    )
    return (
        per.groupBy("n_items", "n_suppliers", "n_categories")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(cents) AS BIGINT) div COUNT(*)"
            ).alias("avg_cents"),
        )
        .orderBy("n_items", "n_suppliers", "n_categories")
    )


# --------------------------- one-pass KPI wall

# The multi-query-optimization statement: five dashboard KPI families
# — revenue stats, status mix, priority mix, weekday mix, order-size
# bands — computed in ONE scan of orders with conditional aggregation
# (a dashboard that issues five queries pays five scans; at 100 TB
# the difference IS the bill).  The plan carries exactly one
# Exchange: the final single-row aggregate.
@register(
    "orders_onepass_kpis",
    """
    SELECT COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
             AS BIGINT) // COUNT(*) AS avg_cents,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)
             AS BIGINT) AS n_status_f,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END)
             AS BIGINT) AS n_status_o,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END)
             AS BIGINT) AS n_status_p,
           CAST(COUNT(CASE WHEN o_orderpriority LIKE '1%'
                      OR o_orderpriority LIKE '2%' THEN 1 END)
             AS BIGINT) AS n_urgent_high,
           CAST(COUNT(CASE WHEN dayofweek(CAST(o_orderdate AS DATE))
                      IN (0, 6) THEN 1 END) AS BIGINT)
             AS n_weekend,
           CAST(COUNT(CASE WHEN o_totalprice >= 200000 THEN 1 END)
             AS BIGINT) AS n_jumbo,
           CAST(COUNT(CASE WHEN o_totalprice < 50000 THEN 1 END)
             AS BIGINT) AS n_small
    FROM orders
    """,
)
def orders_onepass_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five KPI families in one conditional-aggregation scan (single
    Exchange).  DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday; the
    Spark side subtracts 1 so the weekend set matches."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
        ).alias("revenue_cents"),
        F.expr(
            "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
            " AS BIGINT) div COUNT(*)"
        ).alias("avg_cents"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias(
            "n_status_f"
        ),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias(
            "n_status_o"
        ),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias(
            "n_status_p"
        ),
        F.count(
            F.when(
                F.col("o_orderpriority").like("1%")
                | F.col("o_orderpriority").like("2%"),
                1,
            )
        ).alias("n_urgent_high"),
        F.count(
            F.when(
                (F.dayofweek(F.col("o_orderdate").cast("date")) - 1)
                .isin(0, 6),
                1,
            )
        ).alias("n_weekend"),
        F.count(F.when(F.col("o_totalprice") >= 200000, 1)).alias(
            "n_jumbo"
        ),
        F.count(F.when(F.col("o_totalprice") < 50000, 1)).alias(
            "n_small"
        ),
    )


# --------------------------- exact 1-D bimodal split

# Optimal 2-cluster split of order values — exact Fisher–Jenks for
# k=2: for SORTED 1-D data the optimal 2-means partition is a prefix/
# suffix cut, so scanning the n-1 cut positions with integer prefix
# sums (SSE = Q - S²/n per side, the revenue_best_split decomposition
# applied to the VALUE axis instead of time) finds the global optimum
# — no EM, no seeds, no iterations.  Output: the split point, both
# cluster means/sizes, and variance-explained ppm.
@register(
    "order_value_bimodal_split",
    """
    WITH v AS (
      SELECT CAST(floor(o_totalprice) AS BIGINT) AS x FROM orders
    ),
    pre AS (
      SELECT x,
             ROW_NUMBER() OVER (ORDER BY x) AS t,
             CAST(SUM(x) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s_t,
             CAST(SUM(x * x) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS q_t,
             COUNT(*) OVER () AS n,
             CAST(SUM(x) OVER () AS BIGINT) AS s_n,
             CAST(SUM(x * x) OVER () AS BIGINT) AS q_n
      FROM v
    ),
    costs AS (
      SELECT x, t, n, s_t, s_n,
             (CAST(q_t AS DOUBLE) - CAST(s_t AS DOUBLE) * s_t / t)
             + (CAST(q_n - q_t AS DOUBLE)
                - CAST(s_n - s_t AS DOUBLE) * (s_n - s_t) / (n - t))
               AS split_sse,
             CAST(q_n AS DOUBLE)
               - CAST(s_n AS DOUBLE) * s_n / n AS total_sse
      FROM pre WHERE t < n
    )
    SELECT x AS split_below_dollars,
           t AS n_low, n - t AS n_high,
           s_t // t AS mean_low_dollars,
           (s_n - s_t) // (n - t) AS mean_high_dollars,
           CAST(floor((total_sse - split_sse) * 1000000 / total_sse)
             AS BIGINT) AS variance_explained_ppm
    FROM costs
    ORDER BY split_sse, t
    LIMIT 1
    """,
)
def order_value_bimodal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Fisher–Jenks k=2 on order values: value-sorted integer
    prefix sums, O(1) double SSE per cut, argmin with smallest-t
    tie-break — globally optimal 1-D 2-means with zero iterations."""
    from pyspark.sql import Window

    v = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(floor(o_totalprice) AS BIGINT)").alias("x")
    )
    w_run = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = v.select(
        "x",
        F.row_number().over(Window.orderBy("x")).alias("t"),
        F.sum("x").over(w_run).alias("s_t"),
        F.sum(F.col("x") * F.col("x")).over(w_run).alias("q_t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("s_n"),
        F.sum(F.col("x") * F.col("x")).over(w_all).alias("q_n"),
    )
    costs = pre.where(F.col("t") < F.col("n")).select(
        "x",
        "t",
        "n",
        "s_t",
        "s_n",
        F.expr(
            "(CAST(q_t AS DOUBLE) - CAST(s_t AS DOUBLE) * s_t / t)"
            " + (CAST(q_n - q_t AS DOUBLE)"
            "    - CAST(s_n - s_t AS DOUBLE) * (s_n - s_t) / (n - t))"
        ).alias("split_sse"),
        F.expr(
            "CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n"
        ).alias("total_sse"),
    )
    return (
        costs.orderBy("split_sse", "t")
        .limit(1)
        .select(
            F.col("x").alias("split_below_dollars"),
            F.col("t").alias("n_low"),
            (F.col("n") - F.col("t")).alias("n_high"),
            F.expr("s_t div t").alias("mean_low_dollars"),
            F.expr("(s_n - s_t) div (n - t)").alias("mean_high_dollars"),
            F.expr(
                "CAST(floor((total_sse - split_sse) * 1000000"
                " / total_sse) AS BIGINT)"
            ).alias("variance_explained_ppm"),
        )
    )


# --------------------------- higher-moment profile

# Skewness and excess kurtosis per event type from EXACT integer
# power sums (Σx..Σx⁴ in whole dollars — cents would overflow int64
# at Σx³): the one-pass moment profile that decides which downstream
# models get a heavy-tail treatment.  Central moments expand from the
# raw sums in deterministic doubles (identical op order both
# engines); only mean/var/skew/kurt divisions are floating.
@register(
    "events_value_moments",
    """
    WITH v AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS x
      FROM events
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x * x) AS BIGINT) AS s2,
             CAST(SUM(x * x * x) AS BIGINT) AS s3,
             CAST(SUM(x * x * x * x) AS BIGINT) AS s4
      FROM v GROUP BY event_type
    )
    SELECT event_type, n,
           s1 // n AS mean_dollars,
           CAST(floor((CAST(s2 AS DOUBLE) / n
             - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             * 1000) AS BIGINT) AS var_e3,
           CAST(floor(
             (CAST(s3 AS DOUBLE) / n
              - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
              + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                  * (CAST(s1 AS DOUBLE) / n))
             / pow(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n), 1.5)
             * 1000000) AS BIGINT) AS skew_ppm,
           CAST(floor(
             ((CAST(s4 AS DOUBLE) / n
               - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
               + 6 * (CAST(s1 AS DOUBLE) / n)
                   * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
               - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                   * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
              / ((CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 * (CAST(s2 AS DOUBLE) / n
                    - (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)))
              - 3) * 1000000) AS BIGINT) AS excess_kurtosis_ppm
    FROM m
    ORDER BY event_type
    """,
)
def events_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/skewness/excess-kurtosis per type from one pass
    of exact integer power sums (whole dollars keep Σx³/Σx⁴ in
    int64); moment expansion in fixed-order doubles."""
    v = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(floor(value) AS BIGINT)").alias("x")
    )
    m = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias(
            "s4"
        ),
    )
    mu = "(CAST(s1 AS DOUBLE) / n)"
    m2 = f"(CAST(s2 AS DOUBLE) / n - {mu} * {mu})"
    m3 = (
        f"(CAST(s3 AS DOUBLE) / n - 3 * {mu} * (CAST(s2 AS DOUBLE) / n)"
        f" + 2 * {mu} * {mu} * {mu})"
    )
    m4 = (
        f"(CAST(s4 AS DOUBLE) / n - 4 * {mu} * (CAST(s3 AS DOUBLE) / n)"
        f" + 6 * {mu} * {mu} * (CAST(s2 AS DOUBLE) / n)"
        f" - 3 * {mu} * {mu} * {mu} * {mu})"
    )
    return m.select(
        "event_type",
        "n",
        F.expr("s1 div n").alias("mean_dollars"),
        F.expr(f"CAST(floor({m2} * 1000) AS BIGINT)").alias("var_e3"),
        F.expr(
            f"CAST(floor({m3} / pow({m2}, 1.5) * 1000000) AS BIGINT)"
        ).alias("skew_ppm"),
        F.expr(
            f"CAST(floor(({m4} / ({m2} * {m2}) - 3) * 1000000)"
            " AS BIGINT)"
        ).alias("excess_kurtosis_ppm"),
    ).orderBy("event_type")


# --------------------------- hapax profile by source

# Corpus-health staple: per source, the share of vocabulary seen
# exactly once (hapax legomena) and the type-token ratio — generated
# and templated text collapse both numbers, so they screen synthetic
# or boilerplate-heavy sources.  Token counting reuses the
# whitespace convention; everything is vocabulary-keyed aggregation
# with exact ppm ratios.
@register(
    "text_hapax_by_source",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tf AS (
      SELECT source, w, COUNT(*) AS f
      FROM tok WHERE w <> '' GROUP BY source, w
    )
    SELECT source,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           COUNT(*) * 1000000 // CAST(SUM(f) AS BIGINT)
             AS type_token_ppm,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // COUNT(*) AS hapax_share_ppm
    FROM tf
    GROUP BY source
    ORDER BY source
    """,
)
def text_hapax_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax share and type-token ratio: one token
    explode, (source, word) frequency table, exact ppm ratios."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    tf = (
        tok.where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.sum("f").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias(
                "n_hapax"
            ),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("n_types * 1000000 div n_tokens").alias(
                "type_token_ppm"
            ),
            F.expr("n_hapax * 1000000 div n_types").alias(
                "hapax_share_ppm"
            ),
        )
        .orderBy("source")
    )


# --------------------------- price-quantity dependence grid

# The copula-style dependence picture behind the single chi² number:
# unit price and quantity each cut into positional quintiles, the
# 5x5 cell counts, and each cell's lift vs independence in exact ppm
# — WHERE the dependence lives, not just whether it exists
# (discount_tax_independence's granular sibling).  Quintile
# boundaries are positional ranks (ntile), so every value lands
# deterministically; lift cross-multiplies row/col margins.
@register(
    "price_qty_dependence_grid",
    """
    WITH pts AS (
      SELECT CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)
               AS price_cents,
             CAST(l_quantity AS BIGINT) AS qty,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    binned AS (
      SELECT NTILE(5) OVER (ORDER BY price_cents, l_orderkey,
                            l_linenumber) AS price_q,
             NTILE(5) OVER (ORDER BY qty, l_orderkey, l_linenumber)
               AS qty_q
      FROM pts
    ),
    cells AS (
      SELECT price_q, qty_q, COUNT(*) AS o
      FROM binned GROUP BY 1, 2
    ),
    mr AS (SELECT price_q, CAST(SUM(o) AS BIGINT) AS r FROM cells
           GROUP BY price_q),
    mc AS (SELECT qty_q, CAST(SUM(o) AS BIGINT) AS c FROM cells
           GROUP BY qty_q),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
    SELECT ce.price_q, ce.qty_q, ce.o AS n_lines,
           ce.o * n.n * 1000000 // (mr.r * mc.c) AS lift_ppm
    FROM cells ce
    JOIN mr ON ce.price_q = mr.price_q
    JOIN mc ON ce.qty_q = mc.qty_q
    CROSS JOIN n
    ORDER BY ce.price_q, ce.qty_q
    """,
)
def price_qty_dependence_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5x5 positional-quintile grid of (unit price, quantity) with
    exact independence-lift ppm per cell; ntile tie-broken on the
    line identity so binning is deterministic."""
    from pyspark.sql import Window

    pts = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)"
        ).alias("price_cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    binned = pts.select(
        F.ntile(5)
        .over(Window.orderBy("price_cents", "l_orderkey", "l_linenumber"))
        .alias("price_q"),
        F.ntile(5)
        .over(Window.orderBy("qty", "l_orderkey", "l_linenumber"))
        .alias("qty_q"),
    )
    cells = binned.groupBy("price_q", "qty_q").agg(
        F.count(F.lit(1)).alias("o")
    )
    mr = cells.groupBy("price_q").agg(F.sum("o").alias("r"))
    mc = cells.groupBy("qty_q").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    return (
        cells.join(F.broadcast(mr), "price_q")
        .join(F.broadcast(mc), "qty_q")
        .crossJoin(F.broadcast(n))
        .select(
            "price_q",
            "qty_q",
            F.col("o").alias("n_lines"),
            F.expr("o * n * 1000000 div (r * c)").alias("lift_ppm"),
        )
        .orderBy("price_q", "qty_q")
    )


# --------------------------- per-customer value trend

# Thousands of tiny regressions in one pass: each customer's OLS
# slope of order value (cents) against order sequence number — the
# improving/declining/flat lifecycle classifier.  Slope numerator/
# denominator stay EXACT integers (sequence index is small, cents
# bounded), so the trend class is division-free; slope_e3 is the one
# double at the end.  This is per-entity regression at fact scale:
# the shuffle is customer-keyed, every group is a few rows, nothing
# collects anywhere.
@register(
    "customer_value_trend",
    """
    WITH seq AS (
      SELECT o_custkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)
               AS BIGINT) AS t,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    m AS (
      SELECT o_custkey, COUNT(*) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(cents) AS BIGINT) AS sc,
             CAST(SUM(t * cents) AS BIGINT) AS stc,
             CAST(SUM(t * t) AS BIGINT) AS stt
      FROM seq GROUP BY o_custkey
    ),
    fit AS (
      SELECT o_custkey AS c_custkey, n,
             n * stc - st * sc AS num,
             n * stt - st * st AS den
      FROM m WHERE n >= 3
    )
    SELECT CASE WHEN 10 * num > den * 100 THEN 'improving'
                WHEN 10 * num < -den * 100 THEN 'declining'
                ELSE 'flat' END AS trend,
           COUNT(*) AS n_customers,
           CAST(SUM(n) AS BIGINT) AS n_orders
    FROM fit
    GROUP BY 1
    ORDER BY 1
    """,
)
def customer_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer OLS slope of order value vs sequence number from
    exact integer sums (n·Σtc − ΣtΣc over n·Σt² − (Σt)²), classified
    improving/declining/flat by division-free cross-multiplication
    (|slope| > 10 cents/order), rolled up to class counts."""
    from pyspark.sql import Window

    seq = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .cast("long")
        .alias("t"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    m = seq.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("cents").alias("sc"),
        F.sum(F.col("t") * F.col("cents")).alias("stc"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    fit = m.where(F.col("n") >= 3).select(
        "n",
        (F.col("n") * F.col("stc") - F.col("st") * F.col("sc")).alias(
            "num"
        ),
        (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).alias(
            "den"
        ),
    )
    return (
        fit.select(
            F.expr(
                "CASE WHEN 10 * num > den * 100 THEN 'improving'"
                " WHEN 10 * num < -den * 100 THEN 'declining'"
                " ELSE 'flat' END"
            ).alias("trend"),
            "n",
        )
        .groupBy("trend")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n").alias("n_orders"),
        )
        .orderBy("trend")
    )


# --------------------------- shingle-width sensitivity sweep

# The other dedup tuning dial: how does shingle WIDTH (2/3/4-gram)
# change the blocking universe?  Per width: distinct shingles,
# average shingles per doc, and the share of shingles shared by >= 2
# docs (the collision mass that drives candidate generation) — the
# companion to dedup_lsh_tuning_curve's band sweep.  Each width is
# one explode + two vocabulary-keyed aggregates; widths union into
# one 3-row table.
DEDUP_SWEEP_WIDTHS = (2, 3, 4)


def _shingle_sweep_oracle() -> str:
    parts = []
    for w in DEDUP_SWEEP_WIDTHS:
        parts.append(f"""
    SELECT {w} AS width,
           COUNT(*) AS n_distinct_shingles,
           CAST(SUM(nd) AS BIGINT) AS n_doc_shingle_pairs,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // COUNT(*) AS shared_shingle_ppm
    FROM (
      SELECT shingle, COUNT(DISTINCT doc_id) AS nd
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - {w - 1}),
                 i -> array_to_string(toks[i:i+{w - 1}], ' ')))
                 AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
        WHERE len(toks) >= {w}
      ) GROUP BY shingle
    )""")
    return " UNION ALL ".join(parts) + " ORDER BY width"


@register("dedup_shingle_width_sweep", _shingle_sweep_oracle())
def dedup_shingle_width_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-universe stats at shingle widths 2/3/4: distinct
    shingles, doc-shingle pairs, and the >=2-doc collision share ppm
    (DuckDB's 1-based inclusive slice toks[i:i+w-1] == Spark's
    slice(toks, i, w))."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    out = None
    for w in DEDUP_SWEEP_WIDTHS:
        sh = docs.where(F.size("toks") >= w).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f" sequence(1, size(toks) - {w - 1}),"
                    f" i -> concat_ws(' ', slice(toks, i, {w}))))"
                )
            ).alias("shingle"),
        )
        per = sh.groupBy("shingle").agg(
            F.countDistinct("doc_id").alias("nd")
        )
        row = per.agg(
            F.lit(w).cast("long").alias("width"),
            F.count(F.lit(1)).alias("n_distinct_shingles"),
            F.sum("nd").alias("n_doc_shingle_pairs"),
            F.expr(
                "CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)"
                " AS BIGINT) * 1000000 div COUNT(*)"
            ).alias("shared_shingle_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("width")


# --------------------------- circadian phase profile

# Behavioral clock segmentation: each user's peak activity hour
# (argmax with earliest-hour tie-break), rolled into the 24-hour
# distribution of peak hours with share ppm — night-owl vs nine-to-
# five cohorts for send-time optimization.  One (user, hour) rollup,
# one per-user argmax window, one 24-row rollup.
@register(
    "user_peak_hour_profile",
    """
    WITH uh AS (
      SELECT user_id, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    peak AS (
      SELECT user_id, hr FROM (
        SELECT user_id, hr,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, hr) AS rn
        FROM uh
      ) WHERE rn = 1
    ),
    dist AS (
      SELECT hr AS peak_hour, COUNT(*) AS n_users FROM peak GROUP BY hr
    ),
    t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tot FROM dist)
    SELECT d.peak_hour, d.n_users,
           d.n_users * 1000000 // t.tot AS share_ppm
    FROM dist d CROSS JOIN t
    ORDER BY d.peak_hour
    """,
)
def user_peak_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user peak activity hours (tie-broken
    argmax window), exact share ppm."""
    from pyspark.sql import Window

    uh = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.hour("ts").cast("long").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    peak = (
        uh.select(
            "user_id",
            "hr",
            F.row_number()
            .over(
                Window.partitionBy("user_id").orderBy(
                    F.col("n").desc(), "hr"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
    )
    dist = peak.groupBy(F.col("hr").alias("peak_hour")).agg(
        F.count(F.lit(1)).alias("n_users")
    )
    t = dist.agg(F.sum("n_users").alias("tot"))
    return (
        dist.crossJoin(F.broadcast(t))
        .select(
            "peak_hour",
            "n_users",
            F.expr("n_users * 1000000 div tot").alias("share_ppm"),
        )
        .orderBy("peak_hour")
    )


# --------------------------- term burstiness

# Church–Gale burstiness for the top document-frequency terms: a
# bursty term clumps into few documents (dispersion of per-doc count
# >> 1), a function word spreads evenly — the statistic separating
# topical from structural vocabulary.  Per term: DF, total count,
# exact dispersion (n·Σc² − (Σc)²)/((n−1)·Σc) over DOCUMENTS
# CONTAINING the term, in ppm.  Top-20 by DF, fully tie-broken.
TERM_BURST_TOPK = 20


@register(
    "text_term_burstiness",
    f"""
    WITH tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY doc_id, w
    ),
    term AS (
      SELECT w, COUNT(*) AS df,
             CAST(SUM(c) AS BIGINT) AS tot,
             CAST(SUM(c * c) AS BIGINT) AS tot2
      FROM tf GROUP BY w
    ),
    top AS (
      SELECT w, df, tot, tot2,
             ROW_NUMBER() OVER (ORDER BY df DESC, w) AS rn
      FROM term
    )
    SELECT w AS term, df, tot AS n_occurrences,
           CASE WHEN df >= 2 THEN
             (df * tot2 - tot * tot) * 1000000 // ((df - 1) * tot)
           END AS dispersion_ppm
    FROM top WHERE rn <= {TERM_BURST_TOPK}
    ORDER BY df DESC, term
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 DF terms with exact per-doc-count dispersion ppm
    (the single-ratio index over containing docs); burstiness
    separates topical from structural vocabulary."""
    from pyspark.sql import Window

    tf = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term = tf.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("tot"),
        F.sum(F.col("c") * F.col("c")).alias("tot2"),
    )
    top = term.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("df").desc(), "w"))
        .alias("rn"),
    ).where(F.col("rn") <= TERM_BURST_TOPK)
    return top.select(
        F.col("w").alias("term"),
        "df",
        F.col("tot").alias("n_occurrences"),
        F.when(
            F.col("df") >= 2,
            F.expr(
                "(df * tot2 - tot * tot) * 1000000"
                " div ((df - 1) * tot)"
            ),
        ).alias("dispersion_ppm"),
    ).orderBy(F.col("df").desc(), "term")


# --------------------------- temporal integrity audit

# Cross-table TEMPORAL referential integrity: a line item cannot ship
# before its order was placed.  Violations counted per order month
# with exact incidence ppm and the worst (most-negative-lag) case —
# the temporal sibling of ri_orphans' key-space check.  One fact join
# (order date rides to the line via the orderkey shuffle), one month
# rollup; lag arithmetic in integer days.
@register(
    "temporal_integrity_audit",
    """
    WITH j AS (
      SELECT date_trunc('month', CAST(o.o_orderdate AS DATE)) AS month,
             CAST(l.l_shipdate AS DATE)
               - CAST(o.o_orderdate AS DATE) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT month,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_violations,
           CAST(SUM(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // COUNT(*) AS violation_ppm,
           CAST(MIN(lag_days) AS BIGINT) AS worst_lag_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag_days
    FROM j
    GROUP BY month
    ORDER BY month
    """,
)
def temporal_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship-before-order violations per order month: one orderkey
    join, integer day lags, exact ppm incidence + worst/max lag."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    j = li.join(o, "l_orderkey").select(
        F.date_trunc("month", "odate").cast("date").alias("month"),
        F.datediff("ship", "odate").cast("long").alias("lag_days"),
    )
    return (
        j.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("lag_days") < 0, 1).otherwise(0)
            ).alias("n_violations"),
            F.min("lag_days").alias("worst_lag_days"),
            F.max("lag_days").alias("max_lag_days"),
        )
        .select(
            "month",
            "n_lines",
            "n_violations",
            F.expr(
                "n_violations * 1000000 div n_lines"
            ).alias("violation_ppm"),
            "worst_lag_days",
            "max_lag_days",
        )
        .orderBy("month")
    )


# --------------------------- weekend two-sample z-test

# Do weekend orders differ in value?  Two-sample z from exact
# integer moments of weekday vs weekend order cents (one conditional
# pass), z in e3 against the frozen 1.96 critical value —
# completing the testing family's two-sample mean comparison
# (chi2 tests compare distributions, CUPED adjusts, this one tests).
@register(
    "weekend_value_ztest",
    """
    WITH o AS (
      SELECT CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS wk,
             CAST(floor(o_totalprice) AS BIGINT) AS x
      FROM orders
    ),
    m AS (
      SELECT
        CAST(SUM(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN wk = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN wk = 1 THEN x * x ELSE 0 END) AS BIGINT)
          AS q1,
        CAST(SUM(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN wk = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN wk = 0 THEN x * x ELSE 0 END) AS BIGINT)
          AS q0
      FROM o
    )
    SELECT n1 AS n_weekend, n0 AS n_weekday,
           s1 // n1 AS mean_weekend_dollars,
           s0 // n0 AS mean_weekday_dollars,
           CAST(floor(
             (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
             / sqrt(
                 (CAST(q1 AS DOUBLE) / n1
                  - (CAST(s1 AS DOUBLE) / n1)
                    * (CAST(s1 AS DOUBLE) / n1)) / n1
                 + (CAST(q0 AS DOUBLE) / n0
                    - (CAST(s0 AS DOUBLE) / n0)
                      * (CAST(s0 AS DOUBLE) / n0)) / n0)
             * 1000) AS BIGINT) AS z_e3,
           CASE WHEN ABS(
             (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
             / sqrt(
                 (CAST(q1 AS DOUBLE) / n1
                  - (CAST(s1 AS DOUBLE) / n1)
                    * (CAST(s1 AS DOUBLE) / n1)) / n1
                 + (CAST(q0 AS DOUBLE) / n0
                    - (CAST(s0 AS DOUBLE) / n0)
                      * (CAST(s0 AS DOUBLE) / n0)) / n0))
             > 1.959964 THEN 1 ELSE 0 END AS significant
    FROM m
    """,
)
def weekend_value_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z on weekend-vs-weekday order value from one
    conditional-moment pass (exact integers in, deterministic double
    formula out, frozen 1.96 critical value).  DuckDB dayofweek is
    0=Sunday vs Spark 1=Sunday — the Spark side subtracts 1."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(
            (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).isin(0, 6),
            1,
        )
        .otherwise(0)
        .alias("wk"),
        F.expr("CAST(floor(o_totalprice) AS BIGINT)").alias("x"),
    )
    m = o.agg(
        F.sum(F.when(F.col("wk") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("wk") == 1, F.col("x")).otherwise(0)).alias(
            "s1"
        ),
        F.sum(
            F.when(F.col("wk") == 1, F.col("x") * F.col("x")).otherwise(0)
        ).alias("q1"),
        F.sum(F.when(F.col("wk") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("wk") == 0, F.col("x")).otherwise(0)).alias(
            "s0"
        ),
        F.sum(
            F.when(F.col("wk") == 0, F.col("x") * F.col("x")).otherwise(0)
        ).alias("q0"),
    )
    zexpr = (
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)"
        " / sqrt((CAST(q1 AS DOUBLE) / n1"
        "         - (CAST(s1 AS DOUBLE) / n1)"
        "           * (CAST(s1 AS DOUBLE) / n1)) / n1"
        "        + (CAST(q0 AS DOUBLE) / n0"
        "           - (CAST(s0 AS DOUBLE) / n0)"
        "             * (CAST(s0 AS DOUBLE) / n0)) / n0)"
    )
    return m.select(
        F.col("n1").alias("n_weekend"),
        F.col("n0").alias("n_weekday"),
        F.expr("s1 div n1").alias("mean_weekend_dollars"),
        F.expr("s0 div n0").alias("mean_weekday_dollars"),
        F.expr(f"CAST(floor(({zexpr}) * 1000) AS BIGINT)").alias("z_e3"),
        F.expr(
            f"CASE WHEN ABS({zexpr}) > 1.959964 THEN 1 ELSE 0 END"
        ).alias("significant"),
    )


# --------------------------- demand persistence screen

# Which parts have PERSISTENT week-over-week demand?  Per part: the
# lag-1 autocorrelation of WEEKLY demand (revenue_acf's exact
# deviation recipe keyed per part over adjacent demand weeks),
# classified persistent when r > 0.3 — the screen that routes parts
# to momentum-aware forecasts.  Daily alignment is too sparse on
# this data (zero lag-7 day pairs); weekly lag-1 keeps ~100 parts in
# scope at sf0.1 while the recipe stays identical.
@register(
    "part_demand_persistence_screen",
    """
    WITH weekly AS (
      SELECT l_partkey,
             (CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.l_partkey, a.q AS x, b.q AS y
      FROM weekly a
      JOIN weekly b ON b.l_partkey = a.l_partkey
                   AND b.wk = a.wk + 1
    ),
    m AS (
      SELECT l_partkey, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) // COUNT(*) AS mx,
             CAST(SUM(y) AS BIGINT) // COUNT(*) AS my
      FROM pairs GROUP BY l_partkey HAVING COUNT(*) >= 8
    ),
    r AS (
      SELECT p.l_partkey, m.n,
             CAST(SUM((p.x - m.mx) * (p.y - m.my)) AS BIGINT) AS sxy,
             CAST(SUM((p.x - m.mx) * (p.x - m.mx)) AS BIGINT) AS sxx,
             CAST(SUM((p.y - m.my) * (p.y - m.my)) AS BIGINT) AS syy
      FROM pairs p JOIN m ON p.l_partkey = m.l_partkey
      GROUP BY p.l_partkey, m.n
    ),
    scored AS (
      SELECT l_partkey, n,
             CAST(floor(CAST(sxy AS DOUBLE) * 1000000
               / (sqrt(CAST(sxx AS DOUBLE))
                  * sqrt(CAST(syy AS DOUBLE)))) AS BIGINT) AS r1w_ppm
      FROM r WHERE sxx > 0 AND syy > 0
    )
    SELECT l_partkey AS p_partkey, n AS n_pairs, r1w_ppm,
           CASE WHEN r1w_ppm > 300000 THEN 1 ELSE 0 END
             AS is_persistent
    FROM scored
    ORDER BY r1w_ppm DESC, p_partkey
    LIMIT 10
    """,
)
def part_demand_persistence_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-10 parts by week-over-week demand autocorrelation
    (per-part exact deviation sums over adjacent weeks, final sqrt),
    with the >0.3 persistence flag."""
    weekly = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            F.expr(
                "datediff(CAST(l_shipdate AS DATE),"
                " DATE '1970-01-01') div 7"
            ).alias("wk"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
        .localCheckpoint(eager=False)  # both join sides
    )
    a = weekly.select("l_partkey", "wk", F.col("q").alias("x"))
    b = weekly.select(
        "l_partkey", (F.col("wk") - 1).alias("wk"), F.col("q").alias("y")
    )
    pairs = a.join(b, ["l_partkey", "wk"]).select("l_partkey", "x", "y")
    m = (
        pairs.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(x) AS BIGINT) div COUNT(*)").alias("mx"),
            F.expr("CAST(SUM(y) AS BIGINT) div COUNT(*)").alias("my"),
        )
        .where(F.col("n") >= 8)
    )
    r = (
        pairs.join(m, "l_partkey")
        .groupBy("l_partkey", "n")
        .agg(
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            .alias("sxy"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
            .alias("sxx"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .alias("syy"),
        )
    )
    scored = r.where((F.col("sxx") > 0) & (F.col("syy") > 0)).select(
        "l_partkey",
        "n",
        F.expr(
            "CAST(floor(CAST(sxy AS DOUBLE) * 1000000"
            " / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))))"
            " AS BIGINT)"
        ).alias("r1w_ppm"),
    )
    return (
        scored.select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("n").alias("n_pairs"),
            "r1w_ppm",
            F.expr(
                "CASE WHEN r1w_ppm > 300000 THEN 1 ELSE 0 END"
            ).alias("is_persistent"),
        )
        .orderBy(F.col("r1w_ppm").desc(), "p_partkey")
        .limit(10)
    )


# --------------------------- assortment gap grid

# Assortment planning: the brand x size grid of offered parts, each
# brand's fill rate (share of sizes it covers), and the emptiest
# brands — where the catalog has holes competitors can occupy.  Both
# axes are vocabulary-sized; the full grid is |brands| x |sizes|
# (aggregate-reduced), so the only fact-sized work is the distinct
# (brand, size) projection.
@register(
    "assortment_gap_grid",
    """
    WITH cells AS (
      SELECT DISTINCT p_brand, p_size FROM part
    ),
    sizes AS (SELECT DISTINCT p_size FROM part),
    brands AS (
      SELECT p_brand, COUNT(*) AS n_covered
      FROM cells GROUP BY p_brand
    ),
    t AS (SELECT COUNT(*) AS n_sizes FROM sizes)
    SELECT b.p_brand, b.n_covered, t.n_sizes,
           b.n_covered * 1000000 // t.n_sizes AS fill_ppm
    FROM brands b CROSS JOIN t
    ORDER BY fill_ppm, b.p_brand
    """,
)
def assortment_gap_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand size-coverage fill rate (distinct (brand, size)
    projection, 1-row size-count broadcast), emptiest brands
    first."""
    part = load_table(spark, sf_dir, "part")
    cells = part.select("p_brand", "p_size").distinct()
    t = part.select("p_size").distinct().agg(
        F.count(F.lit(1)).alias("n_sizes")
    )
    brands = cells.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_covered")
    )
    return (
        brands.crossJoin(F.broadcast(t))
        .select(
            "p_brand",
            "n_covered",
            "n_sizes",
            F.expr("n_covered * 1000000 div n_sizes").alias("fill_ppm"),
        )
        .orderBy("fill_ppm", "p_brand")
    )


# --------------------------- cross-source duplication rate

# Mirror detection: how much near-duplication crosses SOURCE
# boundaries?  Per dup cluster: distinct sources; the rollup reports
# within-source vs cross-source cluster counts and the cross-source
# share ppm — high cross-source duplication means mirrored/scraped
# content that per-source dedup would miss entirely (the argument
# for GLOBAL dedup at 100 TB).  Rides the star-contraction
# components; only cluster members join to the source column.
@register(
    "dedup_cross_source_rate",
    _SHINGLE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION SELECT doc_b, doc_a FROM cand
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clusters AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    per AS (
      SELECT c.cluster_id,
             COUNT(*) AS n_members,
             COUNT(DISTINCT d.source) AS n_sources
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
      GROUP BY c.cluster_id
    )
    SELECT COUNT(*) AS n_clusters,
           CAST(SUM(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_cross_source,
           CAST(SUM(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // COUNT(*) AS cross_source_ppm,
           CAST(MAX(n_sources) AS BIGINT) AS max_sources_in_cluster,
           CAST(MAX(n_members) AS BIGINT) AS max_cluster_size
    FROM per
    """,
)
def dedup_cross_source_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of dup clusters spanning >= 2 sources: components from
    star contraction, one member->source join, single-row verdict —
    the measured case for global (not per-source) dedup."""
    from data_pipeline_for_e_commerce_shop_spark.operators.dedup import (
        duplicate_clusters,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    clusters = duplicate_clusters(spark, sf_dir)
    per = (
        clusters.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("source").alias("n_sources"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.when(F.col("n_sources") >= 2, 1).otherwise(0)).alias(
            "n_cross_source"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END)"
            " AS BIGINT) * 1000000 div COUNT(*)"
        ).alias("cross_source_ppm"),
        F.max("n_sources").alias("max_sources_in_cluster"),
        F.max("n_members").alias("max_cluster_size"),
    )


# --------------------------- procurement savings counterfactual

# "What if every part were bought at its cheapest supplier's unit
# price?"  Per category: actual spend vs the counterfactual
# (quantity x cheapest observed unit price per part), potential
# savings in exact cents and ppm — the number that prioritizes the
# price_consistency worklist.  Cheapest unit price per part by
# tie-broken window; counterfactual re-join is part-keyed.
@register(
    "procurement_savings_potential",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS spend_cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    cheapest AS (
      SELECT l_partkey, unit_cents FROM (
        SELECT l_partkey, spend_cents // qty AS unit_cents,
               ROW_NUMBER() OVER (PARTITION BY l_partkey
                 ORDER BY spend_cents // qty, l_suppkey) AS rn
        FROM ps
      ) WHERE rn = 1
    ),
    per_part AS (
      SELECT p.l_partkey,
             CAST(SUM(p.spend_cents) AS BIGINT) AS spend_cents,
             CAST(SUM(p.qty) AS BIGINT) * c.unit_cents
               AS counterfactual_cents
      FROM ps p JOIN cheapest c ON p.l_partkey = c.l_partkey
      GROUP BY p.l_partkey, c.unit_cents
    )
    SELECT pa.p_type AS category,
           CAST(SUM(pp.spend_cents) AS BIGINT) AS spend_cents,
           CAST(SUM(pp.counterfactual_cents) AS BIGINT)
             AS counterfactual_cents,
           CAST(SUM(pp.spend_cents - pp.counterfactual_cents)
             AS BIGINT) AS savings_cents,
           CAST(SUM(pp.spend_cents - pp.counterfactual_cents)
             AS BIGINT) * 1000000
             // CAST(SUM(pp.spend_cents) AS BIGINT) AS savings_ppm
    FROM per_part pp JOIN part pa ON pp.l_partkey = pa.p_partkey
    GROUP BY pa.p_type
    ORDER BY category
    """,
)
def procurement_savings_potential(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Category-level savings if every part bought at its cheapest
    supplier's floored unit price: per-(part, supplier) spend/qty,
    tie-broken cheapest pick, part-keyed counterfactual join,
    broadcast dim rollup, exact cents/ppm."""
    from pyspark.sql import Window

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("spend_cents"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
        .localCheckpoint(eager=False)  # feeds cheapest + rollup
    )
    cheapest = (
        ps.select(
            "l_partkey",
            F.expr("spend_cents div qty").alias("unit_cents"),
            F.row_number()
            .over(
                Window.partitionBy("l_partkey").orderBy(
                    F.expr("spend_cents div qty"), "l_suppkey"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("l_partkey", "unit_cents")
    )
    per_part = (
        ps.join(cheapest, "l_partkey")
        .groupBy("l_partkey", "unit_cents")
        .agg(
            F.sum("spend_cents").alias("spend_cents"),
            F.sum("qty").alias("qty"),
        )
        .select(
            "l_partkey",
            "spend_cents",
            (F.col("qty") * F.col("unit_cents")).alias(
                "counterfactual_cents"
            ),
        )
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    return (
        per_part.join(F.broadcast(part), "l_partkey")
        .groupBy("category")
        .agg(
            F.sum("spend_cents").alias("spend_cents"),
            F.sum("counterfactual_cents").alias("counterfactual_cents"),
        )
        .select(
            "category",
            "spend_cents",
            "counterfactual_cents",
            (F.col("spend_cents") - F.col("counterfactual_cents")).alias(
                "savings_cents"
            ),
            F.expr(
                "(spend_cents - counterfactual_cents) * 1000000"
                " div spend_cents"
            ).alias("savings_ppm"),
        )
        .orderBy("category")
    )


# --------------------------- length-quality dependence grid

# Does the quality score just proxy for length?  The confound check
# for every length-independent quality gate: documents cut into
# positional quintiles of n_chars and of the canonical quality score
# (identical formula to text_quality), 5x5 counts with independence
# lift ppm.  High diagonal lift = the gate is secretly a length
# filter.  Same recipe as price_qty_dependence_grid, aimed at the
# corpus.
@register(
    "doc_length_quality_grid",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             length(text) AS n_chars
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_chars,
             ((len(list_distinct(toks)) / len(toks)) * 0.5 +
              (len(list_filter(toks,
                 x -> list_contains(['the','a','and','of','to'], x)))
               / len(toks)) * 0.25 + 0.25) AS q
      FROM t
    ),
    binned AS (
      SELECT NTILE(5) OVER (ORDER BY n_chars, doc_id) AS len_q,
             NTILE(5) OVER (ORDER BY q, doc_id) AS qual_q
      FROM scored
    ),
    cells AS (
      SELECT len_q, qual_q, COUNT(*) AS o FROM binned GROUP BY 1, 2
    ),
    mr AS (SELECT len_q, CAST(SUM(o) AS BIGINT) AS r FROM cells
           GROUP BY len_q),
    mc AS (SELECT qual_q, CAST(SUM(o) AS BIGINT) AS c FROM cells
           GROUP BY qual_q),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
    SELECT ce.len_q, ce.qual_q, ce.o AS n_docs,
           ce.o * n.n * 1000000 // (mr.r * mc.c) AS lift_ppm
    FROM cells ce
    JOIN mr ON ce.len_q = mr.len_q
    JOIN mc ON ce.qual_q = mc.qual_q
    CROSS JOIN n
    ORDER BY ce.len_q, ce.qual_q
    """,
)
def doc_length_quality_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5x5 (length, quality) positional-quintile grid with exact
    independence lift — the length-confound audit for quality
    gates."""
    from pyspark.sql import Window

    t = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.length("text").alias("n_chars"),
    )
    scored = t.select(
        "doc_id",
        "n_chars",
        F.expr(
            "(size(array_distinct(toks)) / size(toks)) * 0.5 +"
            " (size(filter(toks, x -> array_contains("
            " array('the','a','and','of','to'), x))) / size(toks))"
            " * 0.25 + 0.25"
        ).alias("q"),
    )
    binned = scored.select(
        F.ntile(5)
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("len_q"),
        F.ntile(5).over(Window.orderBy("q", "doc_id")).alias("qual_q"),
    )
    cells = binned.groupBy("len_q", "qual_q").agg(
        F.count(F.lit(1)).alias("o")
    )
    mr = cells.groupBy("len_q").agg(F.sum("o").alias("r"))
    mc = cells.groupBy("qual_q").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    return (
        cells.join(F.broadcast(mr), "len_q")
        .join(F.broadcast(mc), "qual_q")
        .crossJoin(F.broadcast(n))
        .select(
            "len_q",
            "qual_q",
            F.col("o").alias("n_docs"),
            F.expr("o * n * 1000000 div (r * c)").alias("lift_ppm"),
        )
        .orderBy("len_q", "qual_q")
    )


# --------------------------- balance-vs-spend mismatch

# Credit-risk screen: customers whose ACCOUNT BALANCE decile and
# actual SPEND decile disagree most — low balance + high spend is
# exposure, high balance + no spend is dormant capital.  Both decile
# axes are positional (ntile over exact cents, tie-broken by key);
# output the top-20 largest |mismatch| with full tie-break.
BALMISMATCH_TOPK = 20


@register(
    "balance_spend_mismatch",
    f"""
    WITH spend AS (
      SELECT c.c_custkey,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
             COALESCE(CAST(SUM(CAST(floor(o.o_totalprice * 100)
               AS BIGINT)) AS BIGINT), 0) AS spend_cents
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ),
    deciled AS (
      SELECT c_custkey, bal_cents, spend_cents,
             NTILE(10) OVER (ORDER BY bal_cents, c_custkey) AS bal_d,
             NTILE(10) OVER (ORDER BY spend_cents, c_custkey)
               AS spend_d
      FROM spend
    )
    SELECT c_custkey, bal_cents, spend_cents, bal_d, spend_d,
           spend_d - bal_d AS mismatch
    FROM deciled
    ORDER BY ABS(spend_d - bal_d) DESC, c_custkey
    LIMIT {BALMISMATCH_TOPK}
    """,
)
def balance_spend_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 largest balance-decile vs spend-decile disagreements
    (positional ntiles over exact cents, key tie-broken)."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias(
            "bal_cents"
        ),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    spend = (
        cust.join(orders, "c_custkey", "left")
        .groupBy("c_custkey", "bal_cents")
        .agg(
            F.coalesce(F.sum("cents"), F.lit(0).cast("long")).alias(
                "spend_cents"
            )
        )
    )
    deciled = spend.select(
        "c_custkey",
        "bal_cents",
        "spend_cents",
        F.ntile(10)
        .over(Window.orderBy("bal_cents", "c_custkey"))
        .alias("bal_d"),
        F.ntile(10)
        .over(Window.orderBy("spend_cents", "c_custkey"))
        .alias("spend_d"),
    )
    return (
        deciled.select(
            "*", (F.col("spend_d") - F.col("bal_d")).alias("mismatch")
        )
        .orderBy(F.abs(F.col("mismatch")).desc(), "c_custkey")
        .limit(BALMISMATCH_TOPK)
    )


# --------------------------- nonparametric time-series randomness

# Wald-Wolfowitz runs test: is the sequence of daily revenues above/
# below the overall mean RANDOM, or does it cluster (momentum /
# regime-switching)?  Above-mean is decided by exact integer
# cross-multiplication (cents * n_days > total_cents; ties count as
# below), the run count is an exact integer from a lag window, and
# only the final z rides deterministic doubles (weekend_value_ztest
# precedent, frozen 1.96 critical value).
@register(
    "revenue_runs_test",
    """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM daily
    ),
    signed AS (
      SELECT d, CASE WHEN cents * n > s THEN 1 ELSE 0 END AS above
      FROM daily CROSS JOIN tot
    ),
    runs AS (
      SELECT above,
             CASE WHEN LAG(above) OVER (ORDER BY d) IS NULL
                    OR LAG(above) OVER (ORDER BY d) <> above
                  THEN 1 ELSE 0 END AS brk
      FROM signed
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(above) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(above) AS BIGINT) AS n0,
             CAST(SUM(brk) AS BIGINT) AS r
      FROM runs
    )
    SELECT n AS n_days, n1 AS n_above, n0 AS n_below, r AS n_runs,
           CAST(floor((1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n) * 1000) AS BIGINT)
             AS expected_runs_e3,
           CAST(floor(
             (r - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n))
             / sqrt((2.0 * CAST(n1 AS DOUBLE) * n0 * (2.0 * CAST(n1 AS DOUBLE) * n0 - n))
                    / (CAST(n AS DOUBLE) * n * (n - 1))) * 1000) AS BIGINT)
             AS z_e3,
           CASE WHEN ABS(
             (r - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n))
             / sqrt((2.0 * CAST(n1 AS DOUBLE) * n0 * (2.0 * CAST(n1 AS DOUBLE) * n0 - n))
                    / (CAST(n AS DOUBLE) * n * (n - 1)))) > 1.959964
                THEN 1 ELSE 0 END AS nonrandom
    FROM m
    """,
)
def revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test on the daily-revenue sign sequence.  Plan: one
    daily groupBy, a 1-row totals crossJoin (scalar-subquery shape),
    one lag window over the ~2.5k-row daily series (post-aggregation,
    size-bounded — same single-partition contract as revenue_acf),
    one global fold."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    signed = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        F.when(F.col("cents") * F.col("n") > F.col("s"), 1)
        .otherwise(0)
        .alias("above"),
    )
    lagged = signed.select(
        "above",
        F.when(
            F.lag("above").over(Window.orderBy("d")).isNull()
            | (F.lag("above").over(Window.orderBy("d")) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    m = lagged.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("above").cast("long").alias("n1"),
        (F.count("*") - F.sum("above")).cast("long").alias("n0"),
        F.sum("brk").cast("long").alias("r"),
    )
    zexpr = (
        "(r - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n))"
        " / sqrt((2.0 * CAST(n1 AS DOUBLE) * n0 * (2.0 * CAST(n1 AS DOUBLE) * n0 - n))"
        "        / (CAST(n AS DOUBLE) * n * (n - 1)))"
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.col("n1").alias("n_above"),
        F.col("n0").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.expr(
            "CAST(floor((1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n) * 1000) AS BIGINT)"
        ).alias("expected_runs_e3"),
        F.expr(f"CAST(floor(({zexpr}) * 1000) AS BIGINT)").alias("z_e3"),
        F.expr(
            f"CASE WHEN ABS({zexpr}) > 1.959964 THEN 1 ELSE 0 END"
        ).alias("nonrandom"),
    )


# --------------------------- Mann-Kendall monotonic-trend screen

# Which brands have a STATISTICALLY MONOTONIC revenue trend?  The
# Mann-Kendall S statistic is a pure integer (sum of pairwise revenue
# sign comparisons across months), its tie-corrected variance is the
# integer var18/18, and the continuity-corrected z decides the +1/0/-1
# trend flag — the nonparametric complement to revenue_trend_robust's
# Theil-Sen slope (this screens SIGNIFICANCE, that estimates
# magnitude).
@register(
    "brand_mann_kendall",
    """
    WITH monthly AS (
      SELECT p_brand,
             DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS mo,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.p_brand,
             CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s
      FROM monthly a
      JOIN monthly b ON b.p_brand = a.p_brand AND b.mo > a.mo
      GROUP BY 1
    ),
    nn AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM monthly
      GROUP BY 1
    ),
    ties AS (
      SELECT p_brand,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT p_brand, cents, CAST(COUNT(*) AS BIGINT) AS t
            FROM monthly GROUP BY 1, 2) g
      WHERE t > 1
      GROUP BY 1
    ),
    stats AS (
      SELECT nn.p_brand, nn.n, p.s,
             CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                  - COALESCE(ties.tie_term, 0) AS BIGINT) AS var18
      FROM nn
      JOIN pairs p ON p.p_brand = nn.p_brand
      LEFT JOIN ties ON ties.p_brand = nn.p_brand
    )
    SELECT p_brand, n AS n_months, s AS s_stat, var18,
           CAST(floor(
             (CASE WHEN s > 0 THEN CAST(s AS DOUBLE) - 1
                   WHEN s < 0 THEN CAST(s AS DOUBLE) + 1 ELSE 0.0 END)
             / sqrt(CAST(var18 AS DOUBLE) / 18) * 1000) AS BIGINT) AS z_e3,
           CASE WHEN (CASE WHEN s > 0 THEN CAST(s AS DOUBLE) - 1
                           WHEN s < 0 THEN CAST(s AS DOUBLE) + 1 ELSE 0.0 END)
                     / sqrt(CAST(var18 AS DOUBLE) / 18) > 1.959964 THEN 1
                WHEN (CASE WHEN s > 0 THEN CAST(s AS DOUBLE) - 1
                           WHEN s < 0 THEN CAST(s AS DOUBLE) + 1 ELSE 0.0 END)
                     / sqrt(CAST(var18 AS DOUBLE) / 18) < -1.959964 THEN -1
                ELSE 0 END AS trend
    FROM stats
    ORDER BY p_brand
    """,
)
def brand_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Kendall trend test per brand over monthly
    revenue.  Plan: fact x broadcast-part join, monthly groupBy, then
    every pair stage runs on the 25x83-row AGGREGATE (a broadcast
    self-join with a range residual — the quadratic blowup is on
    months-per-brand, not on rows, so it survives any fact-table
    scale).  The monthly aggregate feeds four consumers (pair sides,
    n, ties); Catalyst does not reuse the exchange across them, so it
    is localCheckpoint'ed once — ONE fact scan instead of four (the
    dedup_clusters / part_pagerank multi-consumer pattern)."""
    monthly = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("l_partkey"), "p_brand"
                )
            ),
            "l_partkey",
        )
        .groupBy(
            "p_brand",
            F.trunc(F.col("l_shipdate").cast("date"), "MM").alias("mo"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("cents")
        )
        .localCheckpoint()
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("b.p_brand") == F.col("a.p_brand"))
            & (F.col("b.mo") > F.col("a.mo")),
        )
        .groupBy(F.col("a.p_brand").alias("p_brand"))
        .agg(
            F.sum(
                F.when(F.col("b.cents") > F.col("a.cents"), 1)
                .when(F.col("b.cents") < F.col("a.cents"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    nn = monthly.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n")
    )
    ties = (
        monthly.groupBy("p_brand", "cents")
        .agg(F.count("*").cast("long").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    stats = (
        nn.join(pairs, "p_brand")
        .join(ties, "p_brand", "left")
        .select(
            "p_brand",
            "n",
            "s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("var18"),
        )
    )
    zexpr = (
        "(CASE WHEN s > 0 THEN CAST(s AS DOUBLE) - 1"
        " WHEN s < 0 THEN CAST(s AS DOUBLE) + 1"
        " ELSE 0.0 END) / sqrt(CAST(var18 AS DOUBLE) / 18)"
    )
    return stats.select(
        "p_brand",
        F.col("n").alias("n_months"),
        F.col("s").alias("s_stat"),
        "var18",
        F.expr(f"CAST(floor(({zexpr}) * 1000) AS BIGINT)").alias("z_e3"),
        F.expr(
            f"CASE WHEN {zexpr} > 1.959964 THEN 1"
            f" WHEN {zexpr} < -1.959964 THEN -1 ELSE 0 END"
        ).alias("trend"),
    ).orderBy("p_brand")


# --------------------------- Spearman rank correlation per nation

# Does a customer's account balance PREDICT lifetime spend within a
# nation?  Spearman's rho on (balance, spend) ranks — computed on
# DOUBLED average ranks (2*(rank-1) + tie_count + 1), which are exact
# integers even under ties (the 2x factors cancel in rho), so every
# moment entering the final formula is an exact int64 and only the
# last division rides deterministic doubles.  Degenerate (zero rank
# variance) nations report rho_e6 = 0 by exact integer comparison.
@register(
    "nation_spearman_bal_spend",
    """
    WITH spend AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS bal,
             CAST(COALESCE(SUM(
               CAST(floor(o.o_totalprice * 100) AS BIGINT)), 0)
               AS BIGINT) AS sp
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT c_nationkey,
             CAST(2 * (RANK() OVER (PARTITION BY c_nationkey
                                    ORDER BY bal) - 1)
                  + COUNT(*) OVER (PARTITION BY c_nationkey, bal) + 1
               AS BIGINT) AS rx,
             CAST(2 * (RANK() OVER (PARTITION BY c_nationkey
                                    ORDER BY sp) - 1)
                  + COUNT(*) OVER (PARTITION BY c_nationkey, sp) + 1
               AS BIGINT) AS ry
      FROM spend
    ),
    m AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx * ry) AS BIGINT) AS sxy,
             CAST(SUM(rx) AS BIGINT) AS sx,
             CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             CAST(SUM(ry * ry) AS BIGINT) AS syy
      FROM ranked GROUP BY 1
    )
    SELECT c_nationkey, n AS n_customers,
           CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN 0
                ELSE CAST(floor(
                  (n * sxy - sx * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                  * 1000000) AS BIGINT) END AS rho_e6
    FROM m ORDER BY c_nationkey
    """,
)
def nation_spearman_bal_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Spearman rho between account balance and lifetime
    spend via doubled average ranks.  Plan: customer x orders
    pre-aggregated join, two rank windows partitioned by nation (holds
    while |nation| partitions stay executor-sized; at extreme per-key
    cardinality the rank would move to a range-partitioned two-pass
    rank — documented, not needed at any TPC-H scale), one grouped
    moment fold."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("bal"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    spend = (
        cust.join(orders, "c_custkey", "left")
        .groupBy("c_custkey", "c_nationkey", "bal")
        .agg(
            F.coalesce(F.sum("cents"), F.lit(0).cast("long")).alias("sp")
        )
    )
    w_bal = Window.partitionBy("c_nationkey").orderBy("bal")
    w_sp = Window.partitionBy("c_nationkey").orderBy("sp")
    ranked = spend.select(
        "c_nationkey",
        (
            2 * (F.rank().over(w_bal) - 1)
            + F.count("*").over(
                Window.partitionBy("c_nationkey", "bal")
            )
            + 1
        )
        .cast("long")
        .alias("rx"),
        (
            2 * (F.rank().over(w_sp) - 1)
            + F.count("*").over(
                Window.partitionBy("c_nationkey", "sp")
            )
            + 1
        )
        .cast("long")
        .alias("ry"),
    )
    m = ranked.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
    )
    return m.select(
        "c_nationkey",
        F.col("n").alias("n_customers"),
        F.expr(
            "CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN 0"
            " ELSE CAST(floor((n * sxy - sx * sy)"
            " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            "        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
            " * 1000000) AS BIGINT) END"
        ).alias("rho_e6"),
    ).orderBy("c_nationkey")


# --------------------------- Ljung-Box portmanteau test

# Is the daily-revenue series white noise OVERALL?  revenue_acf reads
# individual lags; the Ljung-Box Q statistic pools lags 1..7 into one
# portmanteau decision against a frozen chi-square(7) critical value.
# Textbook form: ONE global floored-integer mean, one exact int64
# denominator, exact int64 per-lag cross sums — the only doubles are
# the seven r_k^2/(n-k) terms, summed in EXPLICIT lag order on both
# engines (the anova_nation_priority key-ordered-fold rule: a plain
# SUM over doubles is placement-dependent).
LJUNG_BOX_LAGS = 7
LJUNG_BOX_CHI2_95 = "14.067140"  # chi-square(7) 0.95 quantile, frozen


@register(
    "revenue_ljung_box",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
             CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS BIGINT) // COUNT(*) AS mu
      FROM daily
    ),
    dev AS (
      SELECT de, rev - mu AS d, n FROM daily CROSS JOIN g
    ),
    den AS (
      SELECT CAST(SUM(d * d) AS BIGINT) AS s0,
             CAST(MAX(n) AS BIGINT) AS n
      FROM dev
    ),
    lags AS (SELECT CAST(u.k AS BIGINT) AS lag
             FROM UNNEST(range(1, {LJUNG_BOX_LAGS} + 1)) AS u(k)),
    num AS (
      SELECT l.lag, CAST(SUM(a.d * b.d) AS BIGINT) AS sk
      FROM lags l
      JOIN dev a ON TRUE
      JOIN dev b ON b.de = a.de + l.lag
      GROUP BY 1
    ),
    folded AS (
      SELECT MAX(n) AS n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(sk AS DOUBLE) / s0)
                    * (CAST(sk AS DOUBLE) / s0) / (n - lag)
                    ORDER BY lag)),
             (a, b) -> a + b) AS v
      FROM num CROSS JOIN den
    )
    SELECT n AS n_days,
           CAST({LJUNG_BOX_LAGS} AS BIGINT) AS n_lags,
           CAST(floor(CAST(n AS DOUBLE) * (n + 2) * v * 1000) AS BIGINT) AS q_e3,
           CASE WHEN CAST(n AS DOUBLE) * (n + 2) * v > {LJUNG_BOX_CHI2_95}
                THEN 1 ELSE 0 END AS autocorrelated
    FROM folded
    """,
)
def revenue_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over lags 1..7 of daily order revenue.  Plan: one
    daily rollup, 1-row mean/denominator crossJoins (scalar-subquery
    shape), the 7-lag spine broadcast against the calendar-aligned
    self-join, then a sort_array+aggregate fold so the 7 double terms
    add in lag order under any placement.  The daily series and the
    deviation table each feed 2-3 consumers with no Catalyst exchange
    reuse, so both are localCheckpoint'ed (~2.4k rows) — ONE fact
    scan instead of six (brand_mann_kendall pattern)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("de")
        )
        .agg(F.sum(F.floor("o_totalprice").cast("bigint")).alias("rev"))
        .localCheckpoint()
    )
    g = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("CAST(SUM(rev) AS BIGINT) div COUNT(*)").alias("mu"),
    )
    dev = (
        daily.crossJoin(F.broadcast(g))
        .select("de", (F.col("rev") - F.col("mu")).alias("d"), "n")
        .localCheckpoint()
    )
    den = dev.agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s0"),
        F.max("n").cast("long").alias("n"),
    )
    lags = spark.range(1, LJUNG_BOX_LAGS + 1).select(
        F.col("id").alias("lag")
    )
    a = dev.select("de", F.col("d").alias("da"))
    b = dev.select(F.col("de").alias("de_b"), F.col("d").alias("db"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("de_b") == F.col("de") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("da") * F.col("db")).cast("long").alias("sk"))
    )
    terms = num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n",
        F.expr(
            "(CAST(sk AS DOUBLE) / s0) * (CAST(sk AS DOUBLE) / s0)"
            " / (n - lag)"
        ).alias("term"),
    )
    folded = terms.groupBy().agg(
        F.max("n").alias("n"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(lag, term))), x -> x.term),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("v"),
    )
    return folded.select(
        F.col("n").alias("n_days"),
        F.lit(LJUNG_BOX_LAGS).cast("long").alias("n_lags"),
        F.expr(
            "CAST(floor(CAST(n AS DOUBLE) * (n + 2) * v * 1000) AS BIGINT)"
        ).alias("q_e3"),
        F.expr(
            f"CASE WHEN CAST(n AS DOUBLE) * (n + 2) * v > {LJUNG_BOX_CHI2_95}"
            " THEN 1 ELSE 0 END"
        ).alias("autocorrelated"),
    )


# --------------------------- EOQ replenishment policy

# Classic economic-order-quantity policy per part, computed EXACTLY:
# EOQ = sqrt(2*K*D/h) realized as a floor-integer square root (float
# sqrt + a one-step correction, valid for radicands < 2^52 — both
# engines land on the identical integer), so policy outputs carry no
# float drift at any scale factor.  K/h are module constants
# interpolated into the oracle (HLL_ROLLING_DAYS drift-proofing
# pattern).
EOQ_ORDER_COST_CENTS = 5000
EOQ_HOLDING_CENTS_PER_UNIT = 250


@register(
    "part_eoq_policy",
    f"""
    WITH demand AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
               AS d
      FROM lineitem GROUP BY 1
    ),
    raw AS (
      SELECT l_partkey, d,
             CAST(2 * {EOQ_ORDER_COST_CENTS} * d
                  // {EOQ_HOLDING_CENTS_PER_UNIT} AS BIGINT) AS x
      FROM demand
    ),
    guess AS (
      SELECT l_partkey, d, x,
             CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS q0
      FROM raw
    ),
    fixed AS (
      SELECT l_partkey, d,
             CASE WHEN (q0 + 1) * (q0 + 1) <= x THEN q0 + 1
                  WHEN q0 * q0 > x THEN q0 - 1
                  ELSE q0 END AS eoq
      FROM guess
    )
    SELECT l_partkey, d AS demand_units, eoq AS eoq_units,
           CAST((d + eoq - 1) // eoq AS BIGINT) AS n_orders
    FROM fixed ORDER BY l_partkey
    """,
)
def part_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact EOQ per part (isqrt of 2KD/h via corrected floor
    sqrt) plus the implied order count.  Plan: one fact-sized demand
    rollup; everything after is |parts|-sized scalar arithmetic."""
    demand = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(F.floor("l_quantity").cast("long")).alias("d"))
    )
    raw = demand.select(
        "l_partkey",
        "d",
        F.expr(
            f"CAST(2 * {EOQ_ORDER_COST_CENTS} * d"
            f" div {EOQ_HOLDING_CENTS_PER_UNIT} AS BIGINT)"
        ).alias("x"),
    )
    guess = raw.select(
        "*",
        F.expr("CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)").alias(
            "q0"
        ),
    )
    fixed = guess.select(
        "l_partkey",
        "d",
        F.expr(
            "CASE WHEN (q0 + 1) * (q0 + 1) <= x THEN q0 + 1"
            " WHEN q0 * q0 > x THEN q0 - 1 ELSE q0 END"
        ).alias("eoq"),
    )
    return fixed.select(
        "l_partkey",
        F.col("d").alias("demand_units"),
        F.col("eoq").alias("eoq_units"),
        F.expr("CAST((d + eoq - 1) div eoq AS BIGINT)").alias(
            "n_orders"
        ),
    ).orderBy("l_partkey")


# --------------------------- order backlog timeline

# Event-sourced open-order backlog: +1 when an order is placed, -1 in
# the month its LAST line ships; the running sum is the month-end
# backlog — the operations "how far behind are we" series that aging
# buckets (a point-in-time snapshot) cannot show.  Pure integers end
# to end.
@register(
    "orders_backlog_timeline",
    """
    WITH per_order AS (
      SELECT o_orderkey,
             DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS om,
             DATE_TRUNC('month', MAX(CAST(l_shipdate AS DATE))) AS cm
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT om AS mo, 1 AS opened, 0 AS closed FROM per_order
      UNION ALL
      SELECT cm, 0, 1 FROM per_order
    ),
    monthly AS (
      SELECT CAST(mo AS DATE) AS mo,
             CAST(SUM(opened) AS BIGINT) AS opened,
             CAST(SUM(closed) AS BIGINT) AS closed
      FROM deltas GROUP BY 1
    )
    SELECT mo AS month, opened, closed,
           CAST(SUM(opened - closed) OVER (ORDER BY mo) AS BIGINT)
             AS backlog_eom
    FROM monthly ORDER BY mo
    """,
)
def orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end open-order backlog from +-1 delta events and one
    running sum.  Plan: one fact-sized per-order completion rollup;
    the delta union, monthly groupBy, and the ~90-row running-sum
    window are all aggregate-sized (same post-aggregation single-
    partition contract as revenue_acf).  Orders with no lineitems are
    out of scope by the inner join (they never enter the backlog).
    The +-1 deltas come from ONE pass: each per-order row explodes a
    2-element delta array (a UNION of two selects would recompute the
    fact join per branch — no Catalyst exchange reuse)."""
    from pyspark.sql import Window

    per_order = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("om"))
        .join(
            load_table(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("o_orderkey"),
                F.col("l_shipdate").cast("date").alias("sd"),
            ),
            "o_orderkey",
        )
        .groupBy("o_orderkey", "om")
        .agg(F.trunc(F.max("sd"), "MM").alias("cm"))
    )
    deltas = per_order.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("om").alias("mo"),
                    F.lit(1).alias("opened"),
                    F.lit(0).alias("closed"),
                ),
                F.struct(
                    F.col("cm").alias("mo"),
                    F.lit(0).alias("opened"),
                    F.lit(1).alias("closed"),
                ),
            )
        ).alias("e")
    ).select("e.mo", "e.opened", "e.closed")
    monthly = deltas.groupBy(F.col("mo").cast("date").alias("mo")).agg(
        F.sum("opened").cast("long").alias("opened"),
        F.sum("closed").cast("long").alias("closed"),
    )
    return (
        monthly.select(
            F.col("mo").alias("month"),
            "opened",
            "closed",
            F.sum(F.col("opened") - F.col("closed"))
            .over(Window.orderBy("mo"))
            .cast("long")
            .alias("backlog_eom"),
        )
        .orderBy("month")
    )


# --------------------------- difference-in-differences

# Did high-discount parts actually move MORE UNITS after the mid-
# history policy shift?  Difference-in-differences over a frozen
# calendar boundary: treatment = parts whose PRE-period mean discount
# is at or above the global pre mean (assigned by exact integer
# cross-multiplication, no ratio floats), outcome = mean units per
# line.  Four conditional-moment cells in one pass; the DID estimate
# and its z ride deterministic doubles from exact int64 moments
# (weekend_value_ztest precedent).
DID_SPLIT_DATE = "1995-06-01"


@register(
    "discount_did_revenue",
    f"""
    WITH lines AS (
      SELECT l_partkey,
             CASE WHEN CAST(l_shipdate AS DATE) >=
                       DATE '{DID_SPLIT_DATE}' THEN 1 ELSE 0 END
               AS post,
             CAST(floor(l_discount * 1000000) AS BIGINT) AS disc_ppm,
             CAST(floor(l_quantity) AS BIGINT) AS qty
      FROM lineitem
    ),
    pre_part AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_p,
             CAST(SUM(disc_ppm) AS BIGINT) AS sd_p
      FROM lines WHERE post = 0 GROUP BY 1
    ),
    pre_glob AS (
      SELECT CAST(SUM(n_p) AS BIGINT) AS n_g,
             CAST(SUM(sd_p) AS BIGINT) AS sd_g
      FROM pre_part
    ),
    assign AS (
      SELECT l_partkey,
             CASE WHEN sd_p * n_g >= sd_g * n_p THEN 1 ELSE 0 END
               AS treated
      FROM pre_part CROSS JOIN pre_glob
    ),
    cells AS (
      SELECT a.treated, l.post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(l.qty) AS BIGINT) AS s,
             CAST(SUM(l.qty * l.qty) AS BIGINT) AS q
      FROM lines l JOIN assign a ON a.l_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t0,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t1,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c0,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c1,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s_t0,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s_t1,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s_c0,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s_c1,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN q END) AS q_t0,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN q END) AS q_t1,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN q END) AS q_c0,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN q END) AS q_c1
      FROM cells
    )
    SELECT n_t0, n_t1, n_c0, n_c1,
           CAST(floor(
             ((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0)
              - (CAST(s_c1 AS DOUBLE) / n_c1
                 - CAST(s_c0 AS DOUBLE) / n_c0)) * 1000) AS BIGINT)
             AS did_e3,
           CAST(floor(
             ((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0)
              - (CAST(s_c1 AS DOUBLE) / n_c1
                 - CAST(s_c0 AS DOUBLE) / n_c0))
             / sqrt(
               (CAST(q_t1 AS DOUBLE) / n_t1
                - (CAST(s_t1 AS DOUBLE) / n_t1)
                  * (CAST(s_t1 AS DOUBLE) / n_t1)) / n_t1
               + (CAST(q_t0 AS DOUBLE) / n_t0
                  - (CAST(s_t0 AS DOUBLE) / n_t0)
                    * (CAST(s_t0 AS DOUBLE) / n_t0)) / n_t0
               + (CAST(q_c1 AS DOUBLE) / n_c1
                  - (CAST(s_c1 AS DOUBLE) / n_c1)
                    * (CAST(s_c1 AS DOUBLE) / n_c1)) / n_c1
               + (CAST(q_c0 AS DOUBLE) / n_c0
                  - (CAST(s_c0 AS DOUBLE) / n_c0)
                    * (CAST(s_c0 AS DOUBLE) / n_c0)) / n_c0)
             * 1000) AS BIGINT) AS z_e3
    FROM wide
    """,
)
def discount_did_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences of units-per-line around the frozen
    split date, treatment assigned from pre-period discounts by exact
    integer cross-multiplication.  Plan: one fact pass builds the
    |parts|-sized pre table (1-row global crossJoin, scalar-subquery
    shape), the assignment broadcasts back onto the fact scan, four
    moment cells reduce to one row.  The lines projection feeds both
    the assignment build and the cell pass — two fact scans by
    design (the second is filtered to pre by Catalyst; checkpointing
    a fact-sized projection would cost more than the rescan)."""
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(
            F.col("l_shipdate").cast("date")
            >= F.lit(DID_SPLIT_DATE).cast("date"),
            1,
        )
        .otherwise(0)
        .alias("post"),
        F.expr("CAST(floor(l_discount * 1000000) AS BIGINT)").alias(
            "disc_ppm"
        ),
        F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("qty"),
    )
    pre_part = (
        lines.where(F.col("post") == 0)
        .groupBy("l_partkey")
        .agg(
            F.count("*").cast("long").alias("n_p"),
            F.sum("disc_ppm").cast("long").alias("sd_p"),
        )
        # |parts|-sized, feeds both the global totals and the
        # assignment — checkpoint so the pre-filtered fact scan
        # runs once (brand_mann_kendall pattern)
        .localCheckpoint()
    )
    pre_glob = pre_part.agg(
        F.sum("n_p").cast("long").alias("n_g"),
        F.sum("sd_p").cast("long").alias("sd_g"),
    )
    assign = pre_part.crossJoin(F.broadcast(pre_glob)).select(
        "l_partkey",
        F.when(
            F.col("sd_p") * F.col("n_g") >= F.col("sd_g") * F.col("n_p"),
            1,
        )
        .otherwise(0)
        .alias("treated"),
    )
    cells = (
        lines.join(assign, "l_partkey")
        .groupBy("treated", "post")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("qty").cast("long").alias("s"),
            F.sum(F.col("qty") * F.col("qty")).cast("long").alias("q"),
        )
    )
    aggs = []
    for m in ("n", "s", "q"):
        for t, p, suf in ((1, 0, "t0"), (1, 1, "t1"), (0, 0, "c0"), (0, 1, "c1")):
            aggs.append(
                F.max(
                    F.when(
                        (F.col("treated") == t) & (F.col("post") == p),
                        F.col(m),
                    )
                ).alias(f"{m}_{suf}")
            )
    wide = cells.agg(*aggs)
    did = (
        "((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0)"
        " - (CAST(s_c1 AS DOUBLE) / n_c1"
        "    - CAST(s_c0 AS DOUBLE) / n_c0))"
    )
    se = (
        "sqrt((CAST(q_t1 AS DOUBLE) / n_t1"
        " - (CAST(s_t1 AS DOUBLE) / n_t1)"
        "   * (CAST(s_t1 AS DOUBLE) / n_t1)) / n_t1"
        " + (CAST(q_t0 AS DOUBLE) / n_t0"
        "    - (CAST(s_t0 AS DOUBLE) / n_t0)"
        "      * (CAST(s_t0 AS DOUBLE) / n_t0)) / n_t0"
        " + (CAST(q_c1 AS DOUBLE) / n_c1"
        "    - (CAST(s_c1 AS DOUBLE) / n_c1)"
        "      * (CAST(s_c1 AS DOUBLE) / n_c1)) / n_c1"
        " + (CAST(q_c0 AS DOUBLE) / n_c0"
        "    - (CAST(s_c0 AS DOUBLE) / n_c0)"
        "      * (CAST(s_c0 AS DOUBLE) / n_c0)) / n_c0)"
    )
    return wide.select(
        "n_t0",
        "n_t1",
        "n_c0",
        "n_c1",
        F.expr(f"CAST(floor({did} * 1000) AS BIGINT)").alias("did_e3"),
        F.expr(f"CAST(floor({did} / {se} * 1000) AS BIGINT)").alias(
            "z_e3"
        ),
    )


# --------------------------- bullwhip-effect screen

# Does order-signal variability AMPLIFY relative to shipment demand
# per brand (the bullwhip effect)?  The same joined fact rows are
# keyed TWICE in one pass — by order month and by ship month — via a
# 2-element kind explode (no union rescan), then CV^2 per (brand,
# kind) comes from exact int64 moments and only the final
# CV^2_ordered / CV^2_shipped ratio rides deterministic doubles (the
# integer cross product would overflow int64 at sf0.1).
@register(
    "brand_bullwhip_ratio",
    """
    WITH keyed AS (
      SELECT p_brand, kind,
             CASE WHEN kind = 'ordered'
                  THEN DATE_TRUNC('month', CAST(o_orderdate AS DATE))
                  ELSE DATE_TRUNC('month', CAST(l_shipdate AS DATE))
             END AS mo,
             CAST(floor(l_quantity) AS BIGINT) AS qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      CROSS JOIN (SELECT 'ordered' AS kind UNION ALL
                  SELECT 'shipped') k
    ),
    monthly AS (
      SELECT p_brand, kind, mo, CAST(SUM(qty) AS BIGINT) AS m
      FROM keyed GROUP BY 1, 2, 3
    ),
    moments AS (
      SELECT p_brand, kind, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS s,
             CAST(SUM(m * m) AS BIGINT) AS q
      FROM monthly GROUP BY 1, 2
    ),
    wide AS (
      SELECT p_brand,
             MAX(CASE WHEN kind = 'ordered' THEN n END) AS n_o,
             MAX(CASE WHEN kind = 'ordered' THEN s END) AS s_o,
             MAX(CASE WHEN kind = 'ordered' THEN q END) AS q_o,
             MAX(CASE WHEN kind = 'shipped' THEN n END) AS n_s,
             MAX(CASE WHEN kind = 'shipped' THEN s END) AS s_s,
             MAX(CASE WHEN kind = 'shipped' THEN q END) AS q_s
      FROM moments GROUP BY 1
    )
    SELECT p_brand, n_o AS n_months_ordered, n_s AS n_months_shipped,
           CAST(floor((CAST(n_o AS DOUBLE) * q_o - CAST(s_o AS DOUBLE) * s_o)
                      / (CAST(s_o AS DOUBLE) * s_o) * 1000000) AS BIGINT)
             AS cv2_ordered_e6,
           CAST(floor((CAST(n_s AS DOUBLE) * q_s - CAST(s_s AS DOUBLE) * s_s)
                      / (CAST(s_s AS DOUBLE) * s_s) * 1000000) AS BIGINT)
             AS cv2_shipped_e6,
           CAST(floor(((CAST(n_o AS DOUBLE) * q_o - CAST(s_o AS DOUBLE) * s_o)
                       / (CAST(s_o AS DOUBLE) * s_o))
                      / ((CAST(n_s AS DOUBLE) * q_s - CAST(s_s AS DOUBLE) * s_s)
                         / (CAST(s_s AS DOUBLE) * s_s)) * 1000) AS BIGINT)
             AS bullwhip_e3,
           CASE WHEN (CAST(n_o AS DOUBLE) * q_o - CAST(s_o AS DOUBLE) * s_o)
                     / (CAST(s_o AS DOUBLE) * s_o)
                   > (CAST(n_s AS DOUBLE) * q_s - CAST(s_s AS DOUBLE) * s_s)
                     / (CAST(s_s AS DOUBLE) * s_s)
                THEN 1 ELSE 0 END AS amplified
    FROM wide ORDER BY p_brand
    """,
)
def brand_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip screen per brand: CV^2 of monthly ordered vs shipped
    quantity from one fact pass (2-element kind explode instead of a
    UNION rescan), dims broadcast, moments exact int64."""
    fact = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_partkey",
            F.col("l_shipdate").cast("date").alias("sd"),
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("qty"),
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.col("o_orderdate").cast("date").alias("od"),
            ),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("l_partkey"), "p_brand"
                )
            ),
            "l_partkey",
        )
    )
    keyed = fact.select(
        "p_brand",
        "qty",
        F.explode(
            F.array(
                F.struct(
                    F.lit("ordered").alias("kind"),
                    F.trunc("od", "MM").alias("mo"),
                ),
                F.struct(
                    F.lit("shipped").alias("kind"),
                    F.trunc("sd", "MM").alias("mo"),
                ),
            )
        ).alias("e"),
    ).select("p_brand", F.col("e.kind").alias("kind"), F.col("e.mo").alias("mo"), "qty")
    monthly = keyed.groupBy("p_brand", "kind", "mo").agg(
        F.sum("qty").cast("long").alias("m")
    )
    moments = monthly.groupBy("p_brand", "kind").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("m").cast("long").alias("s"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("q"),
    )
    wide = moments.groupBy("p_brand").agg(
        *[
            F.max(
                F.when(F.col("kind") == kind, F.col(m))
            ).alias(f"{m}_{suf}")
            for m in ("n", "s", "q")
            for kind, suf in (("ordered", "o"), ("shipped", "s"))
        ]
    )
    cv_o = "(CAST(n_o AS DOUBLE) * q_o - CAST(s_o AS DOUBLE) * s_o) / (CAST(s_o AS DOUBLE) * s_o)"
    cv_s = "(CAST(n_s AS DOUBLE) * q_s - CAST(s_s AS DOUBLE) * s_s) / (CAST(s_s AS DOUBLE) * s_s)"
    return wide.select(
        "p_brand",
        F.col("n_o").alias("n_months_ordered"),
        F.col("n_s").alias("n_months_shipped"),
        F.expr(f"CAST(floor({cv_o} * 1000000) AS BIGINT)").alias(
            "cv2_ordered_e6"
        ),
        F.expr(f"CAST(floor({cv_s} * 1000000) AS BIGINT)").alias(
            "cv2_shipped_e6"
        ),
        F.expr(
            f"CAST(floor(({cv_o}) / ({cv_s}) * 1000) AS BIGINT)"
        ).alias("bullwhip_e3"),
        F.expr(
            f"CASE WHEN {cv_o} > {cv_s} THEN 1 ELSE 0 END"
        ).alias("amplified"),
    ).orderBy("p_brand")


# --------------------------- source distributional distinctiveness

# Which sources are DISTRIBUTIONALLY DISTINCTIVE — i.e. sampling them
# up or down changes the corpus most?  Jensen-Shannon divergence of
# each source's unigram distribution against the rest of the corpus.
# Exact-parity recipe: all counts are int64; per-term contributions
# are deterministic doubles folded in term order (the anova key-
# ordered-fold rule); terms ABSENT from the source close in closed
# form (their p=0 mass contributes ln(2) * (1 - sum q_present)), so
# only |source vocabulary| rows ever materialize per source.
# Requires >=2 sources (B > 0), which the documents table guarantees.
@register(
    "text_js_source_divergence",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    counts AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS a
      FROM tok GROUP BY 1, 2
    ),
    gterm AS (
      SELECT term, CAST(SUM(a) AS BIGINT) AS g FROM counts GROUP BY 1
    ),
    stot AS (
      SELECT source, CAST(SUM(a) AS BIGINT) AS ta FROM counts
      GROUP BY 1
    ),
    gtot AS (SELECT CAST(SUM(a) AS BIGINT) AS t FROM counts),
    r AS (
      SELECT c.source, c.term, c.a, g.g - c.a AS b, s.ta,
             t.t - s.ta AS tb
      FROM counts c
      JOIN gterm g USING (term)
      JOIN stot s USING (source)
      CROSS JOIN gtot t
    ),
    contrib AS (
      SELECT source, term, b, ta, tb,
             (CAST(a AS DOUBLE) / ta)
               * ln(2 * (CAST(a AS DOUBLE) / ta)
                    / ((CAST(a AS DOUBLE) / ta)
                       + (CAST(b AS DOUBLE) / tb)))
             + CASE WHEN b > 0 THEN
                 (CAST(b AS DOUBLE) / tb)
                   * ln(2 * (CAST(b AS DOUBLE) / tb)
                        / ((CAST(a AS DOUBLE) / ta)
                           + (CAST(b AS DOUBLE) / tb)))
               ELSE 0.0 END AS c
      FROM r
    ),
    folded AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(MAX(ta) AS BIGINT) AS n_tokens,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(MAX(tb) AS BIGINT) AS tb,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(c ORDER BY term)), (x, y) -> x + y) AS own
      FROM contrib GROUP BY source
    )
    SELECT source, n_tokens, n_terms,
           round(0.5 * (own + ln(2)
                        * (1 - CAST(sum_b AS DOUBLE) / tb)), 9)
             AS js_nats
    FROM folded ORDER BY source
    """,
)
def text_js_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source JS divergence vs the rest of the corpus over
    whitespace unigrams.  Plan: one token pass to the (source, term)
    aggregate (localCheckpoint'ed — it feeds four consumers), then
    everything is vocabulary-sized: broadcast totals, a 1-row corpus
    total crossJoin (scalar-subquery shape), term-ordered double
    folds per source."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    )
    counts = (
        tok.groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("a"))
        .localCheckpoint()
    )
    gterm = counts.groupBy("term").agg(
        F.sum("a").cast("long").alias("g")
    )
    stot = counts.groupBy("source").agg(
        F.sum("a").cast("long").alias("ta")
    )
    gtot = counts.agg(F.sum("a").cast("long").alias("t"))
    r = (
        counts.join(gterm, "term")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            "term",
            "a",
            (F.col("g") - F.col("a")).alias("b"),
            "ta",
            (F.col("t") - F.col("ta")).alias("tb"),
        )
    )
    cexpr = (
        "(CAST(a AS DOUBLE) / ta)"
        " * ln(2 * (CAST(a AS DOUBLE) / ta)"
        "      / ((CAST(a AS DOUBLE) / ta)"
        "         + (CAST(b AS DOUBLE) / tb)))"
        " + CASE WHEN b > 0 THEN"
        "     (CAST(b AS DOUBLE) / tb)"
        "       * ln(2 * (CAST(b AS DOUBLE) / tb)"
        "            / ((CAST(a AS DOUBLE) / ta)"
        "               + (CAST(b AS DOUBLE) / tb)))"
        "   ELSE 0.0 END"
    )
    contrib = r.select(
        "source", "term", "b", "ta", "tb", F.expr(cexpr).alias("c")
    )
    folded = contrib.groupBy("source").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.max("ta").cast("long").alias("n_tokens"),
        F.sum("b").cast("long").alias("sum_b"),
        F.max("tb").cast("long").alias("tb"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(term, c))), x -> x.c),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("own"),
    )
    return folded.select(
        "source",
        "n_tokens",
        "n_terms",
        F.expr(
            "round(0.5 * (own + ln(2)"
            " * (1 - CAST(sum_b AS DOUBLE) / tb)), 9)"
        ).alias("js_nats"),
    ).orderBy("source")


# --------------------------- held-out n-gram novelty

# How much of the held-out half's 3-gram inventory is NOVEL — never
# seen in the training half?  The memorization-vs-generalization
# screen for a pretraining corpus: a language whose novelty rate
# collapses is template/boilerplate-heavy; one near 100% gives the
# model no repeated structure to learn.  Deterministic interleaved
# split on doc_id parity; distinct-gram inventories per (lang, half);
# anti-join for novelty.  Pure integers end to end.
@register(
    "text_ngram_novelty",
    """
    WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks,
             doc_id % 2 AS half
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT lang, half, shingle
      FROM (
        SELECT lang, half,
               unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> concat_ws(' ', toks[i], toks[i + 1],
                                toks[i + 2]))) AS shingle
        FROM d WHERE len(toks) >= 3
      )
    ),
    novel AS (
      SELECT te.lang, CAST(COUNT(*) AS BIGINT) AS n_novel
      FROM (SELECT lang, shingle FROM grams WHERE half = 1) te
      LEFT JOIN (SELECT lang, shingle FROM grams WHERE half = 0) tr
        ON tr.lang = te.lang AND tr.shingle = te.shingle
      WHERE tr.shingle IS NULL
      GROUP BY 1
    ),
    sizes AS (
      SELECT lang,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_train,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_test
      FROM grams GROUP BY 1
    )
    SELECT s.lang, s.n_train AS n_train_grams,
           s.n_test AS n_test_grams,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel_grams,
           CAST(COALESCE(n.n_novel, 0) * 1000000 // s.n_test
             AS BIGINT) AS novel_ppm
    FROM sizes s LEFT JOIN novel n ON n.lang = s.lang
    WHERE s.n_test > 0
    ORDER BY s.lang
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out 3-gram novelty per language (doc_id-parity split,
    distinct inventories, anti-join).  Plan: one token pass to the
    distinct (lang, half, shingle) inventory (localCheckpoint'ed —
    three consumers), then inventory-sized joins only; the novelty
    anti-join is equi-keyed on (lang, shingle) and survives any
    corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.split("text", " ").alias("toks"),
        (F.col("doc_id") % 2).alias("half"),
    )
    grams = (
        d.where(F.size("toks") >= 3)
        .select(
            "lang",
            "half",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', slice(toks, i, 3)))"
                )
            ).alias("shingle"),
        )
        .distinct()
        .localCheckpoint()
    )
    te = grams.where(F.col("half") == 1).select("lang", "shingle")
    tr = grams.where(F.col("half") == 0).select("lang", "shingle")
    novel = (
        te.join(tr, ["lang", "shingle"], "left_anti")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_novel"))
    )
    sizes = grams.groupBy("lang").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    return (
        sizes.join(novel, "lang", "left")
        .where(F.col("n_test") > 0)
        .select(
            "lang",
            F.col("n_train").alias("n_train_grams"),
            F.col("n_test").alias("n_test_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias(
                "n_novel_grams"
            ),
            F.expr(
                "CAST(COALESCE(n_novel, 0) * 1000000 div n_test"
                " AS BIGINT)"
            ).alias("novel_ppm"),
        )
        .orderBy("lang")
    )


# --------------------------- semantic-dedup threshold sweep

# The dial chart an operator reads BEFORE committing a semantic-dedup
# threshold: per cosine cut (30/40/50%), how many within-cluster
# candidate pairs survive, how many distinct docs get dropped under
# the sq_dist-asc/vec_id-asc priority, and the corpus removal rate.
# One clustering + ONE un-thresholded pair scan serve the whole grid
# (the scan is localCheckpoint'ed in the operator); grid constants
# are interpolated into the oracle so the two sides cannot drift.
register(
    "dedup_semantic_sweep",
    _kmeans_oracle(as_cte=True)
    + f""",
    spts AS (
      SELECT a.vec_id, a.cluster_id, a.sq_dist, q.v
      FROM asg_final a JOIN q USING (vec_id)
    ),
    sprs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             a.sq_dist AS da, b.sq_dist AS db,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 9) AS cosine
      FROM spts a JOIN spts b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    ),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM spts),
    taus AS (
      SELECT CAST(u.t AS BIGINT) AS tau_pct
      FROM UNNEST([{", ".join(str(t) for t in dedup.SEMDEDUP_SWEEP_TAU_PCTS)}])
        AS u(t)
    ),
    hits AS (
      SELECT t.tau_pct, p.va,
             CASE WHEN (p.da < p.db) OR (p.da = p.db AND p.va < p.vb)
                  THEN p.vb ELSE p.va END AS loser
      FROM taus t JOIN sprs p
        ON p.cosine >= CAST(t.tau_pct AS DOUBLE) / 100
    )
    SELECT t.tau_pct,
           CAST(COUNT(h.va) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT h.loser) AS BIGINT) AS n_removed,
           CAST(COUNT(DISTINCT h.loser) * 1000000 // MAX(nv.n)
             AS BIGINT) AS removed_ppm
    FROM taus t
    LEFT JOIN hits h ON h.tau_pct = t.tau_pct
    CROSS JOIN nv
    GROUP BY t.tau_pct
    ORDER BY t.tau_pct
    """,
)(dedup.semantic_threshold_sweep)


# --------------------------- Markov-chain CLV projection

# Expected 3-quarter customer value BY ACTIVITY STATE: customers move
# through quarterly states (0 orders / 1 order / 2+), the state
# transition matrix is estimated in exact integer ppm, and the
# discounted value recursion v = R + y*P*R + y^2*P^2*R runs as ppm
# matrix-vector compositions with floor truncation (the
# events_transition_3step quantization, y = 9/10 exact).  The churn
# state ('0') is real: the customer x quarter grid includes inactive
# quarters, which is what makes the chain a retention model instead
# of a survivor-only average.
CLV_GAMMA_NUM = 9
CLV_GAMMA_DEN = 10


@register(
    "segment_markov_clv",
    f"""
    WITH qs AS (
      SELECT DISTINCT DATE_TRUNC('quarter', CAST(o_orderdate AS DATE))
        AS q
      FROM orders
    ),
    grid AS (SELECT c.c_custkey, qs.q FROM customer c CROSS JOIN qs),
    oq AS (
      SELECT o_custkey,
             DATE_TRUNC('quarter', CAST(o_orderdate AS DATE)) AS q,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    sq AS (
      SELECT g.c_custkey, g.q,
             CASE WHEN o.n IS NULL THEN '0'
                  WHEN o.n = 1 THEN '1' ELSE '2+' END AS state,
             COALESCE(o.cents, 0) AS cents
      FROM grid g
      LEFT JOIN oq o ON o.o_custkey = g.c_custkey AND o.q = g.q
    ),
    r AS (
      SELECT state, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(cents) AS BIGINT) // COUNT(*) AS r_cents
      FROM sq GROUP BY 1
    ),
    seq AS (
      SELECT state AS src,
             LEAD(state) OVER (PARTITION BY c_custkey ORDER BY q)
               AS dst
      FROM sq
    ),
    cnt AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS t FROM cnt
            GROUP BY 1),
    p1 AS (
      SELECT c.src, c.dst, c.n * 1000000 // t.t AS p
      FROM cnt c JOIN tot t ON c.src = t.src
    ),
    p2 AS (
      SELECT a.src, b.dst,
             CAST(SUM(a.p * b.p) // 1000000 AS BIGINT) AS p
      FROM p1 a JOIN p1 b ON a.dst = b.src GROUP BY 1, 2
    ),
    pr1 AS (
      SELECT p1.src,
             CAST(SUM(p1.p * r.r_cents) // 1000000 AS BIGINT) AS x
      FROM p1 JOIN r ON r.state = p1.dst GROUP BY 1
    ),
    pr2 AS (
      SELECT p2.src,
             CAST(SUM(p2.p * r.r_cents) // 1000000 AS BIGINT) AS x
      FROM p2 JOIN r ON r.state = p2.dst GROUP BY 1
    )
    SELECT r.state, r.n_obs, CAST(r.r_cents AS BIGINT) AS r_cents,
           CAST(COALESCE(pr1.x, 0) AS BIGINT) AS pr1_cents,
           CAST(COALESCE(pr2.x, 0) AS BIGINT) AS pr2_cents,
           CAST(r.r_cents
                + COALESCE(pr1.x, 0) * {CLV_GAMMA_NUM}
                  // {CLV_GAMMA_DEN}
                + COALESCE(pr2.x, 0)
                  * {CLV_GAMMA_NUM * CLV_GAMMA_NUM}
                  // {CLV_GAMMA_DEN * CLV_GAMMA_DEN}
             AS BIGINT) AS clv3_cents
    FROM r
    LEFT JOIN pr1 ON pr1.src = r.state
    LEFT JOIN pr2 ON pr2.src = r.state
    ORDER BY r.state
    """,
)
def segment_markov_clv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted 3-quarter CLV per activity state via exact-ppm
    Markov compositions.  Plan: one orders rollup, the customer x
    28-row quarter spine grid (broadcast crossJoin — linear output,
    events_gap_fill shape), localCheckpoint'ed state grid feeding
    both the reward table and the LEAD transition pass (two consumers,
    no exchange reuse), then everything is 3x3-sized."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    qs = orders.select(
        F.trunc(F.col("o_orderdate").cast("date"), "quarter").alias("q")
    ).distinct()
    grid = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .crossJoin(F.broadcast(qs))
    )
    oq = orders.groupBy(
        F.col("o_custkey").alias("c_custkey"),
        F.trunc(F.col("o_orderdate").cast("date"), "quarter").alias("q"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
        ).cast("long").alias("cents"),
    )
    sq = (
        grid.join(oq, ["c_custkey", "q"], "left")
        .select(
            "c_custkey",
            "q",
            F.when(F.col("n").isNull(), "0")
            .when(F.col("n") == 1, "1")
            .otherwise("2+")
            .alias("state"),
            F.coalesce(F.col("cents"), F.lit(0).cast("long")).alias(
                "cents"
            ),
        )
        .localCheckpoint()
    )
    r = sq.groupBy("state").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.expr("CAST(SUM(cents) AS BIGINT) div COUNT(*)").alias(
            "r_cents"
        ),
    )
    w = Window.partitionBy("c_custkey").orderBy("q")
    seq = sq.select(
        F.col("state").alias("src"),
        F.lead("state").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    cnt = seq.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = cnt.groupBy("src").agg(F.sum("n").cast("long").alias("t"))
    p1 = cnt.join(F.broadcast(tot), "src").select(
        "src", "dst", F.expr("n * 1000000 div t").alias("p")
    )
    a = p1.select(F.col("src"), F.col("dst").alias("mid"), F.col("p").alias("pa"))
    b = p1.select(F.col("src").alias("mid"), "dst", F.col("p").alias("pb"))
    p2 = (
        a.join(F.broadcast(b), "mid")
        .groupBy("src", "dst")
        .agg(
            F.expr("CAST(SUM(pa * pb) div 1000000 AS BIGINT)").alias("p")
        )
    )
    rd = r.select(F.col("state").alias("dst"), "r_cents")
    pr1 = (
        p1.join(F.broadcast(rd), "dst")
        .groupBy("src")
        .agg(
            F.expr(
                "CAST(SUM(p * r_cents) div 1000000 AS BIGINT)"
            ).alias("x1")
        )
    )
    pr2 = (
        p2.join(F.broadcast(rd), "dst")
        .groupBy("src")
        .agg(
            F.expr(
                "CAST(SUM(p * r_cents) div 1000000 AS BIGINT)"
            ).alias("x2")
        )
    )
    g2 = CLV_GAMMA_NUM * CLV_GAMMA_NUM
    d2 = CLV_GAMMA_DEN * CLV_GAMMA_DEN
    return (
        r.join(pr1.withColumnRenamed("src", "state"), "state", "left")
        .join(pr2.withColumnRenamed("src", "state"), "state", "left")
        .select(
            "state",
            "n_obs",
            F.col("r_cents").cast("long").alias("r_cents"),
            F.coalesce(F.col("x1"), F.lit(0).cast("long")).alias(
                "pr1_cents"
            ),
            F.coalesce(F.col("x2"), F.lit(0).cast("long")).alias(
                "pr2_cents"
            ),
            F.expr(
                f"CAST(r_cents + COALESCE(x1, 0) * {CLV_GAMMA_NUM}"
                f" div {CLV_GAMMA_DEN}"
                f" + COALESCE(x2, 0) * {g2} div {d2} AS BIGINT)"
            ).alias("clv3_cents"),
        )
        .orderBy("state")
    )


# --------------------------- supplier lead-time SLA scorecard

# Per-supplier order-to-ship lead time: discrete p50/p90 (actual data
# values, no interpolation) and the share of lines breaching the
# frozen SLA — the procurement escalation worklist.  The global
# sibling is fulfillment_lag; this is the per-entity scorecard that
# names WHO to call.
SLA_LEAD_DAYS = 90


@register(
    "supplier_lead_time_sla",
    f"""
    WITH lag AS (
      SELECT l_suppkey,
             datediff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(quantile_disc(days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(days, 0.9) AS BIGINT) AS p90_days,
           CAST(SUM(CASE WHEN days > {SLA_LEAD_DAYS} THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS breach_ppm
    FROM lag GROUP BY l_suppkey ORDER BY l_suppkey
    """,
)
def supplier_lead_time_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier lead-time scorecard: one fact-fact equi-join, one
    supplier-keyed aggregate with discrete percentiles (integer day
    values on both engines) and an exact breach-share ppm."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.to_date("l_shipdate").alias("sd"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("od"),
    )
    lag = li.join(orders, "l_orderkey").select(
        "l_suppkey", F.datediff("sd", "od").alias("days")
    )
    return (
        lag.groupBy("l_suppkey")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP"
                " (ORDER BY days) AS BIGINT)"
            ).alias("p50_days"),
            F.expr(
                "CAST(percentile_disc(0.9) WITHIN GROUP"
                " (ORDER BY days) AS BIGINT)"
            ).alias("p90_days"),
            F.expr(
                f"CAST(SUM(CASE WHEN days > {SLA_LEAD_DAYS} THEN 1"
                " ELSE 0 END) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("breach_ppm"),
        )
        .orderBy("l_suppkey")
    )


# --------------------------- quantity-weighted median price

# The price the MEDIAN UNIT actually traded at, per category — a
# volume-weighted centre immune to a flood of tiny cheap lines that
# drags the unweighted median (category_quantile_bands' blind spot).
# Weighted median = smallest price with cumulative quantity covering
# half the total, realized as one price-ordered running sum over the
# (category, price) aggregate — positional, tie-free, pure integers.
@register(
    "category_weighted_median_price",
    """
    WITH u AS (
      SELECT p_type AS category,
             CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)
               AS price_c,
             CAST(floor(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    agg AS (
      SELECT category, price_c, CAST(SUM(qty) AS BIGINT) AS w
      FROM u GROUP BY 1, 2
    ),
    cum AS (
      SELECT category, price_c, w,
             CAST(SUM(w) OVER (PARTITION BY category
                               ORDER BY price_c) AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY category) AS BIGINT) AS tw
      FROM agg
    )
    SELECT category,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_c END)
             AS BIGINT) AS wmedian_price_c,
           CAST(MAX(tw) AS BIGINT) AS total_qty
    FROM cum GROUP BY category ORDER BY category
    """,
)
def category_weighted_median_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantity-weighted median unit price per category.  Plan: fact
    x broadcast-part join, (category, price) pre-aggregate, then the
    running-sum window runs over the AGGREGATE (|categories| x
    |distinct prices| rows), never the fact table."""
    from pyspark.sql import Window

    u = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("l_partkey"),
                    F.col("p_type").alias("category"),
                )
            ),
            "l_partkey",
        )
        .select(
            "category",
            F.expr(
                "CAST(floor(l_extendedprice * 100 / l_quantity)"
                " AS BIGINT)"
            ).alias("price_c"),
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("qty"),
        )
    )
    agg = u.groupBy("category", "price_c").agg(
        F.sum("qty").cast("long").alias("w")
    )
    cum = agg.select(
        "category",
        "price_c",
        F.sum("w")
        .over(Window.partitionBy("category").orderBy("price_c"))
        .cast("long")
        .alias("cw"),
        F.sum("w")
        .over(Window.partitionBy("category"))
        .cast("long")
        .alias("tw"),
    )
    return (
        cum.groupBy("category")
        .agg(
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c"))
            )
            .cast("long")
            .alias("wmedian_price_c"),
            F.max("tw").cast("long").alias("total_qty"),
        )
        .orderBy("category")
    )


# --------------------------- repurchase hazard life table

# When do customers come back?  Discrete-time life table over
# consecutive-order gaps (30-day buckets, 12 = "a year or more"):
# hazard h(k) = gaps ending in bucket k / gaps reaching k, survival
# S(k) = gaps longer than k / all gaps.  No censoring (every observed
# gap is complete), so BOTH columns are direct exact ratios — no
# cumulative-product truncation ladder.  The churn-timing curve that
# prices win-back campaigns.
@register(
    "customer_next_order_hazard",
    """
    WITH gaps AS (
      SELECT LEAST(datediff('day', od,
               LEAD(od) OVER (PARTITION BY o_custkey
                              ORDER BY od, o_orderkey)) // 30 + 1,
             12) AS k
      FROM (SELECT o_custkey, o_orderkey,
                   CAST(o_orderdate AS DATE) AS od FROM orders)
    ),
    g AS (SELECT k FROM gaps WHERE k IS NOT NULL),
    buckets AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS d FROM g GROUP BY k
    ),
    life AS (
      SELECT k, d,
             CAST(SUM(d) OVER () AS BIGINT) AS n,
             CAST(SUM(d) OVER () - COALESCE(SUM(d) OVER (ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_at_risk
      FROM buckets
    )
    SELECT k AS gap_months, n_at_risk, d AS n_ended,
           CAST(d * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm,
           CAST((n_at_risk - d) * 1000000 // n AS BIGINT)
             AS survival_ppm
    FROM life ORDER BY k
    """,
)
def customer_next_order_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete repurchase hazard/survival per 30-day gap bucket.
    Plan: ONE customer-partitioned LEAD pass builds the gaps; the
    total and the running at-risk count both come from windows over
    the 12-row bucket aggregate itself (no second fact pass, no
    crossJoin)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = orders.select(
        F.least(
            F.floor(
                F.datediff(F.lead("od").over(w), F.col("od")) / 30
            ).cast("long")
            + 1,
            F.lit(12).cast("long"),
        ).alias("k")
    ).where(F.col("k").isNotNull())
    buckets = gaps.groupBy("k").agg(F.count("*").cast("long").alias("d"))
    wk = (
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy()
    life = buckets.select(
        "k",
        "d",
        F.sum("d").over(wall).cast("long").alias("n"),
        (
            F.sum("d").over(wall)
            - F.coalesce(F.sum("d").over(wk), F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("n_at_risk"),
    )
    return life.select(
        F.col("k").alias("gap_months"),
        "n_at_risk",
        F.col("d").alias("n_ended"),
        F.expr("CAST(d * 1000000 div n_at_risk AS BIGINT)").alias(
            "hazard_ppm"
        ),
        F.expr(
            "CAST((n_at_risk - d) * 1000000 div n AS BIGINT)"
        ).alias("survival_ppm"),
    ).orderBy("gap_months")


# --------------------------- classical seasonality indices

# Ratio-to-moving-average seasonal indices per category: each month's
# revenue over its centered 12-month window sum (x12, ppm — pure
# integer floor division), averaged per month-of-year across years —
# the classical decomposition's seasonal component, exact end to end.
# Edge months without a full 12-month window are excluded (cnt = 12
# guard), the textbook treatment.
@register(
    "category_seasonality_index",
    """
    WITH monthly AS (
      SELECT p_type AS category,
             CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) * 12
                  + EXTRACT(month FROM CAST(l_shipdate AS DATE))
               AS BIGINT) AS mi,
             CAST(EXTRACT(month FROM CAST(l_shipdate AS DATE))
               AS BIGINT) AS moy,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2, 3
    ),
    win AS (
      SELECT category, moy, cents,
             CAST(SUM(cents) OVER (PARTITION BY category ORDER BY mi
               ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
               AS BIGINT) AS sum12,
             COUNT(*) OVER (PARTITION BY category ORDER BY mi
               ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS cnt
      FROM monthly
    ),
    ratios AS (
      SELECT category, moy,
             cents * 12 * 1000000 // sum12 AS r_ppm
      FROM win WHERE cnt = 12
    )
    SELECT category, moy AS month_of_year,
           CAST(COUNT(*) AS BIGINT) AS n_years,
           CAST(SUM(r_ppm) AS BIGINT) // COUNT(*) AS index_ppm
    FROM ratios GROUP BY 1, 2
    ORDER BY category, moy
    """,
)
def category_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-MA seasonal indices per (category, month-of-year).
    Plan: fact x broadcast-part join, monthly rollup, then the
    centered 12-row window and the index averaging both run over the
    |categories| x |months| AGGREGATE."""
    from pyspark.sql import Window

    monthly = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("l_partkey"),
                    F.col("p_type").alias("category"),
                )
            ),
            "l_partkey",
        )
        .groupBy(
            "category",
            (
                F.year(F.col("l_shipdate").cast("date")) * 12
                + F.month(F.col("l_shipdate").cast("date"))
            )
            .cast("long")
            .alias("mi"),
            F.month(F.col("l_shipdate").cast("date"))
            .cast("long")
            .alias("moy"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    w12 = (
        Window.partitionBy("category").orderBy("mi").rowsBetween(-5, 6)
    )
    win = monthly.select(
        "category",
        "moy",
        "cents",
        F.sum("cents").over(w12).cast("long").alias("sum12"),
        F.count("*").over(w12).alias("cnt"),
    )
    ratios = win.where(F.col("cnt") == 12).select(
        "category",
        "moy",
        F.expr("cents * 12 * 1000000 div sum12").alias("r_ppm"),
    )
    return (
        ratios.groupBy(
            "category", F.col("moy").alias("month_of_year")
        )
        .agg(
            F.count("*").cast("long").alias("n_years"),
            F.expr(
                "CAST(SUM(r_ppm) AS BIGINT) div COUNT(*)"
            ).alias("index_ppm"),
        )
        .orderBy("category", "month_of_year")
    )


# --------------------------- MMR diversified retrieval

# Greedy maximal-marginal-relevance re-rank of the brute top-20 pool
# (lambda = 1/2, so the x2 score is relevance - redundancy).  The
# oracle unrolls the k greedy steps as CTEs over the same round-9
# engine cosines, so the full trajectory (picks, redundancy values,
# scores) is hash-checked, not just the final id set.
def _mmr_oracle() -> str:
    from data_pipeline_for_e_commerce_shop_spark.operators.similarity import (
        MMR_K,
        MMR_POOL_N,
        MMR_QUERY_ID,
    )

    head = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {MMR_QUERY_ID}),
    pool AS (
      SELECT e.vec_id,
             round(list_dot_product(e.v, q.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))), 9)
               AS cosine,
             e.v
      FROM e CROSS JOIN q WHERE e.vec_id != {MMR_QUERY_ID}
      ORDER BY cosine DESC, vec_id LIMIT {MMR_POOL_N}
    ),
    pp AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 9) AS cos
      FROM pool a JOIN pool b ON a.vec_id != b.vec_id
    ),
    s1 AS (
      SELECT 1 AS rank, vec_id, cosine, CAST(0.0 AS DOUBLE) AS red
      FROM pool ORDER BY cosine DESC, vec_id LIMIT 1
    )"""
    steps, prev = [], ["s1"]
    for i in range(2, MMR_K + 1):
        chosen = " UNION ALL ".join(
            f"SELECT vec_id FROM {p}" for p in prev
        )
        steps.append(f""",
    c{i} AS (
      SELECT p.vec_id, p.cosine,
             (SELECT MAX(pp.cos) FROM pp
              WHERE pp.a = p.vec_id
                AND pp.b IN ({chosen})) AS red
      FROM pool p WHERE p.vec_id NOT IN ({chosen})
    ),
    s{i} AS (
      SELECT {i} AS rank, vec_id, cosine, red FROM c{i}
      ORDER BY cosine - red DESC, vec_id LIMIT 1
    )""")
        prev.append(f"s{i}")
    final = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(1, MMR_K + 1)
    )
    return head + "".join(steps) + f"""
    SELECT CAST(rank AS BIGINT) AS rank, vec_id, cosine AS rel_cosine,
           red AS redundancy, cosine - red AS mmr_x2
    FROM ({final}) ORDER BY rank
    """


register("embedding_mmr_topk", _mmr_oracle())(similarity.mmr_topk)


# --------------------------- cannibalization screen

# Which two HIGH-VOLUME parts in a brand trade demand against each
# other?  For each brand's top-10 parts by total quantity, the most
# negative MONTHLY-demand correlation pair (exact deviation sums
# with floored means over common months — the part_demand_persistence
# recipe, crossed; weekly alignment is too sparse for top parts even
# at sf0.1, max 12 common weeks) — the assortment-rationalization
# shortlist.
CANNIBAL_TOP_PARTS = 10
CANNIBAL_MIN_PERIODS = 8


@register(
    "brand_cannibalization_screen",
    f"""
    WITH monthly AS (
      SELECT p_brand, l_partkey,
             DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS mo,
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
               AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2, 3
    ),
    vol AS (
      SELECT p_brand, l_partkey,
             CAST(SUM(q) AS BIGINT) AS total_q,
             ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY SUM(q) DESC, l_partkey) AS rk
      FROM monthly GROUP BY 1, 2
    ),
    top AS (
      SELECT p_brand, l_partkey FROM vol
      WHERE rk <= {CANNIBAL_TOP_PARTS}
    ),
    tw AS (
      SELECT w.p_brand, w.l_partkey, w.mo, w.q
      FROM monthly w JOIN top t
        ON t.p_brand = w.p_brand AND t.l_partkey = w.l_partkey
    ),
    pairs AS (
      SELECT a.p_brand, a.l_partkey AS pa, b.l_partkey AS pb,
             a.q AS x, b.q AS y
      FROM tw a JOIN tw b
        ON b.p_brand = a.p_brand AND b.mo = a.mo
       AND b.l_partkey > a.l_partkey
    ),
    m AS (
      SELECT p_brand, pa, pb, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) // COUNT(*) AS mx,
             CAST(SUM(y) AS BIGINT) // COUNT(*) AS my
      FROM pairs GROUP BY 1, 2, 3
      HAVING COUNT(*) >= {CANNIBAL_MIN_PERIODS}
    ),
    r AS (
      SELECT p.p_brand, p.pa, p.pb, m.n,
             CAST(SUM((p.x - m.mx) * (p.y - m.my)) AS BIGINT) AS sxy,
             CAST(SUM((p.x - m.mx) * (p.x - m.mx)) AS BIGINT) AS sxx,
             CAST(SUM((p.y - m.my) * (p.y - m.my)) AS BIGINT) AS syy
      FROM pairs p
      JOIN m ON m.p_brand = p.p_brand AND m.pa = p.pa AND m.pb = p.pb
      GROUP BY 1, 2, 3, 4
    ),
    scored AS (
      SELECT p_brand, pa, pb, n,
             CAST(floor(CAST(sxy AS DOUBLE) * 1000000
               / (sqrt(CAST(sxx AS DOUBLE))
                  * sqrt(CAST(syy AS DOUBLE)))) AS BIGINT) AS r_ppm
      FROM r WHERE sxx > 0 AND syy > 0
    )
    SELECT p_brand, pa AS part_a, pb AS part_b, n AS n_months, r_ppm
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY r_ppm, pa, pb) AS pick
      FROM scored
    ) WHERE pick = 1
    ORDER BY p_brand
    """,
)
def brand_cannibalization_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most negative monthly-demand correlation pair per brand among
    its top-10 parts.  Plan: one fact x broadcast-part rollup to the
    monthly aggregate (localCheckpoint'ed — it feeds the volume rank
    and both pair sides), then every pair stage runs on top-10-parts
    x months aggregates; the quadratic blowup is 45 pairs per brand,
    never fact-sized."""
    from pyspark.sql import Window

    monthly = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("l_partkey"), "p_brand"
                )
            ),
            "l_partkey",
        )
        .groupBy(
            "p_brand",
            "l_partkey",
            F.trunc(F.col("l_shipdate").cast("date"), "MM").alias(
                "mo"
            ),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)")).alias("q")
        )
        .localCheckpoint()
    )
    top = (
        monthly.groupBy("p_brand", "l_partkey")
        .agg(F.sum("q").alias("total_q"))
        .select(
            "p_brand",
            "l_partkey",
            F.row_number()
            .over(
                Window.partitionBy("p_brand").orderBy(
                    F.col("total_q").desc(), F.col("l_partkey")
                )
            )
            .alias("rk"),
        )
        .where(F.col("rk") <= CANNIBAL_TOP_PARTS)
        .select("p_brand", "l_partkey")
    )
    tw = monthly.join(top, ["p_brand", "l_partkey"])
    a = tw.select(
        "p_brand", F.col("l_partkey").alias("pa"), "mo", F.col("q").alias("x")
    )
    b = tw.select(
        "p_brand", F.col("l_partkey").alias("pb"), "mo", F.col("q").alias("y")
    )
    pairs = a.join(
        b,
        (a["p_brand"] == b["p_brand"])
        & (a["mo"] == b["mo"])
        & (b["pb"] > a["pa"]),
    ).select(a["p_brand"], "pa", "pb", "x", "y")
    m = (
        pairs.groupBy("p_brand", "pa", "pb")
        .agg(
            F.count("*").alias("n"),
            F.expr("CAST(SUM(x) AS BIGINT) div COUNT(*)").alias("mx"),
            F.expr("CAST(SUM(y) AS BIGINT) div COUNT(*)").alias("my"),
        )
        .where(F.col("n") >= CANNIBAL_MIN_PERIODS)
    )
    r = (
        pairs.join(m, ["p_brand", "pa", "pb"])
        .groupBy("p_brand", "pa", "pb", "n")
        .agg(
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my"))).alias("sxy"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))).alias("sxx"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))).alias("syy"),
        )
    )
    scored = r.where((F.col("sxx") > 0) & (F.col("syy") > 0)).select(
        "p_brand",
        "pa",
        "pb",
        "n",
        F.expr(
            "CAST(floor(CAST(sxy AS DOUBLE) * 1000000"
            " / (sqrt(CAST(sxx AS DOUBLE))"
            "    * sqrt(CAST(syy AS DOUBLE)))) AS BIGINT)"
        ).alias("r_ppm"),
    )
    wpick = Window.partitionBy("p_brand").orderBy("r_ppm", "pa", "pb")
    return (
        scored.withColumn("pick", F.row_number().over(wpick))
        .where(F.col("pick") == 1)
        .select(
            "p_brand",
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("n").alias("n_months"),
            "r_ppm",
        )
        .orderBy("p_brand")
    )


# --------------------------- arc price elasticity

# Demand elasticity per category from ADJACENT discount bands: the
# arc (midpoint) elasticity ((q2-q1)/(q2+q1)) / ((p2-p1)/(p2+p1))
# over per-band average unit price (cents) and average quantity
# (milli-units) — both floored integer ratios, the elasticity itself
# a double of exact integer cross products (negative values forbid
# integer floor-division: DuckDB floors, Spark truncates).
@register(
    "category_arc_elasticity",
    """
    WITH lines AS (
      SELECT p_type AS category,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS band,
             CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)
               AS price_c,
             CAST(floor(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    bands AS (
      SELECT category, band,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(price_c) AS BIGINT) // COUNT(*) AS p,
             CAST(SUM(qty) AS BIGINT) * 1000 // COUNT(*) AS q
      FROM lines GROUP BY 1, 2
    ),
    adj AS (
      SELECT category, band, n, p, q,
             LEAD(band) OVER w AS band2,
             LEAD(n) OVER w AS n2,
             LEAD(p) OVER w AS p2,
             LEAD(q) OVER w AS q2
      FROM bands
      WINDOW w AS (PARTITION BY category ORDER BY band)
    )
    SELECT category, band AS band_lo, band2 AS band_hi,
           n AS n_lo, n2 AS n_hi,
           p AS price_lo_c, p2 AS price_hi_c,
           q AS qty_lo_milli, q2 AS qty_hi_milli,
           CAST(floor(
             CAST((q2 - q) * (p2 + p) AS DOUBLE) * 1000
             / ((p2 - p) * (q2 + q))) AS BIGINT) AS elasticity_e3
    FROM adj
    WHERE band2 IS NOT NULL AND p2 <> p
    ORDER BY category, band
    """,
)
def category_arc_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc elasticity between adjacent discount bands per category.
    Plan: fact x broadcast-part join, one (category, band) rollup,
    then a LEAD window over the ~|categories| x 11-band aggregate."""
    from pyspark.sql import Window

    lines = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("l_partkey"),
                    F.col("p_type").alias("category"),
                )
            ),
            "l_partkey",
        )
        .select(
            "category",
            F.expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").alias(
                "band"
            ),
            F.expr(
                "CAST(floor(l_extendedprice * 100 / l_quantity)"
                " AS BIGINT)"
            ).alias("price_c"),
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("qty"),
        )
    )
    bands = lines.groupBy("category", "band").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("CAST(SUM(price_c) AS BIGINT) div COUNT(*)").alias("p"),
        F.expr("CAST(SUM(qty) AS BIGINT) * 1000 div COUNT(*)").alias(
            "q"
        ),
    )
    w = Window.partitionBy("category").orderBy("band")
    adj = bands.select(
        "category",
        "band",
        "n",
        "p",
        "q",
        F.lead("band").over(w).alias("band2"),
        F.lead("n").over(w).alias("n2"),
        F.lead("p").over(w).alias("p2"),
        F.lead("q").over(w).alias("q2"),
    )
    return (
        adj.where(F.col("band2").isNotNull() & (F.col("p2") != F.col("p")))
        .select(
            "category",
            F.col("band").alias("band_lo"),
            F.col("band2").alias("band_hi"),
            F.col("n").alias("n_lo"),
            F.col("n2").alias("n_hi"),
            F.col("p").alias("price_lo_c"),
            F.col("p2").alias("price_hi_c"),
            F.col("q").alias("qty_lo_milli"),
            F.col("q2").alias("qty_hi_milli"),
            F.expr(
                "CAST(floor(CAST((q2 - q) * (p2 + p) AS DOUBLE) * 1000"
                " / ((p2 - p) * (q2 + q))) AS BIGINT)"
            ).alias("elasticity_e3"),
        )
        .orderBy("category", "band_lo")
    )


# --------------------------- transition entropy per source state

# How PREDICTABLE is each event type's successor?  Shannon entropy of
# every row of the first-order transition matrix (natural log,
# dst-ordered double folds per the anova rule) with the effective
# branching factor exp(H) — low-entropy states are funnels, high-
# entropy states are browsing.
@register(
    "events_transition_entropy",
    """
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type AS src, next_type AS dst,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (
      SELECT src, CAST(SUM(n) AS BIGINT) AS t FROM counts GROUP BY 1
    ),
    terms AS (
      SELECT c.src, c.dst, t.t,
             -(CAST(c.n AS DOUBLE) / t.t)
               * ln(CAST(c.n AS DOUBLE) / t.t) AS h
      FROM counts c JOIN tot t ON t.src = c.src
    ),
    folded AS (
      SELECT src, CAST(MAX(t) AS BIGINT) AS n_transitions,
             CAST(COUNT(*) AS BIGINT) AS n_dst,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(h ORDER BY dst)), (a, b) -> a + b) AS hsum
      FROM terms GROUP BY src
    )
    SELECT src, n_transitions, n_dst,
           round(hsum, 9) AS entropy_nats,
           CAST(floor(exp(hsum) * 1000) AS BIGINT) AS branching_e3
    FROM folded ORDER BY src
    """,
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row entropy of the event-type transition matrix.  Plan: one
    user-partitioned LEAD pass to |types|^2 counts; entropy terms
    fold in dst order (placement-independent doubles)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_timestamp("ts"), "event_id"
    )
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("src"),
        F.col("next_type").alias("dst"),
    ).agg(F.count("*").cast("long").alias("n"))
    tot = counts.groupBy("src").agg(F.sum("n").cast("long").alias("t"))
    terms = counts.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "t",
        F.expr(
            "-(CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t)"
        ).alias("h"),
    )
    folded = terms.groupBy("src").agg(
        F.max("t").cast("long").alias("n_transitions"),
        F.count("*").cast("long").alias("n_dst"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(dst, h))), x -> x.h),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("hsum"),
    )
    return folded.select(
        "src",
        "n_transitions",
        "n_dst",
        F.round("hsum", 9).alias("entropy_nats"),
        F.expr("CAST(floor(exp(hsum) * 1000) AS BIGINT)").alias(
            "branching_e3"
        ),
    ).orderBy("src")


# --------------------------- Mann-Whitney priority test

# Do URGENT orders actually ship faster than LOW ones?  Mann-Whitney
# U on per-line lead days between the two priority extremes — the
# rank test that needs no normality assumption, computed WITHOUT a
# row-level rank: lead days take ~130 distinct values, so doubled
# average ranks come from the VALUE HISTOGRAM's cumulative counts
# (2*#less + #equal + 1) and every moment is an exact int64; the
# tie-corrected z alone rides explicit-cast doubles.
MW_GROUP_HI = "1-URGENT"
MW_GROUP_LO = "5-LOW"


@register(
    "priority_mannwhitney_leadtime",
    f"""
    WITH lines AS (
      SELECT CASE WHEN o_orderpriority = '{MW_GROUP_HI}' THEN 1
                  ELSE 0 END AS grp,
             datediff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('{MW_GROUP_HI}', '{MW_GROUP_LO}')
    ),
    hist AS (
      SELECT days, CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(grp) AS BIGINT) AS t1
      FROM lines GROUP BY days
    ),
    ranked AS (
      SELECT days, t, t1,
             CAST(2 * COALESCE(SUM(t) OVER (ORDER BY days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS BIGINT) AS r2
      FROM hist
    ),
    m AS (
      SELECT CAST(SUM(t1) AS BIGINT) AS n1,
             CAST(SUM(t - t1) AS BIGINT) AS n2,
             CAST(SUM(t1 * r2) AS BIGINT) AS r1_2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
      FROM ranked
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u_x2,
           CAST(floor(
             (CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE)
              - CAST(n1 AS DOUBLE) * n2)
             / (2 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12)
                 * ((n1 + n2 + 1)
                    - CAST(tie_sum AS DOUBLE)
                      / ((n1 + n2) * (CAST(n1 AS DOUBLE) + n2 - 1)))))
             * 1000) AS BIGINT) AS z_e3,
           CASE WHEN ABS(
             (CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE)
              - CAST(n1 AS DOUBLE) * n2)
             / (2 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12)
                 * ((n1 + n2 + 1)
                    - CAST(tie_sum AS DOUBLE)
                      / ((n1 + n2) * (CAST(n1 AS DOUBLE) + n2 - 1)))))
             ) > 1.959964 THEN 1 ELSE 0 END AS significant
    FROM m
    """,
)
def priority_mannwhitney_leadtime(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U between URGENT and LOW lead times via
    histogram-derived doubled average ranks.  Plan: fact-fact join,
    one ~130-row value histogram, a running sum over it, one moment
    fold — no row-level global sort ever."""
    from pyspark.sql import Window

    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
        )
        .join(
            load_table(spark, sf_dir, "orders")
            .where(
                F.col("o_orderpriority").isin(MW_GROUP_HI, MW_GROUP_LO)
            )
            .select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.col("o_orderdate").cast("date").alias("od"),
                F.when(F.col("o_orderpriority") == MW_GROUP_HI, 1)
                .otherwise(0)
                .alias("grp"),
            ),
            "l_orderkey",
        )
        .select("grp", F.datediff("sd", "od").alias("days"))
    )
    hist = lines.groupBy("days").agg(
        F.count("*").cast("long").alias("t"),
        F.sum("grp").cast("long").alias("t1"),
    )
    wd = Window.orderBy("days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = hist.select(
        "days",
        "t",
        "t1",
        (
            2 * F.coalesce(F.sum("t").over(wd), F.lit(0).cast("long"))
            + F.col("t")
            + 1
        )
        .cast("long")
        .alias("r2"),
    )
    m = ranked.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("long").alias("n2"),
        F.sum(F.col("t1") * F.col("r2")).cast("long").alias("r1_2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("long").alias("tie_sum"),
    )
    zexpr = (
        "(CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE)"
        " - CAST(n1 AS DOUBLE) * n2)"
        " / (2 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12)"
        "     * ((n1 + n2 + 1)"
        "        - CAST(tie_sum AS DOUBLE)"
        "          / ((n1 + n2) * (CAST(n1 AS DOUBLE) + n2 - 1)))))"
    )
    return m.select(
        F.col("n1").alias("n_urgent"),
        F.col("n2").alias("n_low"),
        F.expr("CAST(r1_2 - n1 * (n1 + 1) AS BIGINT)").alias("u_x2"),
        F.expr(f"CAST(floor(({zexpr}) * 1000) AS BIGINT)").alias(
            "z_e3"
        ),
        F.expr(
            f"CASE WHEN ABS({zexpr}) > 1.959964 THEN 1 ELSE 0 END"
        ).alias("significant"),
    )


# --------------------------- Croston intermittent-demand forecast

# Forecasting the LONG TAIL: most parts sell in a minority of months,
# where ordinary EWMA under-forecasts between demands.  Croston's
# method keeps two floor-EWMAs (alpha = 1/4) — nonzero demand size z
# and inter-demand interval p — updated only on arrival months, and
# forecasts z/p units per month.  The recursion folds over the
# month-ordered arrival sequence with a PACKED integer accumulator
# (z*1e10 + p*1e6 + month_index; DuckDB list_reduce mis-folds struct
# accumulators — the part_inventory_replay packing rule).  Init:
# z = first demand, p = 1.  Floor-EWMA quantization is the
# documented, deterministic arithmetic; valid while monthly demand
# stays under ~1e8 units (any TPC-H scale).
@register(
    "part_croston_forecast",
    """
    WITH monthly AS (
      SELECT l_partkey,
             CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) * 12
                  + EXTRACT(month FROM CAST(l_shipdate AS DATE))
               AS BIGINT) AS mi,
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
               AS d
      FROM lineitem GROUP BY 1, 2
    ),
    seqs AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_arrivals,
             list(d * 1000000 + mi ORDER BY mi) AS arr
      FROM monthly GROUP BY l_partkey
    ),
    folded AS (
      SELECT l_partkey, n_arrivals,
             list_reduce(
               list_prepend(
                 (arr[1] // 1000000) * 10000000000
                   + 1 * 1000000 + (arr[1] % 1000000),
                 arr[2:]),
               (a, e) ->
                 ((3 * (a // 10000000000) + (e // 1000000)) // 4)
                   * 10000000000
                 + ((3 * ((a % 10000000000) // 1000000)
                     + ((e % 1000000) - (a % 1000000))) // 4)
                   * 1000000
                 + (e % 1000000)) AS st
      FROM seqs
    )
    SELECT l_partkey,
           n_arrivals,
           CAST(st // 10000000000 AS BIGINT) AS z_units,
           CAST((st % 10000000000) // 1000000 AS BIGINT) AS p_months,
           CAST((st // 10000000000) * 1000000
                // ((st % 10000000000) // 1000000) AS BIGINT)
             AS croston_rate_ppm
    FROM folded ORDER BY l_partkey
    """,
)
def part_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston size/interval floor-EWMAs per part over arrival months
    only (no dense spine — intervals come from successive month
    indexes).  Plan: one fact rollup, one per-part collect of the
    arrival array, one integer HOF fold."""
    monthly = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            (
                F.year(F.col("l_shipdate").cast("date")) * 12
                + F.month(F.col("l_shipdate").cast("date"))
            )
            .cast("long")
            .alias("mi"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)")).alias("d")
        )
    )
    seqs = monthly.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_arrivals"),
        F.expr(
            "transform(array_sort(collect_list(struct(mi, d))),"
            " x -> x.d * 1000000 + x.mi)"
        ).alias("arr"),
    )
    fold = (
        # NB: Spark [] indexing is 0-based (DuckDB's is 1-based) —
        # element_at is 1-based on both engines' semantics.
        "aggregate(slice(arr, 2, size(arr) - 1),"
        " (element_at(arr, 1) div 1000000) * 10000000000"
        "   + 1 * 1000000 + (element_at(arr, 1) % 1000000),"
        " (a, e) ->"
        "   ((3 * (a div 10000000000) + (e div 1000000)) div 4)"
        "     * 10000000000"
        "   + ((3 * ((a % 10000000000) div 1000000)"
        "       + ((e % 1000000) - (a % 1000000))) div 4)"
        "     * 1000000"
        "   + (e % 1000000))"
    )
    folded = seqs.select(
        "l_partkey", "n_arrivals", F.expr(fold).alias("st")
    )
    return folded.select(
        "l_partkey",
        "n_arrivals",
        F.expr("CAST(st div 10000000000 AS BIGINT)").alias("z_units"),
        F.expr(
            "CAST((st % 10000000000) div 1000000 AS BIGINT)"
        ).alias("p_months"),
        F.expr(
            "CAST((st div 10000000000) * 1000000"
            " div ((st % 10000000000) div 1000000) AS BIGINT)"
        ).alias("croston_rate_ppm"),
    ).orderBy("l_partkey")


# --------------------------- Burrows' Delta stylometry

# Which sources WRITE alike?  Burrows' Delta — the standard
# authorship-attribution distance — over the corpus's top-30 terms:
# per-source relative frequencies (exact ppm), per-term z-scores
# across sources (deterministic doubles from int64 moments,
# zero-variance terms excluded by exact integer comparison), and the
# pairwise mean |z_a - z_b| folded in term order.  Near-zero Delta
# pairs are candidates for the same upstream generator — a
# contamination / dataset-collapse signal the dedup family can't see
# (no shared strings required).
BD_TOP_TERMS = 30


@register(
    "text_burrows_delta",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    cnt AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    stot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY 1
    ),
    topt AS (
      SELECT term FROM (
        SELECT term, CAST(SUM(c) AS BIGINT) AS g FROM cnt GROUP BY 1
        ORDER BY g DESC, term LIMIT {BD_TOP_TERMS})
    ),
    grid AS (
      SELECT s.source, t.term, s.tot FROM stot s CROSS JOIN topt t
    ),
    f AS (
      SELECT g.source, g.term,
             CAST(COALESCE(c.c, 0) * 1000000 // g.tot AS BIGINT) AS f
      FROM grid g
      LEFT JOIN cnt c ON c.source = g.source AND c.term = g.term
    ),
    mstat AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(f) AS BIGINT) AS sx,
             CAST(SUM(f * f) AS BIGINT) AS sxx
      FROM f GROUP BY term
    ),
    z AS (
      SELECT f.source, f.term,
             (CAST(f.f AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.ns)
             / sqrt(CAST(m.sxx AS DOUBLE) / m.ns
                    - (CAST(m.sx AS DOUBLE) / m.ns)
                      * (CAST(m.sx AS DOUBLE) / m.ns)) AS z
      FROM f JOIN mstat m USING (term)
      WHERE m.ns * m.sxx > m.sx * m.sx
    ),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb, a.term,
             ABS(a.z - b.z) AS dterm
      FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
    ),
    folded AS (
      SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(dterm ORDER BY term)), (x, y) -> x + y) AS dsum
      FROM pairs GROUP BY 1, 2
    )
    SELECT sa AS source_a, sb AS source_b, k AS n_terms,
           round(dsum / k, 9) AS delta
    FROM folded ORDER BY sa, sb
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Burrows' Delta between sources over the top-30 corpus
    terms.  Plan: one token pass to the (source, term) aggregate
    (localCheckpoint'ed — three consumers), then everything is
    |sources| x 30 sized: broadcast grid, z-scores, a 190-pair join
    with term-ordered folds."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()
    )
    stot = cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("tot")
    )
    topt = (
        cnt.groupBy("term")
        .agg(F.sum("c").cast("long").alias("g"))
        .orderBy(F.col("g").desc(), "term")
        .limit(BD_TOP_TERMS)
        .select("term")
    )
    grid = stot.crossJoin(F.broadcast(topt))
    f = grid.join(cnt, ["source", "term"], "left").select(
        "source",
        "term",
        F.expr(
            "CAST(COALESCE(c, 0) * 1000000 div tot AS BIGINT)"
        ).alias("f"),
    )
    mstat = f.groupBy("term").agg(
        F.count("*").cast("long").alias("ns"),
        F.sum("f").cast("long").alias("sx"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("sxx"),
    )
    z = (
        f.join(F.broadcast(mstat), "term")
        .where(
            F.col("ns") * F.col("sxx") > F.col("sx") * F.col("sx")
        )
        .select(
            "source",
            "term",
            F.expr(
                "(CAST(f AS DOUBLE) - CAST(sx AS DOUBLE) / ns)"
                " / sqrt(CAST(sxx AS DOUBLE) / ns"
                "        - (CAST(sx AS DOUBLE) / ns)"
                "          * (CAST(sx AS DOUBLE) / ns))"
            ).alias("z"),
        )
    )
    a = z.select(
        F.col("source").alias("sa"), "term", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("sb"),
        F.col("term").alias("term_b"),
        F.col("z").alias("zb"),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("term") == F.col("term_b")) & (F.col("sa") < F.col("sb")),
    ).select(
        "sa", "sb", "term", F.abs(F.col("za") - F.col("zb")).alias("dterm")
    )
    folded = pairs.groupBy("sa", "sb").agg(
        F.count("*").cast("long").alias("k"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(term, dterm))), x -> x.dterm),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("dsum"),
    )
    return folded.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        F.col("k").alias("n_terms"),
        F.expr("round(dsum / k, 9)").alias("delta"),
    ).orderBy("source_a", "source_b")


# --------------------------- streaming value-moments dual

# The same per-type moment table computed by a REAL streaming query
# (complete-mode power-sum state, availableNow drain) and held to the
# BATCH oracle byte-for-byte — integer power sums make stream/batch
# duality exact, so the driver hash-checks it like any batch query.
from data_pipeline_for_e_commerce_shop_spark.streaming import (  # noqa: E402
    windowed as _windowed,
)

register("events_stream_value_moments", ORACLES["events_value_moments"])(
    _windowed.stream_value_moments
)


# --------------------------- Markov removal-effect attribution

# The OTHER standard multi-touch attribution (beside position, time-
# decay, and Shapley, all implemented above): model journeys as a
# first-order Markov chain start -> channels -> conv/null, estimate
# P(conversion) by K rounds of floor-ppm value iteration, and credit
# each channel by its REMOVAL EFFECT — how much conversion drops when
# that channel's value is pinned to zero.  Every transition and every
# iteration is integer ppm with floor truncation, so the 5-variant
# trajectory replays exactly in the unrolled oracle (the pagerank
# unroll pattern); truncation at K=12 is shared by both sides.
MARKOV_ATTR_ITERS = 12
MARKOV_ATTR_CHANNELS = ("click", "error", "signup", "view")


def _markov_attr_oracle() -> str:
    variants = "', '".join(("none",) + MARKOV_ATTR_CHANNELS)
    head = f"""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS rn
      FROM events
    ),
    firstp AS (
      SELECT user_id, MIN(rn) AS prn FROM seq
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    j AS MATERIALIZED (
      SELECT s.user_id, s.rn,
             CASE WHEN s.event_type = 'purchase' THEN 'conv'
                  ELSE s.event_type END AS state
      FROM seq s LEFT JOIN firstp f ON f.user_id = s.user_id
      WHERE f.prn IS NULL OR s.rn <= f.prn
    ),
    trans AS (
      SELECT state AS src,
             LEAD(state) OVER (PARTITION BY user_id ORDER BY rn)
               AS dst
      FROM j
    ),
    raw_edges AS MATERIALIZED (
      SELECT 'start' AS src, state AS dst FROM j WHERE rn = 1
      UNION ALL
      SELECT src, COALESCE(dst, 'null') FROM trans
      WHERE src <> 'conv'
    ),
    cnt AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM raw_edges GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS t FROM cnt
            GROUP BY 1),
    p1 AS (
      SELECT c.src, c.dst, c.n * 1000000 // t.t AS p
      FROM cnt c JOIN tot t ON t.src = c.src
    ),
    edges2 AS MATERIALIZED (
      SELECT src, dst, p FROM p1
      UNION ALL SELECT 'conv', 'conv', CAST(1000000 AS BIGINT)
      UNION ALL SELECT 'null', 'null', CAST(1000000 AS BIGINT)
    ),
    states AS (
      SELECT DISTINCT src AS state FROM edges2
    ),
    variants AS (SELECT unnest(['{variants}']) AS removed),
    it0 AS (
      SELECT v.removed, s.state,
             CAST(CASE WHEN s.state = 'conv' THEN 1000000 ELSE 0 END
               AS BIGINT) AS val
      FROM states s CROSS JOIN variants v
    )"""
    its = []
    for k in range(1, MARKOV_ATTR_ITERS + 1):
        its.append(f""",
    it{k} AS (
      SELECT i.removed, e.src AS state,
             CAST(COALESCE(SUM(e.p * CASE WHEN i.state = i.removed
                                          THEN 0 ELSE i.val END), 0)
                  // 1000000 AS BIGINT) AS val
      FROM it{k - 1} i JOIN edges2 e ON e.dst = i.state
      GROUP BY 1, 2
    )""")
    K = MARKOV_ATTR_ITERS
    return head + "".join(its) + f""",
    base AS (
      SELECT val FROM it{K} WHERE removed = 'none' AND state = 'start'
    ),
    rem AS (
      SELECT removed AS channel, val FROM it{K}
      WHERE removed <> 'none' AND state = 'start'
    ),
    teff AS (
      SELECT CAST(SUM(b.val - r.val) AS BIGINT) AS tot
      FROM rem r CROSS JOIN base b
    )
    SELECT r.channel,
           CAST(b.val AS BIGINT) AS base_conv_ppm,
           CAST(r.val AS BIGINT) AS removed_conv_ppm,
           CAST(b.val - r.val AS BIGINT) AS effect_ppm,
           CAST(CASE WHEN t.tot > 0
                THEN (b.val - r.val) * 1000000 // t.tot
                ELSE 0 END AS BIGINT) AS share_ppm
    FROM rem r CROSS JOIN base b CROSS JOIN teff t
    ORDER BY r.channel
    """


@register("events_markov_attribution", _markov_attr_oracle())
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution over the journey Markov chain.
    Plan: the transition model builds distributed (one user-
    partitioned window pass to |states|^2 ppm edges); the 5-variant
    K=12 value iteration runs on the COLLECTED ~40-row edge table in
    Python with oracle-identical integer ops (model-sized state, the
    embedding_top_pc collect rule), then returns as a local frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_timestamp("ts"), "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    )
    firstp = (
        seq.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = (
        seq.join(firstp, "user_id", "left")
        .where(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
        .select(
            "user_id",
            "rn",
            F.when(F.col("event_type") == "purchase", "conv")
            .otherwise(F.col("event_type"))
            .alias("state"),
        )
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    trans = j.select(
        F.col("state").alias("src"),
        F.lead("state").over(wj).alias("dst"),
    )
    raw_edges = (
        j.where(F.col("rn") == 1)
        .select(F.lit("start").alias("src"), F.col("state").alias("dst"))
        .unionByName(
            trans.where(F.col("src") != "conv").select(
                "src", F.coalesce("dst", F.lit("null")).alias("dst")
            )
        )
    )
    cnt = raw_edges.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = cnt.groupBy("src").agg(F.sum("n").cast("long").alias("t"))
    p1 = (
        cnt.join(F.broadcast(tot), "src")
        .select("src", "dst", F.expr("n * 1000000 div t").alias("p"))
        .collect()
    )
    edges = [(r["src"], r["dst"], r["p"]) for r in p1]
    edges += [("conv", "conv", 1000000), ("null", "null", 1000000)]
    states = sorted({s for s, _, _ in edges})
    out_rows = []
    vals_by_variant = {}
    for removed in ("none",) + MARKOV_ATTR_CHANNELS:
        val = {s: (1000000 if s == "conv" else 0) for s in states}
        for _ in range(MARKOV_ATTR_ITERS):
            nxt = {}
            for s in states:
                acc = 0
                for src, dst, p in edges:
                    if src != s:
                        continue
                    v = 0 if dst == removed else val.get(dst, 0)
                    acc += p * v
                nxt[s] = acc // 1000000
            val = nxt
        vals_by_variant[removed] = val["start"]
    base = vals_by_variant["none"]
    total_eff = sum(
        base - vals_by_variant[c] for c in MARKOV_ATTR_CHANNELS
    )
    for c in MARKOV_ATTR_CHANNELS:
        eff = base - vals_by_variant[c]
        share = eff * 1000000 // total_eff if total_eff > 0 else 0
        out_rows.append((c, base, vals_by_variant[c], eff, share))
    return spark.createDataFrame(
        out_rows,
        "channel STRING, base_conv_ppm LONG, removed_conv_ppm LONG,"
        " effect_ppm LONG, share_ppm LONG",
    ).orderBy("channel")


# --------------------------- supplier OTIF rate

# On-Time-In-Full at ORDER granularity: a (supplier, order) pairing
# counts only if EVERY line that supplier contributed shipped within
# the shared SLA — one late line fails the whole delivery, which is
# how procurement actually scores it (line-level rates overstate
# performance; see supplier_lead_time_sla for the line view).
@register(
    "supplier_otif",
    f"""
    WITH per AS (
      SELECT l_suppkey, l_orderkey,
             MAX(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE))
                      > {SLA_LEAD_DAYS} THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    )
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(1 - late) AS BIGINT) AS n_otif,
           CAST(SUM(1 - late) * 1000000 // COUNT(*) AS BIGINT)
             AS otif_ppm
    FROM per GROUP BY 1 ORDER BY 1
    """,
)
def supplier_otif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-level OTIF per supplier (all-lines-within-SLA).  Plan:
    one fact-fact join, a (supplier, order) max-late rollup, a
    supplier rollup."""
    per = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_suppkey",
            F.col("l_shipdate").cast("date").alias("sd"),
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.col("o_orderdate").cast("date").alias("od"),
            ),
            "l_orderkey",
        )
        .groupBy("l_suppkey", "l_orderkey")
        .agg(
            F.max(
                F.when(
                    F.datediff("sd", "od") > SLA_LEAD_DAYS, 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    return (
        per.groupBy("l_suppkey")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(1 - F.col("late")).cast("long").alias("n_otif"),
            F.expr(
                "CAST(SUM(1 - late) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("otif_ppm"),
        )
        .orderBy("l_suppkey")
    )


# --------------------------- ABC class migration

# Is the ABC classification STABLE enough to set inventory policy on?
# Classify each part independently in the pre and post halves of the
# calendar (same integer boundary rule as part_abc_classes, same
# frozen split date as the DID screen), then cross-tabulate — heavy
# off-diagonal mass means annual reclassification cadence is too
# slow.  Parts absent from a half class as '-' (no demand).
@register(
    "part_abc_migration",
    f"""
    WITH halves AS (
      SELECT l_partkey,
             CASE WHEN CAST(l_shipdate AS DATE) >=
                       DATE '{DID_SPLIT_DATE}' THEN 1 ELSE 0 END
               AS post,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT post, CAST(SUM(cents) AS BIGINT) AS total
      FROM halves GROUP BY 1
    ),
    classed AS (
      SELECT h.l_partkey, h.post,
             CASE WHEN SUM(h.cents) OVER (PARTITION BY h.post
                    ORDER BY h.cents DESC, h.l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * 100 <= t.total * 80 THEN 'A'
                  WHEN SUM(h.cents) OVER (PARTITION BY h.post
                    ORDER BY h.cents DESC, h.l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * 100 <= t.total * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM halves h JOIN tot t ON t.post = h.post
    ),
    wide AS (
      SELECT COALESCE(a.l_partkey, b.l_partkey) AS l_partkey,
             COALESCE(a.abc, '-') AS abc_pre,
             COALESCE(b.abc, '-') AS abc_post
      FROM (SELECT l_partkey, abc FROM classed WHERE post = 0) a
      FULL OUTER JOIN
           (SELECT l_partkey, abc FROM classed WHERE post = 1) b
        ON b.l_partkey = a.l_partkey
    )
    SELECT abc_pre, abc_post, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER
                (PARTITION BY abc_pre) AS BIGINT) AS row_share_ppm
    FROM wide GROUP BY 1, 2
    ORDER BY abc_pre, abc_post
    """,
)
def part_abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre/post ABC cross-tab with exact integer class boundaries.
    Plan: one fact rollup to (part, half), per-half ranking windows
    on the key-reduced table, one full-outer self-align, a 4x4-at-
    most rollup."""
    from pyspark.sql import Window

    halves = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            F.when(
                F.col("l_shipdate").cast("date")
                >= F.lit(DID_SPLIT_DATE).cast("date"),
                1,
            )
            .otherwise(0)
            .alias("post"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("cents")
        )
        .localCheckpoint()
    )
    tot = halves.groupBy("post").agg(
        F.sum("cents").cast("long").alias("total")
    )
    wcum = (
        Window.partitionBy("post")
        .orderBy(F.col("cents").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    classed = (
        halves.join(F.broadcast(tot), "post")
        .select(
            "l_partkey",
            "post",
            F.when(
                F.sum("cents").over(wcum) * 100 <= F.col("total") * 80,
                "A",
            )
            .when(
                F.sum("cents").over(wcum) * 100 <= F.col("total") * 95,
                "B",
            )
            .otherwise("C")
            .alias("abc"),
        )
    )
    a = classed.where(F.col("post") == 0).select(
        "l_partkey", F.col("abc").alias("abc_pre")
    )
    b = classed.where(F.col("post") == 1).select(
        F.col("l_partkey").alias("pk_b"), F.col("abc").alias("abc_post")
    )
    wide = a.join(
        b, a["l_partkey"] == b["pk_b"], "full_outer"
    ).select(
        F.coalesce(F.col("abc_pre"), F.lit("-")).alias("abc_pre"),
        F.coalesce(F.col("abc_post"), F.lit("-")).alias("abc_post"),
    )
    wrow = Window.partitionBy("abc_pre")
    return (
        wide.groupBy("abc_pre", "abc_post")
        .agg(F.count("*").cast("long").alias("n_parts"))
        .select(
            "abc_pre",
            "abc_post",
            "n_parts",
            F.expr(
                "CAST(n_parts * 1000000 div SUM(n_parts) OVER"
                " (PARTITION BY abc_pre) AS BIGINT)"
            ).alias("row_share_ppm"),
        )
        .orderBy("abc_pre", "abc_post")
    )


# --------------------------- IDF-weighted Jaccard verify

# Plain Jaccard scores boilerplate overlap and rare-content overlap
# identically; the IDF-weighted variant discounts shingles every doc
# has (w = floor(ln(N/df)*1000), exact integer sums), separating
# "shares a template" from "shares content" on the SAME LSH
# candidates.  N rides the oracle as a CTE (operator interpolates its
# own count — both are the exact document count, no drift).
register(
    "dedup_weighted_jaccard",
    _SHINGLE_CTE
    + """
    , dfreq AS (
      SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh
      GROUP BY 1
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    idf AS (
      SELECT shingle,
             CAST(floor(ln(CAST(n AS DOUBLE) / df) * 1000) AS BIGINT)
               AS w
      FROM dfreq CROSS JOIN nd
    ),
    sides AS (
      SELECT doc_a, doc_b, shingle,
             MAX(ina) AS ina, MAX(inb) AS inb
      FROM (
        SELECT c.doc_a, c.doc_b, s.shingle, 1 AS ina, 0 AS inb
        FROM cand c JOIN sh s ON s.doc_id = c.doc_a
        UNION ALL
        SELECT c.doc_a, c.doc_b, s.shingle, 0, 1
        FROM cand c JOIN sh s ON s.doc_id = c.doc_b
      ) GROUP BY 1, 2, 3
    ),
    sums AS (
      SELECT doc_a, doc_b,
             CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN w ELSE 0 END)
               AS BIGINT) AS w_shared,
             CAST(SUM(w) AS BIGINT) AS w_union,
             CAST(SUM(ina * inb) AS BIGINT) AS n_shared,
             CAST(COUNT(*) AS BIGINT) AS n_union
      FROM sides JOIN idf USING (shingle)
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared, n_union,
           CAST(n_shared * 1000000 // n_union AS BIGINT)
             AS jaccard_ppm,
           CAST(CASE WHEN w_union > 0
                THEN w_shared * 1000000 // w_union ELSE 0 END
             AS BIGINT) AS wjaccard_ppm
    FROM sums ORDER BY doc_a, doc_b
    """,
)(dedup.weighted_jaccard_pairs)


# --------------------------- Kruskal-Wallis lead-time test

# Does fulfillment lead time differ across ALL FIVE order priorities,
# not just the URGENT-vs-LOW pair priority_mannwhitney_leadtime
# tests?  Kruskal-Wallis H is the k-sample generalisation of
# Mann-Whitney: rank every lead time jointly (histogram-derived
# doubled average ranks, never a row-level global sort), sum ranks
# per priority, and compare to the uniform-rank expectation with the
# tie correction.  Integer bounds: doubled rank sums r2g <= 2N^2 and
# per-bin tie terms t^3 stay inside int64 for N < ~2e9 rows and bins
# < ~2e6 rows (sf0.1 is ~6e5 / ~5e3); the 5-term H fold is a
# key-ordered aggregate (the ANOVA lesson), never a bare SUM.
KW_CHI2_CRIT_DF4 = "9.487729"  # chi2 0.95 quantile, df = k-1 = 4

_KW_HPRIME = (
    "(12 * s / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))"
    " - 3 * (CAST(n AS DOUBLE) + 1))"
    " / (1 - CAST(tie_sum AS DOUBLE)"
    "     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    "        - CAST(n AS DOUBLE)))"
)


@register(
    "priority_kruskal_wallis",
    f"""
    WITH lines AS (
      SELECT o_orderpriority AS grp,
             datediff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    cells AS (
      SELECT grp, days, CAST(COUNT(*) AS BIGINT) AS tg
      FROM lines GROUP BY 1, 2
    ),
    hist AS (
      SELECT days, CAST(SUM(tg) AS BIGINT) AS t FROM cells GROUP BY 1
    ),
    ranked AS (
      SELECT days, t,
             CAST(2 * COALESCE(SUM(t) OVER (ORDER BY days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS BIGINT) AS r2
      FROM hist
    ),
    per_grp AS (
      SELECT c.grp, CAST(SUM(c.tg) AS BIGINT) AS ng,
             CAST(SUM(c.tg * r.r2) AS BIGINT) AS r2g
      FROM cells c JOIN ranked r ON c.days = r.days
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
      FROM hist
    ),
    folded AS (
      SELECT t.n, t.tie_sum,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM per_grp) AS k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               (SELECT list((CAST(r2g AS DOUBLE) / 2)
                            * (CAST(r2g AS DOUBLE) / 2) / ng
                       ORDER BY grp) FROM per_grp)),
               (a, b) -> a + b) AS s
      FROM tot t
    ),
    fin AS (
      SELECT n, k, {_KW_HPRIME} AS hprime FROM folded
    )
    SELECT n, k,
           CAST(floor(hprime * 1000) AS BIGINT) AS h_e3,
           CAST(floor((hprime - CAST(k AS DOUBLE) + 1)
             / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) * 1000000)
             AS BIGINT) AS epsilon_sq_e6,
           CASE WHEN hprime > {KW_CHI2_CRIT_DF4} THEN 1 ELSE 0 END
             AS significant
    FROM fin
    """,
)
def priority_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across all five order priorities on
    fulfillment lead time (days order->ship): fact-fact equi join,
    one (priority x days) rollup, a ~130-row value histogram with a
    window cumsum for doubled average ranks, a 5-row per-group rank
    sum, and a key-ordered 5-term fold for H — the k-sample
    complement to priority_mannwhitney_leadtime (reference batch
    stats scope: scripts/transformation.py aggregations).  Tie
    correction exact from integer bin counts; epsilon-squared effect
    size and the frozen df=4 critical value ride along."""
    from pyspark.sql import Window

    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.col("o_orderdate").cast("date").alias("od"),
                F.col("o_orderpriority").alias("grp"),
            ),
            "l_orderkey",
        )
        .select("grp", F.datediff("sd", "od").alias("days"))
    )
    cells = lines.groupBy("grp", "days").agg(
        F.count(F.lit(1)).cast("long").alias("tg")
    )
    hist = cells.groupBy("days").agg(F.sum("tg").cast("long").alias("t"))
    wd = Window.orderBy("days").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "days",
        "t",
        (
            2 * F.coalesce(F.sum("t").over(wd), F.lit(0).cast("long"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    per_grp = (
        cells.join(F.broadcast(ranked.select("days", "r2")), "days")
        .groupBy("grp")
        .agg(
            F.sum("tg").cast("long").alias("ng"),
            F.sum(F.col("tg") * F.col("r2")).cast("long").alias("r2g"),
        )
    )
    tot = hist.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_sum"),
    )
    folded = per_grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.expr(
            "aggregate(array_sort(collect_list(named_struct("
            " 'key', grp,"
            " 'v', (CAST(r2g AS DOUBLE) / 2) * (CAST(r2g AS DOUBLE) / 2)"
            "      / ng))),"
            " CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)"
        ).alias("s"),
    )
    fin = folded.crossJoin(F.broadcast(tot)).select(
        "n", "k", F.expr(f"{_KW_HPRIME}").alias("hprime")
    )
    return fin.select(
        "n",
        "k",
        F.expr("CAST(floor(hprime * 1000) AS BIGINT)").alias("h_e3"),
        F.expr(
            "CAST(floor((hprime - CAST(k AS DOUBLE) + 1)"
            " / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) * 1000000)"
            " AS BIGINT)"
        ).alias("epsilon_sq_e6"),
        F.expr(
            f"CASE WHEN hprime > {KW_CHI2_CRIT_DF4} THEN 1 ELSE 0 END"
        ).alias("significant"),
    )


# --------------------------- Cramer's V nation-segment association

# discount_tax_independence reports a raw chi-square, which grows
# with N even for a fixed (tiny) association — useless for comparing
# tables of different sizes.  Cramer's V normalises it to [0, 1], and
# the Bergsma bias-corrected V additionally removes the positive bias
# that makes V > 0 on pure noise.  Tested on the (nation x market
# segment) customer contingency table, where independence SHOULD hold
# by construction — V near 0 is the expected reading.
@register(
    "nation_segment_cramers_v",
    """
    WITH cells AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM customer GROUP BY 1, 2
    ),
    mr AS (SELECT nk, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    mc AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                  CAST(COUNT(DISTINCT nk) AS BIGINT) AS nr,
                  CAST(COUNT(DISTINCT seg) AS BIGINT) AS nc
           FROM cells),
    terms AS (
      SELECT ce.nk, ce.seg,
             (CAST(ce.o AS DOUBLE) - CAST(mr.r AS DOUBLE) * mc.c / nn.n)
             * (CAST(ce.o AS DOUBLE) - CAST(mr.r AS DOUBLE) * mc.c / nn.n)
             / (CAST(mr.r AS DOUBLE) * mc.c / nn.n) AS t
      FROM cells ce JOIN mr ON ce.nk = mr.nk
      JOIN mc ON ce.seg = mc.seg CROSS JOIN nn
    ),
    chi AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               (SELECT list(t ORDER BY nk, seg) FROM terms)),
               (a, b) -> a + b) AS chi2
    ),
    fin AS (
      SELECT nn.n, nn.nr, nn.nc, chi.chi2,
             chi.chi2 / nn.n AS phi2,
             GREATEST(chi.chi2 / nn.n
               - CAST((nn.nr - 1) * (nn.nc - 1) AS DOUBLE) / (nn.n - 1),
               CAST(0 AS DOUBLE)) AS phi2c,
             CAST(nn.nr AS DOUBLE)
               - CAST((nn.nr - 1) * (nn.nr - 1) AS DOUBLE) / (nn.n - 1)
               AS rc,
             CAST(nn.nc AS DOUBLE)
               - CAST((nn.nc - 1) * (nn.nc - 1) AS DOUBLE) / (nn.n - 1)
               AS cc
      FROM nn CROSS JOIN chi
    )
    SELECT n, nr AS n_nations, nc AS n_segments,
           CAST(floor(chi2 * 1000) AS BIGINT) AS chi2_e3,
           CAST(floor(sqrt(phi2 / (LEAST(nr, nc) - 1)) * 1000000)
             AS BIGINT) AS v_e6,
           CAST(floor(sqrt(phi2c / LEAST(rc - 1, cc - 1)) * 1000000)
             AS BIGINT) AS v_corr_e6
    FROM fin
    """,
)
def nation_segment_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V (plain and Bergsma bias-corrected) for the
    (nation, market segment) customer contingency table: one dim-table
    rollup to the 25x5 grid, broadcast margins, per-cell chi-square
    terms from exact integer counts, key-ordered fold (the ANOVA
    lesson), then the V normalisations in doubles.  Everything after
    the first rollup is vocabulary-sized."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    )
    cells = cust.groupBy("nk", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    mr = cells.groupBy("nk").agg(F.sum("o").cast("long").alias("r"))
    mc = cells.groupBy("seg").agg(F.sum("o").cast("long").alias("c"))
    nn = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("nk").cast("long").alias("nr"),
        F.countDistinct("seg").cast("long").alias("nc"),
    )
    terms = (
        cells.join(F.broadcast(mr), "nk")
        .join(F.broadcast(mc), "seg")
        .crossJoin(F.broadcast(nn))
        .select(
            "nk",
            "seg",
            "n",
            "nr",
            "nc",
            F.expr(
                "(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)"
                " * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)"
                " / (CAST(r AS DOUBLE) * c / n)"
            ).alias("t"),
        )
    )
    fin = terms.groupBy("n", "nr", "nc").agg(
        F.expr(
            "aggregate(array_sort(collect_list("
            " named_struct('k1', nk, 'k2', seg, 'v', t))),"
            " CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)"
        ).alias("chi2")
    ).select(
        "n",
        "nr",
        "nc",
        "chi2",
        F.expr("chi2 / n").alias("phi2"),
        F.expr(
            "GREATEST(chi2 / n"
            " - CAST((nr - 1) * (nc - 1) AS DOUBLE) / (n - 1),"
            " CAST(0 AS DOUBLE))"
        ).alias("phi2c"),
        F.expr(
            "CAST(nr AS DOUBLE)"
            " - CAST((nr - 1) * (nr - 1) AS DOUBLE) / (n - 1)"
        ).alias("rc"),
        F.expr(
            "CAST(nc AS DOUBLE)"
            " - CAST((nc - 1) * (nc - 1) AS DOUBLE) / (n - 1)"
        ).alias("cc"),
    )
    return fin.select(
        "n",
        F.col("nr").alias("n_nations"),
        F.col("nc").alias("n_segments"),
        F.expr("CAST(floor(chi2 * 1000) AS BIGINT)").alias("chi2_e3"),
        F.expr(
            "CAST(floor(sqrt(phi2 / (LEAST(nr, nc) - 1)) * 1000000)"
            " AS BIGINT)"
        ).alias("v_e6"),
        F.expr(
            "CAST(floor(sqrt(phi2c / LEAST(rc - 1, cc - 1)) * 1000000)"
            " AS BIGINT)"
        ).alias("v_corr_e6"),
    )


# --------------------------- local clustering coefficient

# part_triangles counts triangle participation but a raw count can't
# separate a coherent accessory cluster (small dense ego-net) from a
# big hub that happens to touch many triangles.  The local clustering
# coefficient normalises by the wedge capacity deg·(deg−1)/2; zero-
# triangle nodes with deg >= 2 stay in the result because cc = 0 is
# signal.  Exact ppm integers end to end.
register(
    "graph_clustering_coeff",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {graph.MIN_SUPPORT}
    ),
    deg AS (
      SELECT part_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS part_id FROM e UNION ALL SELECT b FROM e
      ) GROUP BY 1
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tcount AS (
      SELECT part_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS part_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    )
    SELECT d.part_id, d.deg,
           CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(2 * COALESCE(t.n_triangles, 0) * 1000000
                // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_ppm
    FROM deg d LEFT JOIN tcount t ON d.part_id = t.part_id
    WHERE d.deg >= 2
    ORDER BY d.part_id
    """,
)(graph.clustering_coefficient)


# --------------------------- l-diversity release audit

# k-anonymity (customer_k_anonymity) is NECESSARY but not sufficient:
# a 1000-row equivalence class whose members all share one account-
# balance band still discloses the band to anyone who knows the
# quasi-identifiers.  l-diversity audits the sensitive-value spread
# per class — distinct-l plus entropy l-diversity, flagged below the
# release floor.  The generic operator lives in quality/privacy.py
# beside k_anonymity; interpolating L_DIV_MIN keeps operator and
# oracle in lockstep (reference privacy scope: the validation gates
# of lambda/s3_validation.py applied to a release review).
L_DIV_MIN = 3


@register(
    "customer_l_diversity",
    f"""
    WITH vals AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT)
               AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS n_i
      FROM customer GROUP BY 1, 2, 3
    ),
    per_class AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(SUM(n_i) AS BIGINT) AS class_size,
             CAST(COUNT(*) AS BIGINT) AS l_distinct,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(n_i AS DOUBLE) * ln(CAST(n_i AS DOUBLE))
                    ORDER BY bal_band)),
               (a, b) -> a + b) AS sum_nlnn
      FROM vals GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
           CAST(floor((ln(CAST(class_size AS DOUBLE))
             - sum_nlnn / CAST(class_size AS DOUBLE)) * 1000000)
             AS BIGINT) AS entropy_me6,
           l_distinct < {L_DIV_MIN} AS below_l
    FROM per_class
    """,
)
def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of customer over the (nation, segment)
    quasi-identifiers with the account-balance thousand-band as the
    sensitive attribute: distinct-l and entropy l-diversity per
    equivalence class via quality.privacy.l_diversity (two stacked
    map-side-combined groupBys; key-ordered entropy fold)."""
    from data_pipeline_for_e_commerce_shop_spark.quality.privacy import (
        l_diversity,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT)"
        ).alias("bal_band"),
    )
    return l_diversity(
        cust, ["c_nationkey", "c_mktsegment"], "bal_band", L_DIV_MIN
    )


# --------------------------- DP sensitivity / contribution-bound audit

# Before a per-category revenue release can be differentially
# privatized (or before user data feeds a training corpus with
# per-user contribution caps), you need the USER-LEVEL SENSITIVITY:
# how much can one customer move each released aggregate?  Reports,
# per category, the max single-user contribution, its share of the
# total, and the p99 contribution — the clipping threshold a
# bounded-contribution release would use (clip at p99, pay the max
# share as bias).  Everything is exact integer cents.
@register(
    "category_dp_sensitivity",
    """
    WITH uc AS (
      SELECT p_type AS category, o_custkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(MAX(cents) AS BIGINT) AS max_user_cents,
           CAST(MAX(cents) * 1000000 // SUM(cents) AS BIGINT)
             AS max_share_ppm,
           CAST(quantile_disc(cents, 0.99) AS BIGINT) AS clip_p99_cents
    FROM uc GROUP BY 1 ORDER BY 1
    """,
)
def category_dp_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level sensitivity audit of the per-category revenue
    aggregate: one (customer x category) rollup (the natural key
    distribution — map-side combined), then a category rollup carrying
    max, share, and the exact p99 clipping threshold
    (percentile_disc).  Fact-fact join equi-keyed on orderkey; part is
    dim-sized and broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "cents1"
        ),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    uc = (
        li.join(orders, "l_orderkey")
        .join(F.broadcast(part), "l_partkey")
        .groupBy("category", "o_custkey")
        .agg(F.sum("cents1").cast("long").alias("cents"))
    )
    return (
        uc.groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.max("cents").cast("long").alias("max_user_cents"),
            F.expr(
                "percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)"
            ).cast("long").alias("clip_p99_cents"),
        )
        .select(
            "category",
            "n_users",
            "total_cents",
            "max_user_cents",
            F.expr(
                "CAST(max_user_cents * 1000000 div total_cents"
                " AS BIGINT)"
            ).alias("max_share_ppm"),
            "clip_p99_cents",
        )
        .orderBy("category")
    )


# --------------------------- Fisher ideal price index

# category_price_index is Laspeyres-only (base-period basket), which
# overstates inflation when buyers substitute away from price rises;
# Paasche (current basket) understates it.  The Fisher ideal index is
# their geometric mean and the standard the statistical agencies
# publish.  Two frozen periods (first vs last calendar half), matched
# parts only, unit prices as exact integer cents-per-unit.
@register(
    "category_fisher_index",
    f"""
    WITH pm AS (
      SELECT p_type AS category, l_partkey,
             CASE WHEN CAST(l_shipdate AS DATE) >=
                       DATE '{DID_SPLIT_DATE}' THEN 1 ELSE 0 END AS per,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2, 3
    ),
    matched AS (
      SELECT b.category, b.l_partkey,
             b.cents // b.qty AS p0, b.qty AS q0,
             c.cents // c.qty AS p1, c.qty AS q1
      FROM pm b JOIN pm c ON b.category = c.category
                         AND b.l_partkey = c.l_partkey
      WHERE b.per = 0 AND c.per = 1
    ),
    sums AS (
      SELECT category, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(p1 * q0) AS BIGINT) AS l_num,
             CAST(SUM(p0 * q0) AS BIGINT) AS l_den,
             CAST(SUM(p1 * q1) AS BIGINT) AS p_num,
             CAST(SUM(p0 * q1) AS BIGINT) AS p_den
      FROM matched GROUP BY 1
    )
    SELECT category, n_parts,
           CAST(l_num * 1000000 // l_den AS BIGINT) AS laspeyres_ppm,
           CAST(p_num * 1000000 // p_den AS BIGINT) AS paasche_ppm,
           CAST(floor(sqrt((CAST(l_num AS DOUBLE) / l_den)
                           * (CAST(p_num AS DOUBLE) / p_den)) * 1000000)
             AS BIGINT) AS fisher_ppm
    FROM sums ORDER BY category
    """,
)
def category_fisher_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher ideal price index per category between the frozen
    pre/post halves (same split date as the DID screen): one
    (category, part, period) rollup, a matched-parts self-join
    equi-keyed on (category, part) — period-0 rows against period-1
    rows, never a blowup — then Laspeyres/Paasche exact-ppm ratios and
    their geometric mean in doubles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            f"CASE WHEN CAST(l_shipdate AS DATE) >="
            f" DATE '{DID_SPLIT_DATE}' THEN 1 ELSE 0 END"
        ).alias("per"),
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "cents1"
        ),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty1"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    pm = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("category", "l_partkey", "per")
        .agg(
            F.sum("cents1").cast("long").alias("cents"),
            F.sum("qty1").cast("long").alias("qty"),
        )
    )
    b = pm.where(F.col("per") == 0).select(
        "category",
        "l_partkey",
        F.expr("cents div qty").alias("p0"),
        F.col("qty").alias("q0"),
    )
    c = pm.where(F.col("per") == 1).select(
        "category",
        "l_partkey",
        F.expr("cents div qty").alias("p1"),
        F.col("qty").alias("q1"),
    )
    sums = (
        b.join(c, ["category", "l_partkey"])
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum(F.col("p1") * F.col("q0")).cast("long").alias("l_num"),
            F.sum(F.col("p0") * F.col("q0")).cast("long").alias("l_den"),
            F.sum(F.col("p1") * F.col("q1")).cast("long").alias("p_num"),
            F.sum(F.col("p0") * F.col("q1")).cast("long").alias("p_den"),
        )
    )
    return sums.select(
        "category",
        "n_parts",
        F.expr("CAST(l_num * 1000000 div l_den AS BIGINT)").alias(
            "laspeyres_ppm"
        ),
        F.expr("CAST(p_num * 1000000 div p_den AS BIGINT)").alias(
            "paasche_ppm"
        ),
        F.expr(
            "CAST(floor(sqrt((CAST(l_num AS DOUBLE) / l_den)"
            " * (CAST(p_num AS DOUBLE) / p_den)) * 1000000) AS BIGINT)"
        ).alias("fisher_ppm"),
    ).orderBy("category")


# --------------------------- edit-distance dedup verify

# Character-level rung of the dedup verify ladder: token-level Jaccard
# dilutes near-dups that differ by IN-token edits (typos, number
# swaps); Levenshtein on a frozen prefix catches them.  Both engines
# run their built-in levenshtein on identical prefixes, so the
# integer distances agree exactly.
register(
    "dedup_edit_distance",
    _SHINGLE_CTE
    + f"""
    , pairs AS (
      SELECT c.doc_a, c.doc_b,
             substr(da.text, 1, {dedup.EDIT_PREFIX_CHARS}) AS ta,
             substr(db.text, 1, {dedup.EDIT_PREFIX_CHARS}) AS tb
      FROM cand c
      JOIN documents da ON c.doc_a = da.doc_id
      JOIN documents db ON c.doc_b = db.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta, tb) AS BIGINT) AS edit_distance,
           CAST((GREATEST(len(ta), len(tb)) - levenshtein(ta, tb))
                * 1000000 // GREATEST(len(ta), len(tb)) AS BIGINT)
             AS edit_sim_ppm
    FROM pairs ORDER BY doc_a, doc_b
    """,
)(dedup.edit_distance_pairs)


# --------------------------- Theil inequality decomposition

# revenue_gini gives ONE inequality number; the Theil T index is the
# one that DECOMPOSES exactly: total = between-nations + revenue-share-
# weighted within-nation terms, so you can say how much of customer
# revenue inequality is geography vs within-market spread.  Per-nation
# within-Theil folds in customer-key order (the ANOVA lesson); the
# between term needs only the 25-row nation rollup.
@register(
    "nation_theil_inequality",
    """
    WITH cx AS (
      SELECT c_nationkey AS nk, o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(x) AS BIGINT) AS xg
      FROM cx GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(x) AS BIGINT) AS xt,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM cx
    ),
    w AS (
      SELECT c.nk, g.ng, g.xg,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(c.x AS DOUBLE) / g.xg)
                    * ln(CAST(c.x AS DOUBLE) * g.ng / g.xg)
                    ORDER BY c.o_custkey)),
               (a, b) -> a + b) AS tg
      FROM cx c JOIN g ON c.nk = g.nk
      GROUP BY 1, 2, 3
    )
    SELECT w.nk AS c_nationkey, w.ng AS n_cust, w.xg AS cents,
           CAST(w.xg * 1000000 // t.xt AS BIGINT) AS share_ppm,
           CAST(floor(w.tg * 1000000) AS BIGINT) AS theil_within_me6,
           CAST(floor((CAST(w.xg AS DOUBLE) / t.xt)
             * ln(CAST(w.xg AS DOUBLE) * t.nt
                  / (CAST(t.xt AS DOUBLE) * w.ng))
             * 1000000) AS BIGINT) AS between_term_me6
    FROM w CROSS JOIN tot t
    ORDER BY 1
    """,
)
def nation_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T decomposition of customer revenue inequality by nation:
    one (nation, customer) exact-cents rollup, a 25-row nation rollup
    broadcast back for the within-nation Theil folds (customer-key
    order), and a 1-row grand-total crossJoin for shares and the
    between-nation terms.  total_theil = Σ between_term +
    Σ share·theil_within, exactly."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias(
            "cents1"
        ),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nk"),
    )
    cx = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("nk", "o_custkey")
        .agg(F.sum("cents1").cast("long").alias("x"))
    )
    g = cx.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("long").alias("xg"),
    )
    tot = cx.agg(
        F.sum("x").cast("long").alias("xt"),
        F.count(F.lit(1)).cast("long").alias("nt"),
    )
    w = (
        cx.join(F.broadcast(g), "nk")
        .groupBy("nk", "ng", "xg")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(named_struct("
                " 'key', o_custkey,"
                " 'v', (CAST(x AS DOUBLE) / xg)"
                "      * ln(CAST(x AS DOUBLE) * ng / xg)))),"
                " CAST(0.0 AS DOUBLE), (a, q) -> a + q.v)"
            ).alias("tg")
        )
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            F.col("nk").alias("c_nationkey"),
            F.col("ng").alias("n_cust"),
            F.col("xg").alias("cents"),
            F.expr("CAST(xg * 1000000 div xt AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr("CAST(floor(tg * 1000000) AS BIGINT)").alias(
                "theil_within_me6"
            ),
            F.expr(
                "CAST(floor((CAST(xg AS DOUBLE) / xt)"
                " * ln(CAST(xg AS DOUBLE) * nt"
                "      / (CAST(xt AS DOUBLE) * ng))"
                " * 1000000) AS BIGINT)"
            ).alias("between_term_me6"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------- sequential A/B monitoring (SPRT)

# The fixed-horizon tests (ab_test_report, events_power_analysis)
# require committing to a sample size up front; Wald's SPRT is the
# sequential complement — monitor the treatment arm's conversion
# stream daily and stop the moment the evidence crosses a boundary.
# Design constants are frozen percents interpolated into BOTH sides;
# the log-likelihood coefficients and the ln(19) boundaries
# (alpha = beta = 0.05) are computed in-engine from exact integer
# ratios, so the doubles agree bit-for-bit.
SPRT_P0_PCT = 25  # H0 conversion rate (percent)
SPRT_P1_PCT = 30  # H1 conversion rate (percent)


@register(
    "ab_sequential_sprt",
    f"""
    WITH u AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS day,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events
      WHERE CAST(('0x' || substr(md5('ab-' || CAST(user_id AS VARCHAR)),
                  1, 8)) AS BIGINT) % 2 = 1
      GROUP BY 1
    ),
    d AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM u GROUP BY 1
    ),
    c AS (
      SELECT day, n_users, n_conv,
             SUM(n_conv * ln(CAST({SPRT_P1_PCT} AS DOUBLE)
                             / {SPRT_P0_PCT})
                 + (n_users - n_conv)
                   * ln(CAST({100 - SPRT_P1_PCT} AS DOUBLE)
                        / {100 - SPRT_P0_PCT}))
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_llr
      FROM d
    )
    SELECT day, n_users, n_conv,
           CAST(floor(cum_llr * 1000000) AS BIGINT) AS cum_llr_e6,
           CASE WHEN cum_llr >= ln(CAST(19 AS DOUBLE)) THEN 'accept_h1'
                WHEN cum_llr <= -ln(CAST(19 AS DOUBLE)) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c ORDER BY day
    """,
)
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT monitor over the treatment arm (same md5 hash
    assignment and conversion rule as ab_test_report): per-user
    arrival day + converted flag, a day rollup, one window cumsum of
    the exact-coefficient log-likelihood ratio, and the boundary
    classification per day.  One user-key shuffle, one ~90-row window
    — the daily dashboard a sequential experiment runs on."""
    from pyspark.sql import Window
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(portable_hash32(F.col("user_id"), prefix="ab-") % 2 == 1)
        .groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("day"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 150),
                    1,
                ).otherwise(0)
            ).alias("converted"),
        )
    )
    d = u.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    llr = F.expr(
        f"n_conv * ln(CAST({SPRT_P1_PCT} AS DOUBLE) / {SPRT_P0_PCT})"
        f" + (n_users - n_conv)"
        f"   * ln(CAST({100 - SPRT_P1_PCT} AS DOUBLE)"
        f"        / {100 - SPRT_P0_PCT})"
    )
    c = d.select(
        "day", "n_users", "n_conv", F.sum(llr).over(wd).alias("cum_llr")
    )
    return c.select(
        "day",
        "n_users",
        "n_conv",
        F.expr("CAST(floor(cum_llr * 1000000) AS BIGINT)").alias(
            "cum_llr_e6"
        ),
        F.expr(
            "CASE WHEN cum_llr >= ln(CAST(19 AS DOUBLE))"
            " THEN 'accept_h1'"
            " WHEN cum_llr <= -ln(CAST(19 AS DOUBLE))"
            " THEN 'accept_h0'"
            " ELSE 'continue' END"
        ).alias("decision"),
    ).orderBy("day")


# --------------------------- Fellegi-Sunter record linkage

# The classic probabilistic record-linkage shape every entity-
# resolution pipeline runs: block, compare fields, sum frozen
# log-ratio agreement weights, classify by thresholds.  The "dirty"
# side is derived deterministically (md5-gated truncations /
# perturbations of name, balance, segment), so ground truth is known
# and the decision table doubles as the linkage quality report.
# The score expression is ONE shared string — Spark and the oracle
# cannot drift.  Blocking on (nation, balance thousand-band) keeps
# candidate pairs ~linear in rows; the +100000 shift keeps the band
# division on positive integers (negative integer division floors in
# DuckDB but truncates in Spark).
_RL_SCORE = (
    "(CASE WHEN d_name = c_name THEN 450 ELSE -120 END"
    " + CASE WHEN d_cents = c_cents THEN 380 ELSE -140 END"
    " + CASE WHEN d_seg = c_mktsegment THEN 120 ELSE -80 END)"
)


@register(
    "customer_record_linkage",
    f"""
    WITH base AS (
      SELECT c_custkey, c_name, c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS c_cents,
             CAST(('0x' || substr(md5('rl-'
                   || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      FROM customer
    ),
    dirty AS (
      SELECT c_custkey AS d_key, c_nationkey AS nk,
             CASE WHEN h % 10 < 3
                  THEN substr(c_name, 1, length(c_name) - 1)
                  ELSE c_name END AS d_name,
             CASE WHEN h % 7 < 2 THEN c_cents + 1
                  ELSE c_cents END AS d_cents,
             CASE WHEN h % 13 < 2 THEN 'UNKNOWN'
                  ELSE c_mktsegment END AS d_seg
      FROM base
    ),
    pairs AS (
      SELECT d.d_key, b.c_custkey AS c_key, d.d_name, b.c_name,
             d.d_cents, b.c_cents, d.d_seg, b.c_mktsegment,
             {_RL_SCORE} AS score
      FROM dirty d JOIN base b
        ON d.nk = b.c_nationkey
       AND (d.d_cents + 100000) // 100000
           = (b.c_cents + 100000) // 100000
    ),
    classed AS (
      SELECT d_key, c_key, score,
             CASE WHEN score >= 600 THEN 'match'
                  WHEN score >= 200 THEN 'possible'
                  ELSE 'non_match' END AS decision,
             CASE WHEN d_key = c_key THEN 1 ELSE 0 END AS is_true
      FROM pairs
    )
    SELECT decision, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_true) AS BIGINT) AS n_true,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM classed GROUP BY 1 ORDER BY 1
    """,
)
def customer_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage of a deterministically-dirtied customer
    copy back to the clean table: (nation, balance-band) blocking
    keeps candidate pairs ~linear in rows (the all-pairs killer at
    100 TB), per-field exact comparisons sum frozen agreement weights
    (shared expression string), and the match/possible/non_match
    decision table carries ground-truth counts because the dirty side
    derives from known keys."""
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_nationkey",
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("c_cents"),
        portable_hash32(F.col("c_custkey"), prefix="rl-").alias("h"),
    )
    dirty = base.select(
        F.col("c_custkey").alias("d_key"),
        F.col("c_nationkey").alias("nk"),
        F.expr(
            "CASE WHEN h % 10 < 3"
            " THEN substr(c_name, 1, length(c_name) - 1)"
            " ELSE c_name END"
        ).alias("d_name"),
        F.expr(
            "CASE WHEN h % 7 < 2 THEN c_cents + 1 ELSE c_cents END"
        ).alias("d_cents"),
        F.expr(
            "CASE WHEN h % 13 < 2 THEN 'UNKNOWN'"
            " ELSE c_mktsegment END"
        ).alias("d_seg"),
    )
    pairs = dirty.withColumn(
        "blk", F.expr("(d_cents + 100000) div 100000")
    ).join(
        base.select(
            F.col("c_custkey").alias("c_key"),
            "c_name",
            "c_mktsegment",
            "c_cents",
            F.col("c_nationkey").alias("nk"),
            F.expr("(c_cents + 100000) div 100000").alias("blk"),
        ),
        ["nk", "blk"],
    )
    classed = pairs.select(
        "d_key",
        "c_key",
        F.expr(_RL_SCORE).alias("score"),
    ).select(
        "d_key",
        "c_key",
        "score",
        F.expr(
            "CASE WHEN score >= 600 THEN 'match'"
            " WHEN score >= 200 THEN 'possible'"
            " ELSE 'non_match' END"
        ).alias("decision"),
        F.expr("CASE WHEN d_key = c_key THEN 1 ELSE 0 END").alias(
            "is_true"
        ),
    )
    return (
        classed.groupBy("decision")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("is_true").cast("long").alias("n_true"),
            F.min("score").cast("long").alias("min_score"),
            F.max("score").cast("long").alias("max_score"),
        )
        .orderBy("decision")
    )


# --------------------------- Nelson-Aalen cumulative hazard

# Hazard-scale twin of survival_km: H(t) = sum d_i/n_i adds across
# strata (the property the KM product lacks), so per-shard hazard
# tables can be AGGREGATED at 100 TB instead of re-ranked.  Same
# cohort, same at-risk windowing; the running cumsum replaces the
# product fold.  No exp/ln — exact-ratio doubles only.
register(
    "survival_nelson_aalen",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                 THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END) AS tv,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END) AS tp,
             MAX(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_seen
      FROM events GROUP BY user_id
    ),
    cohort AS (SELECT * FROM per_user WHERE tv IS NOT NULL),
    h AS (SELECT MAX(last_seen) AS horizon FROM cohort),
    timed AS (
      SELECT COALESCE(CASE WHEN tp IS NOT NULL AND tp >= tv
                           THEN tp - tv END,
                      horizon - tv) AS t,
             CASE WHEN tp IS NOT NULL AND tp >= tv THEN 1 ELSE 0 END
               AS is_event
      FROM cohort CROSS JOIN h
    ),
    risk AS (
      SELECT t, CAST(SUM(is_event) AS BIGINT) AS d,
             COUNT(*) AS leaving
      FROM timed GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(leaving) AS BIGINT) AS total FROM risk),
    ar AS (
      SELECT t, d,
             CAST(total - (SUM(leaving) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - leaving)
                  AS BIGINT) AS n_at_risk
      FROM risk CROSS JOIN tot
    ),
    ev AS (SELECT t, d, n_at_risk FROM ar WHERE d > 0),
    na AS (
      SELECT t, d, n_at_risk,
             SUM(CAST(d AS DOUBLE) / n_at_risk)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS ch,
             SUM(CAST(d AS DOUBLE)
                 / (CAST(n_at_risk AS DOUBLE) * n_at_risk))
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS vh
      FROM ev
    )
    SELECT t AS t_days, d AS n_events, n_at_risk,
           CAST(floor(ch * 1000000) AS BIGINT) AS cum_hazard_e6,
           CAST(floor(vh * 1000000000000) AS BIGINT) AS var_e12
    FROM na ORDER BY t_days
    """,
)(stats.nelson_aalen_hazard)


# --------------------------- language-ID margin calibration

# Is the lang-ID scorer's CONFIDENCE meaningful?  Bin the held
# integer score margin (top score − runner-up) and measure accuracy
# per bin — a flat curve means the margin is noise, a rising curve
# means it is a usable quality gate threshold.  All-integer scores,
# one scan; the shared CASE strings keep Spark and oracle argmax /
# runner-up logic identical.
_LANG_PRED_CASE = """
      CASE
        WHEN score_de >= score_en AND score_de >= score_es
             AND score_de >= score_fr THEN 'de'
        WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
        WHEN score_es >= score_fr THEN 'es'
        ELSE 'fr'
      END
"""
_LANG_RUNNERUP_CASE = """
      CASE
        WHEN score_de >= score_en AND score_de >= score_es
             AND score_de >= score_fr
          THEN GREATEST(score_en, score_es, score_fr)
        WHEN score_en >= score_es AND score_en >= score_fr
          THEN GREATEST(score_de, score_es, score_fr)
        WHEN score_es >= score_fr
          THEN GREATEST(score_de, score_en, score_fr)
        ELSE GREATEST(score_de, score_en, score_es)
      END
"""


@register(
    "lang_margin_calibration",
    f"""
    WITH scores AS (
      SELECT lang AS true_lang,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','fast','order','key'], t))) AS score_en,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['data','merge','window','batch'], t))) AS score_de,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['join','filter','row','table'], t))) AS score_es,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['spark','query','stream','vector'], t))) AS score_fr
      FROM documents
    ),
    scored AS (
      SELECT true_lang,
             {_LANG_PRED_CASE} AS pred_lang,
             GREATEST(score_de, score_en, score_es, score_fr)
               - ({_LANG_RUNNERUP_CASE}) AS margin
      FROM scores
    )
    SELECT CAST(LEAST(margin, 5) AS BIGINT) AS margin_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS accuracy_ppm
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def lang_margin_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy-vs-margin calibration curve for the lang-ID scorer:
    project the four integer lexicon scores once, argmax + runner-up
    via the shared CASE strings, cap the margin at 5, and roll up
    accuracy per margin bin.  One scan + one vocabulary-sized
    groupBy; complements lang_confusion_matrix (which classes) with
    WHEN to trust the classifier."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        lang_score_cols,
    )

    docs = load_table(spark, sf_dir, "documents")
    scores = docs.select(
        F.col("lang").alias("true_lang"), *lang_score_cols()
    )
    scored = scores.select(
        "true_lang",
        F.expr(_LANG_PRED_CASE).alias("pred_lang"),
        (
            F.greatest("score_de", "score_en", "score_es", "score_fr")
            - F.expr(_LANG_RUNNERUP_CASE)
        ).alias("margin"),
    )
    return (
        scored.groupBy(
            F.expr("CAST(LEAST(margin, 5) AS BIGINT)").alias("margin_bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("pred_lang") == F.col("true_lang"), 1
                ).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .select(
            "margin_bin",
            "n_docs",
            "n_correct",
            F.expr(
                "CAST(n_correct * 1000000 div n_docs AS BIGINT)"
            ).alias("accuracy_ppm"),
        )
        .orderBy("margin_bin")
    )


# --------------------------- mutual information feature screen

# Which event types carry INFORMATION about conversion?  Correlation
# screens (error_purchase_correlation) measure linear association;
# mutual information catches any dependence and is the standard
# feature-selection score.  Per event type: the 2x2 (exposed,
# converted) user contingency table in exact integers, then
# MI = sum p_ij ln(p_ij N / (r_i c_j)) over the four cells in one
# FIXED-ORDER expression (zero cells contribute 0 by the CASE guard).
_MI_TERM = (
    "(CASE WHEN {n} > 0 THEN (CAST({n} AS DOUBLE) / nu)"
    " * ln(CAST({n} AS DOUBLE) * nu"
    "      / (CAST({r} AS DOUBLE) * ({c}))) ELSE 0 END)"
)
_MI_EXPR = (
    _MI_TERM.format(n="n11", r="n_exp", c="n_conv")
    + " + " + _MI_TERM.format(n="n10", r="n_exp", c="nu - n_conv")
    + " + " + _MI_TERM.format(n="n01", r="nu - n_exp", c="n_conv")
    + " + " + _MI_TERM.format(n="n00", r="nu - n_exp", c="nu - n_conv")
)


@register(
    "events_mutual_information",
    f"""
    WITH conv AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nu,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM conv
    ),
    exposure AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE event_type != 'purchase'
    ),
    cells AS (
      SELECT e.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_exp,
             CAST(SUM(c.converted) AS BIGINT) AS n11
      FROM exposure e JOIN conv c ON e.user_id = c.user_id
      GROUP BY 1
    ),
    full_ AS (
      SELECT event_type, nu, n_conv, n_exp, n11,
             n_exp - n11 AS n10,
             n_conv - n11 AS n01,
             nu - n_exp - (n_conv - n11) AS n00
      FROM cells CROSS JOIN tot
    )
    SELECT event_type, n_exp AS n_exposed, n11, n10, n01, n00,
           CAST(floor(({_MI_EXPR}) * 1000000) AS BIGINT) AS mi_me6
    FROM full_ ORDER BY event_type
    """,
)
def events_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between per-user event-type exposure and
    conversion: one user rollup for the outcome, one DISTINCT
    exposure-pair rollup, a per-type cell count, and the 4-term
    fixed-order MI expression from the shared string.  Totals ride
    as a 1-row broadcast crossJoin; everything is |event types|
    rows after two user-keyed shuffles."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    tot = conv.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    exposure = (
        ev.where(F.col("event_type") != "purchase")
        .select("user_id", "event_type")
        .distinct()
    )
    cells = exposure.join(conv, "user_id").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exp"),
        F.sum("converted").cast("long").alias("n11"),
    )
    full_ = cells.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "nu",
        "n_conv",
        "n_exp",
        "n11",
        (F.col("n_exp") - F.col("n11")).alias("n10"),
        (F.col("n_conv") - F.col("n11")).alias("n01"),
        (
            F.col("nu") - F.col("n_exp") - (F.col("n_conv") - F.col("n11"))
        ).alias("n00"),
    )
    return full_.select(
        "event_type",
        F.col("n_exp").alias("n_exposed"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            f"CAST(floor(({_MI_EXPR}) * 1000000) AS BIGINT)"
        ).alias("mi_me6"),
    ).orderBy("event_type")


# --------------------------- Apriori frequent triples

# basket_pairs stops at 2-itemsets; the Apriori step to 3-itemsets is
# where naive mining explodes and where the LEVEL-WISE PRUNE is the
# whole scale story: a triple can only be frequent if all three of
# its pairs are, so candidates come from joining the (tiny) frequent-
# pair table with itself and semi-checking the third edge — never
# from expanding 3-combinations of raw baskets.  Support counting
# then touches only candidate triples via equi-joins.
@register(
    "basket_triples_apriori",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    obp AS (
      SELECT a.l_orderkey, a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
    ),
    fp AS (
      SELECT a, b FROM obp GROUP BY 1, 2
      HAVING COUNT(*) >= {graph.MIN_SUPPORT}
    ),
    cand AS (
      SELECT p1.a, p1.b, p2.b AS c
      FROM fp p1
      JOIN fp p2 ON p1.a = p2.a AND p1.b < p2.b
      JOIN fp p3 ON p3.a = p1.b AND p3.b = p2.b
    ),
    sup AS (
      SELECT cd.a, cd.b, cd.c, CAST(COUNT(*) AS BIGINT) AS support
      FROM cand cd
      JOIN obp ON obp.a = cd.a AND obp.b = cd.b
      JOIN li ON li.l_orderkey = obp.l_orderkey
             AND li.l_partkey = cd.c
      GROUP BY 1, 2, 3
      HAVING COUNT(*) >= {graph.MIN_SUPPORT}
    )
    SELECT a AS part_a, b AS part_b, c AS part_c, support
    FROM sup ORDER BY 1, 2, 3
    """,
)
def basket_triples_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets via the Apriori candidate join: frequent
    pairs self-join on the shared first item, the third edge is
    verified against the pair table (all-pairs-frequent pruning),
    and support counts run only over candidates through equi-joins
    on (order, part).  The raw 3-combination expansion never
    happens — that is the plan that dies at 100 TB."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    obp = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_orderkey").alias("l_orderkey"),
            F.col("x.l_partkey").alias("a"),
            F.col("y.l_partkey").alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    from data_pipeline_for_e_commerce_shop_spark.operators.graph import (
        MIN_SUPPORT,
    )

    fp = (
        obp.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= MIN_SUPPORT)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    cand = (
        fp.alias("p1")
        .join(
            fp.alias("p2"),
            (F.col("p1.a") == F.col("p2.a"))
            & (F.col("p1.b") < F.col("p2.b")),
        )
        .select(
            F.col("p1.a").alias("a"),
            F.col("p1.b").alias("b"),
            F.col("p2.b").alias("c"),
        )
        .alias("t12")
        .join(
            fp.alias("p3"),
            (F.col("p3.a") == F.col("t12.b"))
            & (F.col("p3.b") == F.col("t12.c")),
        )
        .select("t12.a", "t12.b", "t12.c")
    )
    sup = (
        cand.join(obp, ["a", "b"])
        .join(
            li.select(
                F.col("l_orderkey"), F.col("l_partkey").alias("c")
            ),
            ["l_orderkey", "c"],
        )
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= MIN_SUPPORT)
    )
    return sup.select(
        F.col("a").alias("part_a"),
        F.col("b").alias("part_b"),
        F.col("c").alias("part_c"),
        "support",
    ).orderBy("part_a", "part_b", "part_c")


# --------------------------- Flesch-style readability

# Corpus-quality gate the length/punct ratios (text_quality) cannot
# express: READABILITY.  Words, sentences (period splits, floor 1),
# and vowel-group syllables (one regexp) feed the Flesch reading-ease
# formula with integer-scaled coefficients (206.835, 1.015, 84.6
# become 206835/1015/84600 over doubles — no decimal literals, whose
# arithmetic Spark types as DECIMAL and rounds differently).
@register(
    "text_readability",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(GREATEST(len(string_split(text, '.')) - 1, 1)
               AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(floor(206835
             - 1015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84600 * (CAST(n_syllables AS DOUBLE) / n_words))
             AS BIGINT) AS flesch_e3
    FROM m ORDER BY doc_id
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document from three JVM-side counters
    (word split, period split floored at one sentence, vowel-group
    regexp) and the integer-scaled formula — one scan, zero joins,
    zero UDFs; the readability rung of the text-quality ladder."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_words"),
        F.expr(
            "CAST(GREATEST(size(split(text, '[.]')) - 1, 1) AS BIGINT)"
        ).alias("n_sentences"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
            " AS BIGINT)"
        ).alias("n_syllables"),
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "CAST(floor(206835"
            " - 1015 * (CAST(n_words AS DOUBLE) / n_sentences)"
            " - 84600 * (CAST(n_syllables AS DOUBLE) / n_words))"
            " AS BIGINT)"
        ).alias("flesch_e3"),
    ).orderBy("doc_id")


# --------------------------- TPC-H Q6: discount-elimination uplift

# The classic "how much more revenue if these promotional discounts
# were dropped" forecast (TPC-H Q6 shape): a single highly-selective
# scan-aggregate whose three range predicates must ALL reach the
# parquet reader — this query exists in the registry precisely to
# pin the pushdown contract on a conjunctive-range filter (the plan
# test asserts the scan carries PushedFilters).  Revenue term is
# exact integer cents x discount-percent units.
@register(
    "tpch_q6_discount_uplift",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * CAST(floor(l_discount * 100) AS BIGINT))
             AS BIGINT) AS uplift_cents_pct
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND CAST(floor(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND CAST(l_quantity AS BIGINT) < 24
    """,
)
def tpch_q6_discount_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped discount-elimination forecast: one scan, all
    three predicates pushable, one global aggregate of exact integer
    products (cents x discount-percent) — the pushdown-contract
    showcase.  Reference scope: scripts/transformation.py filtered
    aggregations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
            & (
                F.expr("CAST(floor(l_discount * 100) AS BIGINT)")
                .between(5, 7)
            )
            & (F.expr("CAST(l_quantity AS BIGINT)") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * 100) AS BIGINT)"
                    " * CAST(floor(l_discount * 100) AS BIGINT)"
                )
            ).cast("long").alias("uplift_cents_pct"),
        )
    )


# --------------------------- TPC-H Q19: disjunctive bracket revenue

# The OR-of-conjunctions predicate (TPC-H Q19 shape, p_size standing
# in for the absent p_container): three (brand, size-range,
# quantity-range) brackets whose revenue is summed per bracket.  The
# disjunction cannot push as a single range, but the per-branch brand
# IN-list does — and the join stays a broadcast of the dim side with
# the residual evaluated post-join, which is the right 100 TB plan
# (never three scans unioned).  Brackets are brand-disjoint, so the
# CASE labels deterministically.
@register(
    "tpch_q19_bracket_revenue",
    """
    WITH hit AS (
      SELECT CASE
               WHEN p_brand = 'Brand#1' THEN 1
               WHEN p_brand = 'Brand#2' THEN 2
               ELSE 3 END AS bracket,
             CAST(floor(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(floor(l_discount * 100) AS BIGINT))
               AS cents_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
             AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
             AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)
    )
    SELECT bracket, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(cents_pct) AS BIGINT) AS revenue_cents_pct
    FROM hit GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive bracket revenue: broadcast the
    part dim, evaluate the OR-of-conjunctions once post-join, label
    brackets by the (disjoint) brand, and aggregate exact
    cents x (100 - discount-pct) units per bracket."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
        F.expr(
            "CAST(floor(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(floor(l_discount * 100) AS BIGINT))"
        ).alias("cents_pct"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size"
    )
    hit = (
        li.join(F.broadcast(part), "l_partkey")
        .where(
            (
                (F.col("p_brand") == "Brand#1")
                & F.col("p_size").between(1, 15)
                & F.col("qty").between(1, 11)
            )
            | (
                (F.col("p_brand") == "Brand#2")
                & F.col("p_size").between(10, 30)
                & F.col("qty").between(10, 20)
            )
            | (
                (F.col("p_brand") == "Brand#3")
                & F.col("p_size").between(20, 50)
                & F.col("qty").between(20, 30)
            )
        )
        .select(
            F.expr(
                "CASE WHEN p_brand = 'Brand#1' THEN 1"
                " WHEN p_brand = 'Brand#2' THEN 2 ELSE 3 END"
            ).alias("bracket"),
            "cents_pct",
        )
    )
    return (
        hit.groupBy("bracket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("cents_pct").cast("long").alias("revenue_cents_pct"),
        )
        .orderBy("bracket")
    )


# --------------------------- dormant-capital screen (Q22 shape)

# TPC-H Q22 re-expressed on the available columns: per nation, the
# customers holding ABOVE-AVERAGE positive balances who placed no
# order in the final observed year — parked capital sales should
# chase.  The threshold comparison is cents*n > total (exact
# integers, no division); recency exclusion is an anti join.
DORMANT_CUTOFF = "2001-01-01"


@register(
    "dormant_capital_screen",
    f"""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT))
               AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '{DORMANT_CUTOFF}'
    ),
    dormant AS (
      SELECT c.c_nationkey,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS cents
      FROM customer c
      CROSS JOIN thresh t
      LEFT JOIN recent r ON c.c_custkey = r.o_custkey
      WHERE r.o_custkey IS NULL
        AND CAST(floor(c.c_acctbal * 100) AS BIGINT) * t.n > t.s
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents
    FROM dormant GROUP BY 1 ORDER BY 1
    """,
)
def dormant_capital_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped dormant-capital screen: 1-row positive-balance
    threshold rides as a broadcast crossJoin (integer cross-multiply,
    no division), the final-year actives anti-join out, and the
    25-row nation rollup reports parked capital."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("cents"),
        F.col("c_acctbal").alias("bal"),
    )
    thresh = cust.where(F.col("bal") > 0).agg(
        F.sum("cents").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate").cast("date") >= F.lit(DORMANT_CUTOFF)
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    dormant = (
        cust.crossJoin(F.broadcast(thresh))
        .join(recent, "c_custkey", "left_anti")
        .where(F.col("cents") * F.col("n") > F.col("s"))
    )
    return (
        dormant.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .select(
            "c_nationkey",
            "n_custs",
            "total_cents",
            F.expr("CAST(total_cents div n_custs AS BIGINT)").alias(
                "avg_cents"
            ),
        )
        .orderBy("c_nationkey")
    )


# --------------------------- quantile treatment effects

# The mean uplift (ab_test_report) hides WHERE in the distribution a
# treatment acts; quantile treatment effects compare exact discrete
# quantiles of per-user order value between arms — a tail-only effect
# shows up at p75/p90 with a flat median.  percentile_disc picks real
# data values, so both engines agree bit-for-bit on the doubles.
@register(
    "ab_quantile_effects",
    """
    WITH u AS (
      SELECT o_custkey AS user_key,
             CAST(('0x' || substr(md5('ab-' || CAST(o_custkey AS VARCHAR)),
                   1, 8)) AS BIGINT) % 2 AS arm,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    q AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
             quantile_disc(cents, 0.25) AS p25,
             quantile_disc(cents, 0.50) AS p50,
             quantile_disc(cents, 0.75) AS p75,
             quantile_disc(cents, 0.90) AS p90
      FROM u GROUP BY 1
    ),
    w AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n_users END) AS n_control,
             MAX(CASE WHEN arm = 1 THEN n_users END) AS n_treat,
             MAX(CASE WHEN arm = 0 THEN p25 END) AS c25,
             MAX(CASE WHEN arm = 1 THEN p25 END) AS t25,
             MAX(CASE WHEN arm = 0 THEN p50 END) AS c50,
             MAX(CASE WHEN arm = 1 THEN p50 END) AS t50,
             MAX(CASE WHEN arm = 0 THEN p75 END) AS c75,
             MAX(CASE WHEN arm = 1 THEN p75 END) AS t75,
             MAX(CASE WHEN arm = 0 THEN p90 END) AS c90,
             MAX(CASE WHEN arm = 1 THEN p90 END) AS t90
      FROM q
    )
    SELECT n_control, n_treat,
           CAST(t25 - c25 AS BIGINT) AS qte_p25_cents,
           CAST(t50 - c50 AS BIGINT) AS qte_p50_cents,
           CAST(t75 - c75 AS BIGINT) AS qte_p75_cents,
           CAST(t90 - c90 AS BIGINT) AS qte_p90_cents
    FROM w
    """,
)
def ab_quantile_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects on per-user spend between the
    hash-assigned arms: one user rollup (exact integer cents), exact
    percentile_disc per arm, and the four QTE differences pivoted to
    one row.  Same assignment hash as every other A/B query."""
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    orders = load_table(spark, sf_dir, "orders")
    u = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
            ).cast("long").alias("cents")
        )
        .select(
            (portable_hash32(F.col("o_custkey"), prefix="ab-") % 2).alias(
                "arm"
            ),
            "cents",
        )
    )
    q = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)"
        ).alias("p25"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY cents)"
        ).alias("p50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)"
        ).alias("p75"),
        F.expr(
            "percentile_disc(0.90) WITHIN GROUP (ORDER BY cents)"
        ).alias("p90"),
    )
    w = q.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias(
            "n_control"
        ),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias(
            "n_treat"
        ),
        *[
            F.max(
                F.when(F.col("arm") == a, F.col(f"p{p}"))
            ).alias(f"{'c' if a == 0 else 't'}{p}")
            for p in (25, 50, 75, 90)
            for a in (0, 1)
        ],
    )
    return w.select(
        "n_control",
        "n_treat",
        *[
            F.expr(f"CAST(t{p} - c{p} AS BIGINT)").alias(
                f"qte_p{p}_cents"
            )
            for p in (25, 50, 75, 90)
        ],
    )


# --------------------------- monthly priority-mix stability

# Is the order-priority mix drifting month to month?  Total-variation
# distance between each month's priority mix and the global mix, in
# exact ppm integers (TV = half the sum of absolute ppm-share
# deltas) — the category-mix analogue of the chi-square drift gates,
# but in the interpretable "share points moved" unit.
@register(
    "orders_priority_mix_stability",
    """
    WITH cells AS (
      SELECT DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS month,
             o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    mtot AS (
      SELECT month, CAST(SUM(n) AS BIGINT) AS nm FROM cells GROUP BY 1
    ),
    gtot AS (
      SELECT pri, CAST(SUM(n) AS BIGINT) AS ng FROM cells GROUP BY 1
    ),
    alltot AS (SELECT CAST(SUM(n) AS BIGINT) AS na FROM cells),
    deltas AS (
      SELECT c.month,
             ABS(c.n * 1000000 // m.nm - g.ng * 1000000 // a.na)
               AS adelta
      FROM cells c
      JOIN mtot m ON c.month = m.month
      JOIN gtot g ON c.pri = g.pri
      CROSS JOIN alltot a
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(SUM(adelta) // 2 AS BIGINT) AS tv_ppm
    FROM deltas GROUP BY 1 ORDER BY 1
    """,
)
def orders_priority_mix_stability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly total-variation distance of the order-priority mix vs
    the global mix: one (month, priority) rollup, broadcast margins,
    exact ppm share deltas — drift in interpretable share points,
    beside the chi-square gates."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
            "month"
        ),
        F.col("o_orderpriority").alias("pri"),
    )
    cells = orders.groupBy("month", "pri").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    mtot = cells.groupBy("month").agg(F.sum("n").cast("long").alias("nm"))
    gtot = cells.groupBy("pri").agg(F.sum("n").cast("long").alias("ng"))
    alltot = cells.agg(F.sum("n").cast("long").alias("na"))
    deltas = (
        cells.join(F.broadcast(mtot), "month")
        .join(F.broadcast(gtot), "pri")
        .crossJoin(F.broadcast(alltot))
        .select(
            "month",
            F.expr(
                "ABS(n * 1000000 div nm - ng * 1000000 div na)"
            ).alias("adelta"),
        )
    )
    return (
        deltas.groupBy("month")
        .agg(F.expr("CAST(SUM(adelta) div 2 AS BIGINT)").alias("tv_ppm"))
        .select(F.col("month").cast("date").alias("month"), "tv_ppm")
        .orderBy("month")
    )


# --------------------------- IVF n_probe tuning curve

# The accuracy-vs-cost dial of the IVF index: recall@5 per n_probe in
# {1, 2, 4} against the brute ground truth — the ANN-side counterpart
# of dedup_lsh_tuning_curve.  The oracle re-parameterises the shared
# IVF SQL (query probe depth is the only difference) and composes the
# brute oracle, so every point on the curve is value-hash-checked.
def _ivf_probe_sql(p: int) -> str:
    return _IVF_TOPK_ORACLE.replace("WHERE pr <= 2", f"WHERE pr <= {p}")


register(
    "ann_ivf_nprobe_curve",
    f"""
    WITH brute AS ({_COSINE_TOPK_ORACLE}),
    qids AS (SELECT DISTINCT query_id FROM brute),
    {", ".join(
        f"ivf{p} AS ({_ivf_probe_sql(p)}),"
        f" h{p} AS (SELECT b.query_id,"
        f" CAST(COUNT(v.corpus_id) AS BIGINT) AS hits"
        f" FROM brute b LEFT JOIN ivf{p} v USING (query_id, corpus_id)"
        f" GROUP BY 1)"
        for p in similarity.IVF_CURVE_PROBES
    )}
    {" UNION ALL ".join(
        f"SELECT CAST({p} AS BIGINT) AS n_probe, q.query_id,"
        f" COALESCE(h{p}.hits, 0) AS hits,"
        f" CAST(COALESCE(h{p}.hits, 0) * 1000000 // 5 AS BIGINT)"
        f" AS recall_ppm"
        f" FROM qids q LEFT JOIN h{p} ON q.query_id = h{p}.query_id"
        for p in similarity.IVF_CURVE_PROBES
    )}
    ORDER BY n_probe, query_id
    """,
)(similarity.ivf_nprobe_curve)


# --------------------------- weekend effect size (Cohen's d)

# weekend_value_ztest says WHETHER weekend order values differ;
# Cohen's d / Hedges' g say BY HOW MUCH in pooled-SD units — the
# number a prioritization meeting actually needs.  Per category:
# exact integer (n, sum, sum-of-squares) conditional sums, means and
# variances in doubles via CAST-first products (s*s would overflow
# int64; CAST(s AS DOUBLE)*s cannot), pooled SD, and the small-sample
# Hedges correction.  Int64 bound: ss = sum cents^2 stays exact to
# ~9e18 (sf0.1 is ~6e17; document, don't widen).
@register(
    "category_weekend_effect_size",
    """
    WITH x AS (
      SELECT p_type AS category,
             CASE WHEN dayofweek(CAST(l_shipdate AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS wk,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    m AS (
      SELECT category,
        CAST(SUM(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN wk = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN wk = 1 THEN c * c ELSE 0 END) AS BIGINT)
          AS ss1,
        CAST(SUM(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN wk = 0 THEN c ELSE 0 END) AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN wk = 0 THEN c * c ELSE 0 END) AS BIGINT)
          AS ss0
      FROM x GROUP BY 1
    ),
    d AS (
      SELECT category, n1, n0,
             (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
             / sqrt((
                 (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                 + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
               ) / (n1 + n0 - 2)) AS cohens_d
      FROM m
    )
    SELECT category, n1 AS n_weekend, n0 AS n_weekday,
           CAST(floor(cohens_d * 1000000) AS BIGINT) AS d_me6,
           CAST(floor(cohens_d
             * (1 - CAST(3 AS DOUBLE) / (4 * (n1 + n0) - 9))
             * 1000000) AS BIGINT) AS g_me6
    FROM d ORDER BY category
    """,
)
def category_weekend_effect_size(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohen's d + Hedges' g of weekend vs weekday line revenue per
    category: one broadcast dim join, one conditional-sum rollup to
    |categories| rows, then pooled-SD doubles from exact integer
    moments (CAST-first products keep int64 safe)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(
            (F.dayofweek(F.col("l_shipdate").cast("date")) - 1).isin(0, 6),
            1,
        ).otherwise(0).alias("wk"),
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias("c"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("category"),
    )
    m = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("category")
        .agg(
            F.sum(F.when(F.col("wk") == 1, 1).otherwise(0))
            .cast("long").alias("n1"),
            F.sum(F.when(F.col("wk") == 1, F.col("c")).otherwise(0))
            .cast("long").alias("s1"),
            F.sum(
                F.when(F.col("wk") == 1, F.col("c") * F.col("c"))
                .otherwise(0)
            ).cast("long").alias("ss1"),
            F.sum(F.when(F.col("wk") == 0, 1).otherwise(0))
            .cast("long").alias("n0"),
            F.sum(F.when(F.col("wk") == 0, F.col("c")).otherwise(0))
            .cast("long").alias("s0"),
            F.sum(
                F.when(F.col("wk") == 0, F.col("c") * F.col("c"))
                .otherwise(0)
            ).cast("long").alias("ss0"),
        )
    )
    d = m.select(
        "category",
        "n1",
        "n0",
        F.expr(
            "(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)"
            " / sqrt(("
            "   (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)"
            "   + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)"
            " ) / (n1 + n0 - 2))"
        ).alias("cohens_d"),
    )
    return d.select(
        "category",
        F.col("n1").alias("n_weekend"),
        F.col("n0").alias("n_weekday"),
        F.expr("CAST(floor(cohens_d * 1000000) AS BIGINT)").alias("d_me6"),
        F.expr(
            "CAST(floor(cohens_d"
            " * (1 - CAST(3 AS DOUBLE) / (4 * (n1 + n0) - 9))"
            " * 1000000) AS BIGINT)"
        ).alias("g_me6"),
    ).orderBy("category")


# --------------------------- Kendall tau-b across nations

# nation_spearman_bal_spend ranks; Kendall tau-b counts concordant vs
# discordant pairs and is the more robust small-n association — and
# here it is DIVISION-FREE: per-capita comparisons are exact integer
# cross-multiplications (s_i·n_j vs s_j·n_i), so ties are exact, not
# float artifacts.  The 25-row nation aggregate self-joins into 300
# pairs — an aggregate-reduced grid, never a fact-level blowup.
_KT_SIGN = (
    "(CASE WHEN {a} > {b} THEN 1 WHEN {a} < {b} THEN -1 ELSE 0 END)"
)


@register(
    "nation_kendall_tau",
    f"""
    WITH bal AS (
      SELECT c_nationkey AS nk,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT))
               AS BIGINT) AS sb
      FROM customer GROUP BY 1
    ),
    spend AS (
      SELECT c.c_nationkey AS nk,
             CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS sp
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    g AS (
      SELECT bal.nk, bal.n, bal.sb, spend.sp
      FROM bal JOIN spend ON bal.nk = spend.nk
    ),
    pairs AS (
      SELECT {_KT_SIGN.format(a="a.sb * b.n", b="b.sb * a.n")} AS sx,
             {_KT_SIGN.format(a="a.sp * b.n", b="b.sp * a.n")} AS sy
      FROM g a JOIN g b ON a.nk < b.nk
    ),
    cnt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS disc,
             CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS ties_x,
             CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS ties_y
      FROM pairs
    )
    SELECT n_pairs, conc, disc, ties_x, ties_y,
           CAST(floor((CAST(conc AS DOUBLE) - disc)
             / sqrt(CAST(n_pairs - ties_x AS DOUBLE)
                    * (n_pairs - ties_y)) * 1000000) AS BIGINT)
             AS tau_b_me6
    FROM cnt
    """,
)
def nation_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between per-capita balance (customer rollup)
    and per-capita spend (orders rollup) across nations: two 25-row
    aggregates joined, a 300-pair grid self-join on nk<nk
    (aggregate-reduced), exact integer cross-multiplied comparisons
    (no division anywhere before the final tau), shared sign CASE
    string on both engines."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("bal"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("spend"),
    )
    bal = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("bal").cast("long").alias("sb"),
    )
    spend = (
        cust.join(orders, "c_custkey")
        .groupBy("c_nationkey")
        .agg(F.sum("spend").cast("long").alias("sp"))
    )
    g = bal.join(spend, "c_nationkey").select(
        F.col("c_nationkey").alias("nk"), "n", "sb", "sp"
    )
    pairs = (
        g.alias("a")
        .join(g.alias("b"), F.col("a.nk") < F.col("b.nk"))
        .select(
            F.expr(
                _KT_SIGN.format(a="a.sb * b.n", b="b.sb * a.n")
            ).alias("sx"),
            F.expr(
                _KT_SIGN.format(a="a.sp * b.n", b="b.sp * a.n")
            ).alias("sy"),
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0))
        .cast("long").alias("conc"),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0))
        .cast("long").alias("disc"),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0))
        .cast("long").alias("ties_x"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0))
        .cast("long").alias("ties_y"),
    ).select(
        "n_pairs",
        "conc",
        "disc",
        "ties_x",
        "ties_y",
        F.expr(
            "CAST(floor((CAST(conc AS DOUBLE) - disc)"
            " / sqrt(CAST(n_pairs - ties_x AS DOUBLE)"
            "        * (n_pairs - ties_y)) * 1000000) AS BIGINT)"
        ).alias("tau_b_me6"),
    )


# --------------------------- G-test of lang x source independence

# The likelihood-ratio counterpart to the Pearson chi-square gates:
# G = 2 Σ O·ln(O·N / (R·C)) is additive across partitions of the
# table (the property Pearson lacks), which is why corpus monitors
# prefer it — per-shard G values sum exactly.  Cells of the
# (lang, source) grid are exact integers; the fold is key-ordered.
@register(
    "doc_lang_source_gtest",
    """
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    mr AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    mc AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                  CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
                  CAST(COUNT(DISTINCT source) AS BIGINT) AS nc
           FROM cells),
    terms AS (
      SELECT ce.lang, ce.source,
             2 * CAST(ce.o AS DOUBLE)
               * ln(CAST(ce.o AS DOUBLE) * nn.n
                    / (CAST(mr.r AS DOUBLE) * mc.c)) AS t
      FROM cells ce JOIN mr ON ce.lang = mr.lang
      JOIN mc ON ce.source = mc.source
      CROSS JOIN nn
    )
    SELECT (SELECT nr FROM nn) AS n_langs,
           (SELECT nc FROM nn) AS n_sources,
           ((SELECT nr FROM nn) - 1) * ((SELECT nc FROM nn) - 1) AS df,
           CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             (SELECT list(t ORDER BY lang, source) FROM terms)),
             (a, b) -> a + b) * 1000) AS BIGINT) AS g_e3
    """,
)
def doc_lang_source_gtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G-test of (lang, source) independence on the
    documents table: one rollup to the ~20-cell grid, broadcast
    margins, per-cell 2·O·ln(O·N/RC) terms, key-ordered fold — the
    shard-ADDITIVE independence statistic beside the Pearson gates."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    mr = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    mc = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    nn = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("lang").cast("long").alias("nr"),
        F.countDistinct("source").cast("long").alias("nc"),
    )
    terms = (
        cells.join(F.broadcast(mr), "lang")
        .join(F.broadcast(mc), "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "lang",
            "source",
            "nr",
            "nc",
            F.expr(
                "2 * CAST(o AS DOUBLE)"
                " * ln(CAST(o AS DOUBLE) * n"
                "      / (CAST(r AS DOUBLE) * c))"
            ).alias("t"),
        )
    )
    return terms.groupBy("nr", "nc").agg(
        F.expr(
            "CAST(floor(aggregate(array_sort(collect_list("
            " named_struct('k1', lang, 'k2', source, 'v', t))),"
            " CAST(0.0 AS DOUBLE), (a, x) -> a + x.v) * 1000)"
            " AS BIGINT)"
        ).alias("g_e3")
    ).select(
        F.col("nr").alias("n_langs"),
        F.col("nc").alias("n_sources"),
        F.expr("(nr - 1) * (nc - 1)").alias("df"),
        "g_e3",
    )


# --------------------------- Cochran-Armitage return trend

# Does return probability RISE with discount depth?  A per-band
# chi-square would ignore the ordering; the Cochran-Armitage trend
# test scores the ordered discount bands (s_i = band index) and
# tests the linear trend in proportions — one scan, exact integer
# moments (Σsr, Σsn, Σs²n, R, N), one closed-form z.
@register(
    "discount_return_trend",
    """
    WITH b AS (
      SELECT CAST(floor(l_discount * 100) AS BIGINT) AS s,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ret) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT s) AS BIGINT) AS n_bands,
             CAST(SUM(s * ret) AS BIGINT) AS ssr,
             CAST(SUM(s) AS BIGINT) AS ssn,
             CAST(SUM(s * s) AS BIGINT) AS ss2n
      FROM b
    )
    SELECT n AS n_lines, r AS n_returns, n_bands,
           CAST(floor(
             (CAST(ssr AS DOUBLE) - CAST(r AS DOUBLE) * ssn / n)
             / sqrt((CAST(r AS DOUBLE) / n)
                    * (1 - CAST(r AS DOUBLE) / n)
                    * (CAST(ss2n AS DOUBLE)
                       - CAST(ssn AS DOUBLE) * ssn / n))
             * 1000) AS BIGINT) AS z_e3,
           CASE WHEN ABS(
             (CAST(ssr AS DOUBLE) - CAST(r AS DOUBLE) * ssn / n)
             / sqrt((CAST(r AS DOUBLE) / n)
                    * (1 - CAST(r AS DOUBLE) / n)
                    * (CAST(ss2n AS DOUBLE)
                       - CAST(ssn AS DOUBLE) * ssn / n))
             ) > 1.959964 THEN 1 ELSE 0 END AS significant
    FROM m
    """,
)
def discount_return_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test of return rate across ordered
    discount bands: one scan to five exact integer moments, one
    closed-form z in doubles (same frozen 1.96 critical value as the
    other z gates) — ordering-aware where the chi-square gates are
    not."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(floor(l_discount * 100) AS BIGINT)").alias("s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ret").cast("long").alias("r"),
        F.countDistinct("s").cast("long").alias("n_bands"),
        F.sum(F.col("s") * F.col("ret")).cast("long").alias("ssr"),
        F.sum("s").cast("long").alias("ssn"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("ss2n"),
    )
    zexpr = (
        "(CAST(ssr AS DOUBLE) - CAST(r AS DOUBLE) * ssn / n)"
        " / sqrt((CAST(r AS DOUBLE) / n)"
        "        * (1 - CAST(r AS DOUBLE) / n)"
        "        * (CAST(ss2n AS DOUBLE)"
        "           - CAST(ssn AS DOUBLE) * ssn / n))"
    )
    return m.select(
        F.col("n").alias("n_lines"),
        F.col("r").alias("n_returns"),
        "n_bands",
        F.expr(f"CAST(floor(({zexpr}) * 1000) AS BIGINT)").alias("z_e3"),
        F.expr(
            f"CASE WHEN ABS({zexpr}) > 1.959964 THEN 1 ELSE 0 END"
        ).alias("significant"),
    )


# --------------------------- McNemar paired classifier comparison

# "Is the trained NB actually better than the lexicon heuristic?"
# Accuracy deltas on overlapping test sets need the PAIRED test:
# McNemar uses only the disagreement cells (NB-right/heuristic-wrong
# vs the reverse) on the SAME held-out docs.  Fully integer — the
# statistic and the chi-square(df=1) significance gate are exact
# cross-multiplications, no doubles anywhere.
@register(
    "mcnemar_lang_classifiers",
    _NB_PRED_CTES
    + f"""
    , heur AS (
      SELECT doc_id, lang AS true_lang,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','fast','order','key'], t))) AS score_en,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['data','merge','window','batch'], t))) AS score_de,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['join','filter','row','table'], t))) AS score_es,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['spark','query','stream','vector'], t))) AS score_fr
      FROM documents WHERE doc_id % {text.NB_TEST_MOD} = 0
    ),
    hp AS (
      SELECT doc_id, true_lang, {_LANG_PRED_CASE} AS h_pred FROM heur
    ),
    paired AS (
      SELECT CASE WHEN p.pred_lang = p.true_lang THEN 1 ELSE 0 END
               AS nb_ok,
             CASE WHEN h.h_pred = h.true_lang THEN 1 ELSE 0 END AS h_ok
      FROM pred p JOIN hp h ON p.doc_id = h.doc_id
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nb_ok * h_ok) AS BIGINT) AS both_right,
             CAST(SUM(nb_ok * (1 - h_ok)) AS BIGINT) AS nb_only,
             CAST(SUM((1 - nb_ok) * h_ok) AS BIGINT) AS heur_only,
             CAST(SUM((1 - nb_ok) * (1 - h_ok)) AS BIGINT) AS both_wrong
      FROM paired
    )
    SELECT n_docs, both_right, nb_only, heur_only, both_wrong,
           CAST(CASE WHEN nb_only + heur_only > 0
                THEN (nb_only - heur_only) * (nb_only - heur_only)
                     * 1000 // (nb_only + heur_only)
                ELSE 0 END AS BIGINT) AS mcnemar_e3,
           CASE WHEN (nb_only - heur_only) * (nb_only - heur_only)
                     * 1000000 > 3841459 * (nb_only + heur_only)
                THEN 1 ELSE 0 END AS significant
    FROM agg
    """,
)
def mcnemar_lang_classifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test of the NB classifier vs the lexicon
    heuristic on the shared held-out split: per-doc NB predictions
    (text.nb_doc_predictions — shared with the confusion matrix),
    heuristic argmax via the shared CASE string, one doc_id equi-join,
    and a fully-integer disagreement-cell statistic with an exact
    cross-multiplied chi-square(df=1, 3.841459) gate."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        NB_TEST_MOD,
        lang_score_cols,
        nb_doc_predictions,
    )

    nb = nb_doc_predictions(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END"
        ).alias("nb_ok"),
    )
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % NB_TEST_MOD == 0
    )
    hp = docs.select(
        "doc_id", F.col("lang").alias("true_lang"), *lang_score_cols()
    ).select(
        "doc_id",
        F.expr(
            f"CASE WHEN ({_LANG_PRED_CASE}) = true_lang"
            " THEN 1 ELSE 0 END"
        ).alias("h_ok"),
    )
    agg = nb.join(hp, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("nb_ok") * F.col("h_ok"))
        .cast("long").alias("both_right"),
        F.sum(F.col("nb_ok") * (1 - F.col("h_ok")))
        .cast("long").alias("nb_only"),
        F.sum((1 - F.col("nb_ok")) * F.col("h_ok"))
        .cast("long").alias("heur_only"),
        F.sum((1 - F.col("nb_ok")) * (1 - F.col("h_ok")))
        .cast("long").alias("both_wrong"),
    )
    return agg.select(
        "n_docs",
        "both_right",
        "nb_only",
        "heur_only",
        "both_wrong",
        F.expr(
            "CAST(CASE WHEN nb_only + heur_only > 0"
            " THEN (nb_only - heur_only) * (nb_only - heur_only)"
            "      * 1000 div (nb_only + heur_only)"
            " ELSE 0 END AS BIGINT)"
        ).alias("mcnemar_e3"),
        F.expr(
            "CASE WHEN (nb_only - heur_only) * (nb_only - heur_only)"
            " * 1000000 > 3841459 * (nb_only + heur_only)"
            " THEN 1 ELSE 0 END"
        ).alias("significant"),
    )


# --------------------------- TextRank keywords

def _textrank_oracle() -> str:
    """Unrolled TextRank trajectory: positional tokenize (the
    no-WITH-ORDINALITY device), adjacency edges, then the same
    integer-exact damped transfer rounds as _pagerank_oracle over the
    word graph."""
    from data_pipeline_for_e_commerce_shop_spark.operators.graph import (
        PR_D_DEN,
        PR_D_NUM,
        PR_SCALE,
    )

    stop = ", ".join(f"'{s}'" for s in text.STOPWORDS)
    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // PR_D_DEN
    parts = [
        f"""
    WITH tk AS (
      SELECT doc_id, u.i AS pos, t[u.i] AS w
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      CROSS JOIN UNNEST(generate_series(1, len(t))) AS u(i)
    ),
    ft AS (SELECT doc_id, pos, w FROM tk WHERE w NOT IN ({stop})),
    pairs AS (
      SELECT LEAST(x.w, y.w) AS wa, GREATEST(x.w, y.w) AS wb
      FROM ft x JOIN ft y ON x.doc_id = y.doc_id AND x.pos + 1 = y.pos
      WHERE x.w != y.w
    ),
    und AS (
      SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS w FROM pairs
      GROUP BY 1, 2 HAVING COUNT(*) >= {text.TEXTRANK_MIN_W}
    ),
    edges AS (
      SELECT wa AS src, wb AS dst, w FROM und
      UNION ALL SELECT wb, wa, w FROM und
    ),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
             FROM edges GROUP BY 1),
    e AS (SELECT edges.src, dst, w, outw FROM edges JOIN outw USING (src)),
    pr0 AS (SELECT src AS word, CAST({PR_SCALE} AS BIGINT) AS pr
            FROM outw)"""
    ]
    for t in range(1, text.TEXTRANK_ITER + 1):
        parts.append(
            f""",
    c{t} AS (
      SELECT dst, SUM((pr * w) // outw) AS inflow
      FROM e JOIN pr{t - 1} p ON e.src = p.word
      GROUP BY dst
    ),
    pr{t} AS (
      SELECT n.word,
             CAST({base} + ({PR_D_NUM} * COALESCE(c.inflow, 0))
                  // {PR_D_DEN} AS BIGINT) AS pr
      FROM pr0 n LEFT JOIN c{t} c ON n.word = c.dst
    )"""
        )
    parts.append(
        f"""
    SELECT rank, word, pr FROM (
      SELECT word, pr,
             row_number() OVER (ORDER BY pr DESC, word ASC) AS rank
      FROM pr{text.TEXTRANK_ITER}
    ) WHERE rank <= {text.TEXTRANK_TOPK} ORDER BY rank
    """
    )
    return "".join(parts)


register("text_textrank_keywords", _textrank_oracle())(
    text.textrank_keywords
)


# --------------------------- restricted mean survival time

# The KM curve summarised to the one number a planning meeting needs:
# expected days-to-convert capped at the last event time (area under
# the step curve).  The oracle wraps the registered KM oracle as a
# CTE, so the two can never drift; the step areas sum in a t-ordered
# fold.
register(
    "survival_rmst",
    "WITH km AS (" + ORACLES["survival_km"] + """),
    lagd AS (
      SELECT t_days, survival,
             LAG(t_days) OVER (ORDER BY t_days) AS pt,
             LAG(survival) OVER (ORDER BY t_days) AS ps
      FROM km
    ),
    terms AS (
      SELECT t_days,
             CASE WHEN pt IS NULL THEN CAST(t_days AS DOUBLE)
                  ELSE (t_days - pt) * ps END AS term
      FROM lagd
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
           CAST(MAX(t_days) AS BIGINT) AS horizon_days,
           CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(term ORDER BY t_days)), (a, b) -> a + b) * 1000000)
             AS BIGINT) AS rmst_e6
    FROM terms
    """,
)(stats.km_rmst)


# --------------------------- deterministic k-fold assignment

# Cross-validation folds must be REPRODUCIBLE (re-runs and backfills
# agree) and class-balanced; this is the k-fold counterpart of
# corpus_shuffle_split's single split.  md5 fold assignment plus a
# per-(fold, lang) balance audit: each fold's language share vs the
# corpus share, in exact ppm — a skewed fold invalidates the CV
# estimate before any model runs.
KFOLD_K = 5


@register(
    "corpus_kfold_assign",
    f"""
    WITH assigned AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('kf-' || CAST(doc_id AS VARCHAR)),
                   1, 8)) AS BIGINT) % {KFOLD_K} AS fold
      FROM documents
    ),
    cells AS (
      SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM assigned GROUP BY 1, 2
    ),
    ftot AS (SELECT fold, CAST(SUM(n) AS BIGINT) AS nf
             FROM cells GROUP BY 1),
    ltot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nl
             FROM cells GROUP BY 1),
    atot AS (SELECT CAST(SUM(n) AS BIGINT) AS na FROM cells)
    SELECT c.fold, c.lang, c.n,
           CAST(c.n * 1000000 // f.nf AS BIGINT) AS fold_share_ppm,
           CAST(l.nl * 1000000 // a.na AS BIGINT) AS corpus_share_ppm,
           CAST(c.n * 1000000 // f.nf
                - l.nl * 1000000 // a.na AS BIGINT) AS skew_ppm
    FROM cells c
    JOIN ftot f ON c.fold = f.fold
    JOIN ltot l ON c.lang = l.lang
    CROSS JOIN atot a
    ORDER BY c.fold, c.lang
    """,
)
def corpus_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 k-fold assignment with a per-(fold, lang)
    class-balance audit in exact ppm (fold share vs corpus share):
    one scan, one grid rollup, broadcast margins — the reproducible
    CV splitter beside the single shuffle-split."""
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        portable_hash32,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (portable_hash32(F.col("doc_id"), prefix="kf-") % KFOLD_K).alias(
            "fold"
        ),
    )
    cells = docs.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ftot = cells.groupBy("fold").agg(F.sum("n").cast("long").alias("nf"))
    ltot = cells.groupBy("lang").agg(F.sum("n").cast("long").alias("nl"))
    atot = cells.agg(F.sum("n").cast("long").alias("na"))
    return (
        cells.join(F.broadcast(ftot), "fold")
        .join(F.broadcast(ltot), "lang")
        .crossJoin(F.broadcast(atot))
        .select(
            "fold",
            "lang",
            "n",
            F.expr("CAST(n * 1000000 div nf AS BIGINT)").alias(
                "fold_share_ppm"
            ),
            F.expr("CAST(nl * 1000000 div na AS BIGINT)").alias(
                "corpus_share_ppm"
            ),
            F.expr(
                "CAST(n * 1000000 div nf - nl * 1000000 div na"
                " AS BIGINT)"
            ).alias("skew_ppm"),
        )
        .orderBy("fold", "lang")
    )
