"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Two tiers (repo charter; no analogue in the reference):

- brute-force cosine top-k — the exact baseline; a broadcast
  nested-loop of Q query vectors against the corpus, all JVM-side
  array expressions (no UDF);
- LSH-bucketed top-k — the scale path: random-hyperplane sign bits
  shrink the candidate set to same-bucket vectors before exact
  re-scoring.  Hyperplanes are derived deterministically from md5 so
  the bucketing is reproducible across engines and runs.

At 100 TB the corpus side stays partitioned; only the Q query vectors
broadcast.  Cosine is a sequential left-to-right double fold — the same
evaluation order DuckDB uses, so results hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.schemas import load_table


def _cosine(a: str, b: str) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def sq_norm(col: str) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    return dot / (sq_norm(a) * sq_norm(b))


def brute_force_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: first `n_queries` vec_ids as queries vs the
    whole corpus.  Query side is broadcast; ranking is a per-query
    window with deterministic tie-break on corpus vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            F.round(_cosine("q_emb", "c_emb"), 9).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


N_PLANES = 4  # 4 sign bits -> 16 buckets


def _plane(dim: int, p: int) -> Column:
    """Deterministic pseudo-random hyperplane p: component j is
    ±1 from the parity of hex digit j of md5('plane-p-j').

    Engine-portable (md5-derived) and cheap: a ±1 plane turns the dot
    product into signed sums.  DuckDB computes the identical plane.
    """
    comps = [
        (
            F.conv(F.substring(F.md5(F.lit(f"plane-{p}-{j}")), 1, 1), 16, 10)
            .cast("int") % 2
        ) * 2 - 1
        for j in range(dim)
    ]
    return F.array(*[c.cast("double") for c in comps])


def lsh_bucket(emb_col: str, dim: int = 64) -> Column:
    """Bucket id = concatenated sign bits of N_PLANES projections."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                emb_col,
                _plane(dim, p),
                lambda x, pl: x.cast("double") * pl,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Approximate top-k: exact re-scoring restricted to the query's
    LSH bucket.  At scale the corpus is hash-partitioned by bucket, so
    each query probes one partition group instead of the full corpus."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket("embedding")
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("q_bucket") == F.col("c_bucket"))
        .where(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            F.round(_cosine("q_emb", "c_emb"), 9).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
