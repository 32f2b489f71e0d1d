"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, and a
sign-pattern-bucketed (LSH-style) variant as the scale path: bucketing
on the sign bits of the leading dimensions turns the O(Q·N) cross
product into per-bucket joins — the candidate set shrinks by ~2^B
while recall stays high for clustered data. Both are pure Catalyst
expressions (zip_with/aggregate dot products — JVM-side, no Python).

At cluster scale: queries are broadcast (small side), the corpus scan
stays partition-parallel, and per-partition top-k (row_number over
query) avoids a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), decimals)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int,
) -> DataFrame:
    """Brute-force cosine top-k per query (broadcast the query side)."""
    joined = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.withColumn("cos_sim", cosine(F.col(vec_col), F.col(query_vec_col)))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", F.col("rk").cast("bigint").alias("rk"))
    )


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """LSH-style blocking key: sign bits of the first ``bits`` dims."""
    key = F.lit(0).cast("bigint")
    for j in range(bits):
        key = key + F.when(F.element_at(vec, j + 1) > 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return key


def bucketed_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int,
    bits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket, then exact cosine re-rank within the bucket."""
    c = corpus.withColumn("bucket", sign_bucket(F.col(vec_col), bits))
    q = queries.withColumn("bucket", sign_bucket(F.col(query_vec_col), bits))
    joined = c.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.withColumn("cos_sim", cosine(F.col(vec_col), F.col(query_vec_col)))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", F.col("rk").cast("bigint").alias("rk"))
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    bits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-bucket blocking
    (candidates must agree on the leading sign bits) then exact cosine
    ≥ threshold. The blocking turns the O(N²) pair space into
    per-bucket joins — the standard near-dup plan at corpus scale."""
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
