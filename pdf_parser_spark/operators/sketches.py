"""Distinct-count sketching: a KMV (k-minimum-values) estimator.

Engine-built-in HLL sketches (`approx_count_distinct`) differ between
Spark and DuckDB, so they can't be oracle-checked value-for-value. KMV
over the deterministic md5-derived hash IS: both engines keep the k
smallest 60-bit hashes per group and apply the same estimator
``(k-1) / (max_kth_hash / 2^60)`` — identical arithmetic, identical
result, still one shuffle and O(k) state per group at any scale.

Estimator: Bar-Yossef et al., "Counting distinct elements in a data
stream" (RANDOM 2002) — the classic KMV bottom-k construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_parser_spark.operators.dedup import md5_long

HASH_SPACE = float(1 << 60)  # md5_long yields 15 hex chars = 60 bits


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 8
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Exact when a group has fewer than k distinct values (the sketch
    holds them all); the KMV estimate otherwise."""
    hashed = df.select(
        F.col(group_col), md5_long(F.col(value_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    bottom_k = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = bottom_k.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_hash")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((F.lit(float(k - 1))) / (F.col("kth_hash") / F.lit(HASH_SPACE)))
    return agg.select(
        F.col(group_col),
        F.round(est, 2).alias("distinct_est"),
        F.col("n_kept").alias("sketch_size"),
    )


def kmv_oracle_sql(table: str, group_col: str, value_col: str, k: int = 8) -> str:
    """The identical computation in ANSI SQL for the DuckDB oracle."""
    return f"""
WITH hashed AS (
  SELECT DISTINCT {group_col},
         CAST(concat('0x', substr(md5({value_col}), 1, 15)) AS BIGINT) AS h
  FROM {table}),
bottom_k AS (
  SELECT {group_col}, h,
         row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
  FROM hashed),
agg AS (
  SELECT {group_col}, count(*) AS n_kept, max(h) AS kth_hash
  FROM bottom_k WHERE rn <= {k} GROUP BY {group_col})
SELECT {group_col},
       round(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                  ELSE {float(k - 1)} / (kth_hash / {HASH_SPACE}) END, 2) AS distinct_est,
       CAST(n_kept AS BIGINT) AS sketch_size
FROM agg ORDER BY {group_col}
"""
