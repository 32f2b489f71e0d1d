"""Multi-resolution time-bucket rollup (hypertable-style continuous
aggregate): count / sum / min / max at a ladder of bucket widths,
where every coarser level re-aggregates the next finer level's
partials instead of rescanning raw data.

Scale posture: the raw table is scanned ONCE (the finest level); each
coarser level is a groupBy over the previous level's output, whose row
count is bounded by (time range / width) × key cardinality — typically
orders of magnitude smaller than the raw table, so the ladder costs
one full shuffle plus a telescoping series of tiny ones. This is the
standard continuous-aggregate maintenance shape: at stream time the
finest level is the only one that touches events, and coarser levels
refresh from it incrementally.

Correctness: count/min/max compose trivially; sums aggregate as exact
``decimal(18,6)`` so partial-sum ORDER cannot perturb the result —
re-aggregating partials is bit-identical to a direct aggregation of
the raw data (the property the oracle gate checks by computing every
level directly from raw rows).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_time_buckets(
    df: DataFrame,
    ts_us_col: str,
    key_cols: list[str],
    value_col: str,
    widths_us: list[int],
) -> DataFrame:
    """Return the union of all rollup levels with columns
    ``(level_us, bucket_us, *key_cols, n, sum_value, min_value,
    max_value)``. ``widths_us`` must be ascending and each width a
    multiple of the previous one (so finer buckets nest exactly into
    coarser ones — the precondition for re-aggregation)."""
    if not widths_us:
        raise ValueError("widths_us must be non-empty")
    for a, b in zip(widths_us, widths_us[1:]):
        if b % a != 0 or b <= a:
            raise ValueError(
                f"widths must be ascending and nest exactly: {b} is not a "
                f"proper multiple of {a}"
            )

    w0 = widths_us[0]
    finest = (
        df.withColumn("bucket_us", F.expr(f"({ts_us_col} div {w0}) * {w0}"))
        .groupBy("bucket_us", *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact decimal sum: partial-order-insensitive, and union-
            # normalized to the widest type Spark's sum-of-decimal
            # reaches so every level carries the same schema
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("_sum_dec"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    levels = [finest.withColumn("level_us", F.lit(w0).cast("long"))]
    for w in widths_us[1:]:
        prev = levels[-1]
        levels.append(
            prev.withColumn("bucket_us", F.expr(f"(bucket_us div {w}) * {w}"))
            .groupBy("bucket_us", *key_cols)
            .agg(
                F.sum("n").alias("n"),
                F.sum("_sum_dec").cast("decimal(38,6)").alias("_sum_dec"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .withColumn("level_us", F.lit(w).cast("long"))
        )
    out = reduce(DataFrame.unionByName, levels)
    return out.select(
        "level_us",
        "bucket_us",
        *key_cols,
        "n",
        F.col("_sum_dec").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )
