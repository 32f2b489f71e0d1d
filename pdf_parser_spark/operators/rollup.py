"""Multi-resolution time-bucket rollup (hypertable-style continuous
aggregate): count / sum / min / max at a ladder of bucket widths,
where every coarser level re-aggregates the next finer level's
partials instead of rescanning raw data.

Scale posture: the raw table is scanned ONCE and shuffled ONCE (the
finest level's aggregation); every level — including the finest — is
then produced by ONE second aggregation over the finest partials,
exploded into their per-level bucket memberships. Two exchanges total,
independent of ladder depth. (The naive chained form — each level a
groupBy over the previous level's DataFrame — lazily RECOMPUTES the
whole chain per union branch: L raw scans and 2L exchanges in the
executed plan, which is what tests/test_plan_shapes.py pins against.)
At stream time the finest level is the only one that touches events,
and coarser levels refresh from it incrementally (refresh_rollup).

Correctness: count/min/max compose trivially; sums aggregate as exact
``decimal(18,6)`` so partial-sum ORDER cannot perturb the result —
re-aggregating partials is bit-identical to a direct aggregation of
the raw data (the property the oracle gate checks by computing every
level directly from raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_time_buckets(
    df: DataFrame,
    ts_us_col: str,
    key_cols: list[str],
    value_col: str,
    widths_us: list[int],
    exact_sums: bool = False,
) -> DataFrame:
    """Return the union of all rollup levels with columns
    ``(level_us, bucket_us, *key_cols, n, sum_value, min_value,
    max_value)``. ``widths_us`` must be ascending and each width a
    multiple of the previous one (so finer buckets nest exactly into
    coarser ones — the precondition for re-aggregation).

    ``exact_sums=True`` keeps ``sum_value`` as ``decimal(38,6)``
    instead of double — the MAINTAINABLE form: partials can be merged
    again later (``refresh_rollup``) with zero drift. The double form
    is for final presentation only."""
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
        df.withColumn("_fb", F.expr(f"({ts_us_col} div {w0}) * {w0}"))
        .groupBy("_fb", *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact decimal sum: partial-order-insensitive, and
            # normalized to the widest type Spark's sum-of-decimal
            # reaches so every level carries the same schema
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("_sum_dec"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    # each finest partial belongs to exactly one bucket per level
    # (widths nest) — explode the memberships and aggregate ONCE.
    # Fan-out is L × |finest| (post-aggregation, corpus-sublinear),
    # never L × |raw|.
    out = (
        finest.select(
            *key_cols,
            "n",
            "_sum_dec",
            "min_value",
            "max_value",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).cast("long").alias("level_us"),
                            F.expr(f"(_fb div {w}) * {w}").alias("bucket_us"),
                        )
                        for w in widths_us
                    ]
                )
            ).alias("_lb"),
        )
        .select(
            F.col("_lb.level_us").alias("level_us"),
            F.col("_lb.bucket_us").alias("bucket_us"),
            *key_cols,
            "n",
            "_sum_dec",
            "min_value",
            "max_value",
        )
        .groupBy("level_us", "bucket_us", *key_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("_sum_dec").cast("decimal(38,6)").alias("_sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    sum_out = (
        F.col("_sum_dec").alias("sum_value")
        if exact_sums
        else F.col("_sum_dec").cast("double").alias("sum_value")
    )
    return out.select(
        "level_us",
        "bucket_us",
        *key_cols,
        "n",
        sum_out,
        "min_value",
        "max_value",
    )


def refresh_rollup(
    levels: DataFrame,
    delta: DataFrame,
    ts_us_col: str,
    key_cols: list[str],
    value_col: str,
    widths_us: list[int],
) -> DataFrame:
    """Continuous-aggregate maintenance: merge a micro-batch of new raw
    rows (``delta``) into an existing ``exact_sums=True`` ladder
    WITHOUT rescanning history. The delta's own (small) ladder is
    computed, unioned with the existing one, and re-aggregated per
    (level, bucket, keys) — count/sum/min/max all compose, and the
    decimal sums make the merge bit-identical to recomputing the full
    ladder from scratch (pinned by tests/test_rollup.py).

    Scale posture: cost is O(|delta| + touched buckets), independent of
    history size. In a real deployment the union+re-aggregate becomes a
    MERGE INTO on the rollup table partitioned by (level_us, time);
    only delta-touched partitions rewrite. This is the streaming
    (foreachBatch) half of r1's batch ladder."""
    d = rollup_time_buckets(
        delta, ts_us_col, key_cols, value_col, widths_us, exact_sums=True
    )
    return (
        levels.unionByName(d)
        .groupBy("level_us", "bucket_us", *key_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select("level_us", "bucket_us", *key_cols, "n", "sum_value",
                "min_value", "max_value")
    )
