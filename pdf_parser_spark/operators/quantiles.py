"""Exact per-group quantiles by distributed order statistics.

``percentile_approx`` (KLL-ish) and engine-native exact ``percentile``
both have cross-engine-unfriendly semantics (approximation error /
interpolation arithmetic); this operator uses the discrete
order-statistic definition — the value at rank ``ceil(q·n)`` — with
the rank computed in INTEGER arithmetic (``(n·k + 99) div 100`` for
percentile ``k``), so Spark and any external oracle agree bit-exactly
with no floating-point rank edge cases (``0.1 * 140`` in doubles is
``14.000000000000002``; integer ceil-division has no such trap).

Scale posture: one shuffle on the group keys into a per-group SORT
window (sort-based, spill-friendly — unlike ``percentile``'s
collect-all-values-into-one-array aggregate, a straggler/OOM magnet
for hot groups at 100 TB). ``row_number`` + ``count`` share the same
window partitioning, so Catalyst plans a single Exchange. The
percentile fan-out (``explode``) happens AFTER ranking on the already
sorted rows and multiplies rows only transiently before the rank
filter prunes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: list[int],
) -> DataFrame:
    """``(group_cols..., q, value)``: for each integer percentile ``q``
    in ``percentiles``, the exact discrete quantile of ``value_col``
    within the group — the value at rank ``ceil(q·n/100)`` of the
    ascending sort (1-based). ``q=50`` is the lower median, ``q=100``
    the maximum; ties collapse to the same value whichever physical
    row holds the rank."""
    if not percentiles:
        raise ValueError("percentiles must be non-empty")
    for q in percentiles:
        if not (isinstance(q, int) and 1 <= q <= 100):
            raise ValueError(f"percentiles must be integers in [1,100], got {q}")

    sort_win = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    grp_win = Window.partitionBy(*group_cols)
    ranked = (
        # NULLs are excluded (standard percentile semantics): Spark sorts
        # NULLS FIRST ascending while most SQL engines default NULLS LAST,
        # so keeping them would both skew ranks cross-engine and let NULL
        # be returned as a quantile value.
        df.select(*group_cols, value_col)
        .filter(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(sort_win))
        .withColumn("_n", F.count(F.lit(1)).over(grp_win))
    )
    qarr = F.array(*[F.lit(int(q)) for q in percentiles])
    return (
        ranked.withColumn("q", F.explode(qarr))
        # integer ceil-division: ceil(n*q/100) == (n*q + 99) div 100
        .filter(F.col("_rn") == F.expr("(_n * q + 99) div 100"))
        .select(*group_cols, F.col("q").cast("bigint").alias("q"),
                F.col(value_col).alias("value"))
    )


def exact_group_quantiles_oracle_sql(
    table: str,
    group_cols: list[str],
    value_sql: str,
    percentiles: list[int],
) -> str:
    """The identical order-statistic selection in ANSI SQL for the
    DuckDB oracle — same integer ceil-division rank, same discrete
    semantics."""
    gcols = ", ".join(group_cols)
    plist = ", ".join(str(int(q)) for q in percentiles)
    return f"""
WITH r AS (
  SELECT {gcols}, {value_sql} AS v,
         row_number() OVER (PARTITION BY {gcols} ORDER BY {value_sql}) AS rn,
         count(*) OVER (PARTITION BY {gcols}) AS n
  FROM {table} WHERE {value_sql} IS NOT NULL),
q AS (SELECT unnest([{plist}]) AS q)
SELECT {gcols}, CAST(q AS BIGINT) AS q, v AS value
FROM r, q WHERE rn = (n * q + 99) // 100
ORDER BY {gcols}, q
"""
