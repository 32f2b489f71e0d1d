"""Window-function operators (SURVEY.md §2.5 W1-W10, §2.6 O4).

All are pure Catalyst window specs — whole-stage-codegen'd, one shuffle
on the partition keys (reused across chained specs with identical
partitioning, so e.g. sessionize→lead_bound over the same keys plans a
single exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    partition_by: list[str],
    order_col: str,
    gap: Column | float,
    session_col: str = "session_id",
) -> DataFrame:
    """W1/W2 — gap-based clustering (the lag+cumsum sessionize idiom):
    new session when order_col - lag(order_col) > gap. Mirrors the
    reference's checkbox row clustering (y-gap > 50px,
    /root/reference/extractor.py:834-861) and section region growth
    (gap > 100px, extractor.py:809-819), generalized to any axis
    (pixels, timestamps)."""
    w = Window.partitionBy(*partition_by).orderBy(order_col)
    lag = F.lag(F.col(order_col)).over(w)
    is_break = (F.col(order_col) - lag > gap).cast("bigint")
    return df.withColumn(
        session_col,
        F.sum(F.coalesce(is_break, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def topk_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    dense: bool = False,
    rank_col: str = "rk",
) -> DataFrame:
    """W6/O4 — per-group top-k (reference: first-5-line-groups head of
    the next page, extractor.py:362-372, dense over distinct y)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    rank = F.dense_rank() if dense else F.row_number()
    return df.withColumn(rank_col, rank.over(w)).filter(F.col(rank_col) <= k)


def lead_bound(
    df: DataFrame,
    partition_by: list[str],
    order_col: str,
    end_col: str,
    gap: float,
    fallback: Column,
    bound_col: str = "bound",
) -> DataFrame:
    """J4/W9 — right-bound trim: each row's end is clipped to the next
    row's start minus a gap (reference: answer window right bound =
    next question x - 5px, else page width,
    /root/reference/response_extractor.py:901-932)."""
    w = Window.partitionBy(*partition_by).orderBy(order_col)
    nxt = F.lead(F.col(order_col)).over(w)
    return df.withColumn(
        bound_col, F.least(F.col(end_col), F.coalesce(nxt - gap, fallback))
    )


def consecutive_dedup(
    df: DataFrame,
    partition_by: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """A8 — drop rows whose value equals the previous row's value in
    order (reference: identical consecutive answer lines collapsed,
    /root/reference/response_extractor.py:1095-1103)."""
    w = Window.partitionBy(*partition_by).orderBy(order_col)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn("_prev", prev).filter(
        F.col("_prev").isNull() | (F.col(value_col) != F.col("_prev"))
    ).drop("_prev")
