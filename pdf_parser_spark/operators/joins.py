"""Join operators (SURVEY.md §2.3 J1-J9, relational forms).

Scale posture: containment/nearest joins carry an equi-key prefix
(page, section, nation…) so Spark plans them as hash/sort-merge joins
with the theta predicate as a post-join filter — never a global cross
join. Small sides should be broadcast by the caller (``F.broadcast``)
or left to AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_containment_join(
    points: DataFrame,
    intervals: DataFrame,
    equi_keys: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """J2/P2 — point-in-interval containment with an equi-key prefix
    (reference: checkbox y within section region [y1,y2],
    /root/reference/extractor.py:831-832)."""
    ivl = intervals
    for k in equi_keys:
        ivl = ivl.withColumnRenamed(k, f"__ivl_{k}")
    cond = None
    for k in equi_keys:
        c = points[k] == ivl[f"__ivl_{k}"]
        cond = c if cond is None else (cond & c)
    theta = points[point_col].between(ivl[lo_col], ivl[hi_col])
    cond = theta if cond is None else (cond & theta)
    return points.join(ivl, cond, how).drop(*[f"__ivl_{k}" for k in equi_keys])


def nearest_assign(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[str],
    distance: Column,
    left_keys: list[str],
    tie_break: list[Column] | None = None,
    max_distance: float | None = None,
) -> DataFrame:
    """J3 — nearest-neighbor theta join: for each left row, the right
    row minimizing ``distance`` within the same equi-key group
    (reference: label → nearest checkbox by L1 distance,
    /root/reference/extractor.py:894-938; the greedy one-to-one
    variant lives in the per-doc kernel)."""
    joined = left.join(right, equi_keys, "inner").withColumn("_dist", distance)
    if max_distance is not None:
        joined = joined.filter(F.col("_dist") <= max_distance)
    w = Window.partitionBy(*[F.col(k) for k in left_keys]).orderBy(
        F.col("_dist").asc(), *(tie_break or [])
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def priority_dedupe(
    df: DataFrame,
    cluster_keys: list[str],
    priority: list[Column],
) -> DataFrame:
    """J1/W3/J8 — keep the highest-priority row per cluster
    (reference: greedy NMS keeps the highest-confidence box per 5px
    neighborhood, /root/reference/extractor.py:155-181; claimed-anchor
    priority, extractor.py:763-807). Exact greedy NMS parity over
    chained neighborhoods runs in the per-doc kernel; this relational
    form covers the disjoint-cluster case."""
    w = Window.partitionBy(*cluster_keys).orderBy(*priority)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
