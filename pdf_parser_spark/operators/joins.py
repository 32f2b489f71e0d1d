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
    variant lives in the per-doc kernel).

    Scale posture: the argmin runs as ``min_by`` over a lexicographic
    (distance, tie_break...) struct — a PARTIAL-aggregatable groupBy,
    so each task combines its candidate pairs down to one row per left
    key before the shuffle. The join blow-up (|left| × candidates per
    equi-key group) never crosses the wire; a window-rank plan would
    shuffle and sort every candidate pair. ``left_keys`` must identify
    a left row (the operator's contract), so every surviving column is
    constant within a group and rides inside the min_by payload.
    ``tie_break`` should totally order candidates for a deterministic
    winner; rows with NULL distance are dropped before the argmin (a
    NULL ``_dist`` field sorts FIRST in ascending struct comparison, so
    without the filter it would win min_by, not lose).
    """
    joined = left.join(right, equi_keys, "inner").withColumn("_dist", distance)
    joined = joined.filter(F.col("_dist").isNotNull())
    if max_distance is not None:
        joined = joined.filter(F.col("_dist") <= max_distance)
    ordering = F.struct(F.col("_dist"), *(tie_break or []))
    payload = F.struct(*[F.col(c) for c in joined.columns])
    best = joined.groupBy(*[F.col(k) for k in left_keys]).agg(
        F.min_by(payload, ordering).alias("_best")
    )
    return best.select("_best.*")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tie_col: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join: attach to each left row the ``payload``
    columns of the most recent right row with ``right_ts <= left_ts``
    (strictly ``<`` when ``allow_exact_matches=False``) within the same
    ``on`` group. Ties on ``right_ts`` are broken toward the largest
    ``tie_col`` (which must be one of ``payload``) so the result is
    deterministic under any partitioning.

    Scale posture: union-tag + running ``last(ignorenulls)`` — ONE
    shuffle on the ``on`` keys and a single sort within each group. No
    inequality join, so no per-left candidate explosion and no range
    re-partitioning: the cost is O(|left|+|right|) rows through one
    exchange, independent of how many right rows precede each left row
    (an inequality-join plan degrades to per-key cross products on hot
    keys; this form cannot). Left rows with no prior right row keep
    NULL payloads (left-join semantics). Right rows with NULL
    ``right_ts`` are dropped — under the ascending union sort they
    would act as a before-time-began sentinel attached to every
    otherwise-unmatched left row. ``<payload>_r`` names are reserved:
    a left column already named that would silently collide through
    unionByName, so it is rejected.
    """
    for p in payload:
        if f"{p}_r" in left.columns:
            raise ValueError(
                f"left column '{p}_r' collides with the reserved as-of "
                f"payload name for '{p}'"
            )
    left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)
    right = right.filter(F.col(right_ts).isNotNull())
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(p).alias(f"{p}_r") for p in payload],
    ).withColumn("_asof_side", F.lit(right_side))
    l2 = left.withColumn("_asof_ts", F.col(left_ts)).withColumn(
        "_asof_side", F.lit(left_side)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    order = [F.col("_asof_ts").asc(), F.col("_asof_side").asc()]
    if tie_col is not None:
        order.append(F.col(f"{tie_col}_r").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for p in payload:
        u = u.withColumn(f"{p}_r", F.last(f"{p}_r", ignorenulls=True).over(w))
    return u.filter(F.col("_asof_side") == left_side).drop("_asof_side", "_asof_ts")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[str],
    left_ts: str,
    right_ts: str,
    radius: int,
) -> DataFrame:
    """Symmetric band theta-join: all (left, right) pairs with
    ``|left_ts - right_ts| <= radius`` sharing ``equi_keys``, planned
    as an EQUI-join. The left side explodes to its bucket of width
    ``radius`` plus both neighbors; the right side maps to its single
    bucket — any pair within the band shares one of the three bucket
    ids, and exactly one (the right row's own bucket), so no
    post-join dedup is needed. The exact band predicate runs as a
    post-join filter.

    Scale posture: 3x fan-out of the (typically narrower) left side
    buys a hash/sort-merge join on (equi_keys, bucket) instead of a
    per-key cross product — candidate pairs are bounded by band
    density, not by key cardinality. Column names other than
    ``equi_keys`` must be disjoint between the two sides (standard
    Spark join hygiene). ``radius`` is in the timestamp's own unit and
    must be a positive integer (bucket ids use exact integer
    division, no double rounding at epoch-microsecond magnitudes).
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    b = F.expr(f"{right_ts} div {radius}")
    r2 = right.withColumn("_rj_bucket", b)
    lb = F.expr(f"{left_ts} div {radius}")
    l2 = left.withColumn(
        "_rj_bucket",
        F.explode(F.array(lb - 1, lb, lb + 1)),
    )
    out = l2.join(r2, equi_keys + ["_rj_bucket"], "inner").filter(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= radius
    )
    return out.drop("_rj_bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int,
    salt_src: str,
) -> DataFrame:
    """Skew-salted inner equi-join: the (smaller) ``right`` side is
    replicated once per salt value; each ``left`` row computes a
    deterministic salt from ``salt_src`` (a column that varies WITHIN
    hot join keys — a row id, not the join key) and joins on
    ``(on, salt)``. Result set is identical to ``left.join(right, on)``
    — every left row still meets every matching right row exactly once
    (via its own salt's replica) — but a hot key's rows now spread
    across ``n_salts`` shuffle partitions instead of hammering one
    reducer.

    This is the explicit fallback for when AQE's skew-join splitting
    can't fire (e.g. the skew is born in the shuffle write, or the
    join feeds a window that pins partitioning). Replication cost is
    |right| × n_salts, so it suits dimension-sized right sides; for
    two large skewed sides, split hot keys out and salt only them.
    """
    if n_salts <= 0:
        raise ValueError(f"n_salts must be positive, got {n_salts}")
    r2 = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    l2 = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    )
    return l2.join(r2, [on, "_salt"], "inner").drop("_salt")


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
