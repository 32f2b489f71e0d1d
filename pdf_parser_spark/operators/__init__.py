"""Relational operator library (SURVEY.md §2 families, generic forms).

Each operator here is the declarative Spark form of a geometric pass
the extraction kernel performs sequentially per-document — expressed
over arbitrary DataFrames so Catalyst owns the physical plan (shuffle
placement, broadcast choice, AQE skew handling, whole-stage codegen).
These are the engine's public analytic surface and the driver's
oracle-checked queries; the per-doc grouped-map kernel in
``plans.geometry`` uses the same semantics where greedy order matters.
"""

from pdf_parser_spark.operators.windows import (  # noqa: F401
    consecutive_dedup,
    lead_bound,
    sessionize,
    topk_per_group,
)
from pdf_parser_spark.operators.joins import (  # noqa: F401
    asof_join,
    bucketed_range_join,
    interval_containment_join,
    nearest_assign,
    priority_dedupe,
    salted_join,
)
from pdf_parser_spark.operators.quantiles import (  # noqa: F401
    exact_group_quantiles,
)
from pdf_parser_spark.operators.rollup import (  # noqa: F401
    refresh_rollup,
    rollup_time_buckets,
)
