"""Event-time tumbling-window aggregation with watermarked late-data
handling (Structured Streaming) and its batch twin.

The reference has no streaming notion at all; a continuous ingest
pipeline needs per-window accounting (documents/spans per source per
window, error rates) that tolerates late events without unbounded
state. This is the engine's standard shape for that:

- ``windowed_counts`` builds the groupBy(window(ts), keys) aggregation.
  On a STREAM, pass ``watermark=`` — Spark bounds state by dropping
  windows older than (max event time seen − watermark) and, in append
  mode, only emits a window once the watermark passes its end
  (exactly-once, late-data-tolerant). On a BATCH DataFrame the same
  plan runs as a plain aggregation (``withWatermark`` is a documented
  no-op in batch), which is what the w12 oracle gate value-checks: the
  tumbling bucketing is epoch-aligned, so DuckDB reproduces it with
  ``us - us % window_us``.

Scale posture: one shuffle on (window, keys); state per live window ×
key only (the watermark is the state bound). Skewed keys behave like
any streaming agg — pre-salt the key and re-merge downstream if one
event_type dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """(window struct, *keys, n_events) tumbling- or sliding-window
    counts (``slide`` < window → overlapping windows; each event lands
    in window/slide buckets, all epoch-aligned).

    ``events``: batch or streaming DataFrame with an event-time
    timestamp column. ``watermark``: e.g. ``"30 minutes"`` — required
    on a stream in append mode (unbounded state / no emissions
    otherwise); ignored by Spark in batch.
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide is not None
        else F.window(ts_col, window_duration)
    )
    return df.groupBy(win, *keys).agg(F.count(F.lit(1)).alias("n_events"))


def start_windowed_counts(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
):
    """Run the windowed aggregation as an append-mode stream to
    parquet: a window's row is written exactly once, after the
    watermark passes its end; events later than the watermark are
    dropped (bounded state). Returns the StreamingQuery handle."""
    agg = windowed_counts(events_stream, window_duration, keys, ts_col, watermark)
    flat = agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in keys],
        "n_events",
    )
    return (
        flat.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
