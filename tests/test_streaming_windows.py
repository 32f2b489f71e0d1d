"""Watermarked tumbling-window aggregation: append-mode emission after
watermark passage, and late-event drop — the two behaviors the batch
twin (w12 gate) cannot show."""

import os
import time

import pandas as pd

from pdf_parser_spark.streaming.windows import start_windowed_counts

H = 3_600  # seconds


def _write(src: str, name: str, rows: list[tuple[str, int]]):
    os.makedirs(src, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["event_type", "sec"])
    # tz-aware (UTC) microsecond timestamps → parquet TIMESTAMP (LTZ),
    # the type withWatermark requires (NTZ event time is rejected)
    pdf["ts"] = pd.to_datetime(pdf.pop("sec"), unit="s", utc=True).astype(
        "datetime64[us, UTC]"
    )
    pdf.to_parquet(os.path.join(src, f"{name}.parquet"), index=False)
    time.sleep(0.05)  # distinct mtimes → deterministic file order


def test_watermark_emits_closed_windows_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: two events in the 10:00 window, one at 11:00 that will
    # advance the watermark (30 min delay) to 10:30 after the batch
    _write(src, "w1", [("click", 10 * H), ("click", 10 * H + 300), ("view", 11 * H)])
    # wave 2: advances the watermark to 11:10 (closing the 11:00 window)
    _write(src, "w2", [("view", 11 * H + 2400)])
    # wave 3: a LATE event at 09:02 — its window [09:00, 09:10) ended
    # before the watermark, so it is dropped (measured: Spark applies
    # the late-row filter from the batch AFTER the watermark advance —
    # numRowsDroppedByWatermark=1 here; a late row in the very batch
    # that advances past it may still be aggregated, which is within
    # Structured Streaming's one-sided lateness guarantee) — plus a
    # 12:50 event that closes the 11:40 window
    _write(src, "w3", [("click", 9 * H + 120), ("view", 12 * H + 3000)])

    stream = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_windowed_counts(
        stream, out, ckpt, window_duration="10 minutes", watermark="30 minutes"
    )
    q.awaitTermination(120)

    import pyspark.sql.functions as F

    rows = {
        (r["start_s"], r["event_type"], r["n_events"])
        for r in spark.read.parquet(out)
        .select(
            F.col("window_start").cast("long").alias("start_s"),  # epoch s, tz-safe
            "event_type",
            "n_events",
        )
        .collect()
    }
    # the 10:00 click window closed (watermark 10:30 > 10:10) with BOTH
    # wave-1 clicks aggregated into ONE row across micro-batches; the
    # late 09:02 click was dropped (no 09:00 window row ever emitted);
    # the 11:00 and 11:40 view windows each closed exactly once
    assert (10 * H, "click", 2) in rows
    assert not any(start == 9 * H for start, _t, _n in rows), rows
    assert (11 * H, "view", 1) in rows
    assert (11 * H + 2400, "view", 1) in rows
    # the 12:50 window is still open (watermark 12:20 < 13:00): no row
    assert not any(start == 12 * H + 3000 for start, _t, _n in rows), rows
