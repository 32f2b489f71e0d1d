"""Stateful streaming sessionization (applyInPandasWithState): an open
session must survive across micro-batches — events for the same user
split over two files still form ONE session when within the gap, and a
later out-of-gap event closes it with the right bounds/counts."""

import os
import time

import pandas as pd
import pytest

from pdf_parser_spark.streaming.sessions import streaming_sessionize

GAP_US = 1_000_000  # 1s session gap


def _write(src: str, name: str, rows: list[tuple[int, int]]):
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(rows, columns=["user_id", "us"]).astype("int64").to_parquet(
        os.path.join(src, f"{name}.parquet"), index=False
    )


def test_sessions_span_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: user 1 events at t=0ms and 300ms (in-gap, session stays open)
    _write(src, "w1", [(1, 0), (1, 300_000)])
    # wave 2 (separate micro-batch): 600ms continues the SAME session;
    # 5s starts a new one, closing the first
    _write(src, "w2", [(1, 600_000), (1, 5_000_000)])

    stream = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", 1)  # force one file per micro-batch
        .parquet(src)
    )
    q = (
        streaming_sessionize(stream, GAP_US)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # the first session (3 events across two micro-batches) is closed by
    # the 5s event; the second session is still open (not emitted)
    assert rows == {(1, 0, 600_000, 3)}
