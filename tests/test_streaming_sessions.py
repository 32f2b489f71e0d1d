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


def test_batch_replay_matches_window_sessionize(spark):
    """The oracle-gate harness (batch_replay_sessions) must reproduce
    the lag+cumsum window sessionization exactly, INCLUDING sessions
    that span replay-wave boundaries (state carried across waves) and
    the final open-session flush."""
    from pdf_parser_spark.operators.windows import sessionize
    from pdf_parser_spark.streaming.sessions import batch_replay_sessions

    import pyspark.sql.functions as F

    rows = []
    # user 7: 9 events, 0.4s apart (one long session crossing every
    # 3-event wave boundary), then a 10s jump starting session 2
    rows += [(7, i * 400_000) for i in range(9)] + [(7, 20_000_000)]
    # user 8: single event (open session flushed with n=1)
    rows += [(8, 5)]
    # user 9: two sessions split exactly at a wave boundary
    rows += [(9, 0), (9, 100_000), (9, 200_000), (9, 9_000_000), (9, 9_100_000)]
    ev = spark.createDataFrame(rows, "user_id long, us long")

    got = {
        tuple(r)
        for r in batch_replay_sessions(ev, GAP_US, n_waves=3).collect()
    }
    w = sessionize(ev, ["user_id"], "us", GAP_US)
    exp = {
        tuple(r)
        for r in w.groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_id")
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect()
    }
    assert got == exp
    assert (7, 0, 3_200_000, 9) in got and (8, 5, 5, 1) in got


def _builtin_sessions(spark, ev, gap_us: int):
    """Gap sessions via Spark's built-in session_window (the w14 gate's
    plan shape), projected to the same (user_id, start, last-event,
    n_events) tuple the custom operator emits."""
    import pyspark.sql.functions as F

    evt = ev.withColumn("ts", F.expr("timestamp_micros(us)"))
    agg = evt.groupBy(F.session_window("ts", f"{gap_us} microseconds"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return {
        tuple(r)
        for r in agg.select(
            "user_id",
            F.expr("unix_micros(session_window.start)").alias("session_start_us"),
            (F.expr("unix_micros(session_window.end)") - gap_us).alias("session_end_us"),
            "n_events",
        ).collect()
    }


def test_session_window_twin_matches_custom_off_boundary(spark):
    """w14 (built-in session_window) ≡ w11 (custom state fn) whenever
    no inter-event gap equals the threshold EXACTLY — the regime real
    corpora live in, and why the built-in suffices for plain gap
    sessionization."""
    from pdf_parser_spark.streaming.sessions import batch_replay_sessions

    rows = [(7, i * 400_000) for i in range(9)] + [(7, 20_000_000)]
    rows += [(8, 5)]
    rows += [(9, 0), (9, 100_000), (9, 200_000), (9, 9_000_000), (9, 9_100_000)]
    ev = spark.createDataFrame(rows, "user_id long, us long")

    got_builtin = _builtin_sessions(spark, ev, GAP_US)
    got_custom = {
        tuple(r) for r in batch_replay_sessions(ev, GAP_US, n_waves=3).collect()
    }
    assert got_builtin == got_custom


def test_session_window_boundary_semantics_match(spark):
    """Boundary pin (measured, not assumed): an event EXACTLY ``gap``
    after its predecessor MERGES under the built-in too — Spark
    coalesces the adjacent [t, t+gap) windows — matching the custom
    state fn's strict ``> gap`` break. This is why w14 shares w11's
    lag+cumsum oracle verbatim; were the built-in half-open, the two
    would diverge on exact-boundary ties."""
    from pdf_parser_spark.streaming.sessions import batch_replay_sessions

    ev = spark.createDataFrame(
        [(1, 0), (1, GAP_US), (1, 3 * GAP_US + 1)], "user_id long, us long"
    )
    got_builtin = _builtin_sessions(spark, ev, GAP_US)
    got_custom = {
        tuple(r) for r in batch_replay_sessions(ev, GAP_US, n_waves=1).collect()
    }
    expected = {(1, 0, GAP_US, 2), (1, 3 * GAP_US + 1, 3 * GAP_US + 1, 1)}
    assert got_builtin == expected
    assert got_custom == expected
