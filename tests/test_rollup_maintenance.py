"""Streaming ladder maintenance: a multi-wave availableNow stream must
leave the ladder bit-identical to a batch recompute over all events,
and a foreachBatch REPLAY (crash between sink write and offset commit)
must be idempotent."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.rollup import rollup_time_buckets
from pdf_parser_spark.streaming.rollup_maintenance import (
    make_refresh_fn,
    read_ladder,
    start_rollup_maintenance,
)

WIDTHS = [100, 1000]
SCHEMA = "us long, key string, value double"


def _events(spark, lo, hi):
    rows = [
        (((i * 7919) % 4003) * 3, f"k{i % 3}", ((i * 37) % 997) / 100.0)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_streamed_ladder_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ladder = str(tmp_path / "ladder")
    ckpt = str(tmp_path / "ckpt")
    # three waves, one file each -> three micro-batches
    for wave, (lo, hi) in enumerate([(0, 150), (150, 320), (320, 500)]):
        _events(spark, lo, hi).coalesce(1).write.mode("append").parquet(src)
    q = start_rollup_maintenance(
        spark, src, ladder, ckpt, SCHEMA, "us", ["key"], "value", WIDTHS,
        max_files_per_trigger=1, available_now=True,
    )
    q.awaitTermination(120)
    got = read_ladder(spark, ladder)
    assert got is not None
    want = rollup_time_buckets(
        _events(spark, 0, 500), "us", ["key"], "value", WIDTHS, exact_sums=True
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # one committed snapshot per micro-batch
    snaps = [d for d in os.listdir(ladder) if d.startswith("batch=")]
    assert len(snaps) == 3


def test_replayed_batch_is_idempotent(spark, tmp_path):
    ladder = str(tmp_path / "ladder2")
    fn = make_refresh_fn(ladder, "us", ["key"], "value", WIDTHS)
    fn(_events(spark, 0, 200), 0)
    fn(_events(spark, 200, 400), 1)
    after_first = sorted(map(tuple, read_ladder(spark, ladder).collect()))
    # crash-between-write-and-commit: batch 1 replays with the same data
    fn(_events(spark, 200, 400), 1)
    after_replay = sorted(map(tuple, read_ladder(spark, ladder).collect()))
    assert after_first == after_replay
    want = rollup_time_buckets(
        _events(spark, 0, 400), "us", ["key"], "value", WIDTHS, exact_sums=True
    )
    assert after_replay == sorted(map(tuple, want.collect()))
