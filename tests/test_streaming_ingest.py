"""Structured Streaming ingestion: files landing in two waves are
extracted exactly once each, and the union equals batch extraction
over the same documents (no drift between the streaming and batch
paths); a restarted stream re-processes nothing."""

import os

import pandas as pd
import pytest

from pdf_parser_spark.fixtures.generator import doc_spans
from pdf_parser_spark.plans.extract import extract_spans
from pdf_parser_spark.streaming.ingest import start_ingest


def _write_wave(src_dir: str, doc_ids: list[str], name: str):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src_dir, exist_ok=True)
    # explicit arrow schema: streaming reads with the declared
    # input_hint schema (offset:int32), so the files must match it
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("spans", pa.list_(pa.struct([
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]))),
        ]
    )
    table = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": [doc_spans(d) for d in doc_ids]}, schema=schema
    )
    pq.write_table(table, os.path.join(src_dir, f"{name}.parquet"))


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt"))


def test_stream_matches_batch_and_is_exactly_once(spark, dirs):
    src, out, ckpt = dirs
    wave1 = [f"stream_{i:04d}" for i in range(8)]
    wave2 = [f"stream_{i:04d}" for i in range(8, 14)]

    _write_wave(src, wave1, "wave1")
    q = start_ingest(spark, src, out, ckpt)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    assert set(r["doc_id"] for r in got1.select("doc_id").distinct().collect()) == set(wave1)

    # second wave + restart: only the new file is processed
    _write_wave(src, wave2, "wave2")
    q = start_ingest(spark, src, out, ckpt)
    q.awaitTermination(120)

    result = spark.read.parquet(out)
    batch = extract_spans(spark.read.parquet(f"{src}/*.parquet"))
    got = {(r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"]) for r in result.collect()}
    exp_rows = batch.collect()
    exp = {(r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"]) for r in exp_rows}
    assert got == exp
    # exactly-once: no duplicate rows from the restart
    assert result.count() == len(exp_rows)

    # third start with nothing new: a no-op
    q = start_ingest(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(exp_rows)
