"""Structured Streaming ingestion: continuous extraction of newly
arriving documents.

The reference is strictly batch (SURVEY.md §2.10); at corpus scale the
same pipeline must also run as a continuously fed ingest — new
document files land, get extracted exactly once, and append to the
spans table. This wires the batch `extract_spans` plan into a
file-source stream via ``foreachBatch``:

- source: ``readStream`` over a documents directory (parquet files
  with the input_hint schema); in production this is the Iceberg
  changelog / a landing bucket.
- per micro-batch: the SAME extraction plan as batch mode (fused) —
  no separate code path to drift.
- sink: one parquet directory PER MICRO-BATCH ID, written with
  overwrite (prod: Iceberg `.writeTo(...).append()` with a
  compensation delete on the replayed batch id) — ``foreachBatch`` can
  REPLAY a batch whose write finished but whose offset commit didn't
  (crash in between), and a plain append would duplicate that batch's
  rows; overwriting ``batch_id=N`` is idempotent under replay, making
  the sink exactly-once end-to-end, not just at the offset log.
  Readers use :func:`read_ingested` (or read the root and drop the
  discovered ``batch_id`` partition column).

No watermarks/windows are needed: extraction is per-document
(stateless across documents), so late data is just a later
micro-batch. The stateful cross-page logic lives inside one document
row and never spans batches.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from pdf_parser_spark.schemas import DOCUMENTS_SCHEMA


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    sections: list[dict] | dict | None = None,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Start the continuous extraction stream; returns the query handle."""
    from pdf_parser_spark.plans.extract import extract_spans

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        out = extract_spans(batch_df, sections=sections, mode="fused")
        # idempotent under foreachBatch replay: a crash between this
        # write and the offset commit re-runs the SAME batch_id, and
        # overwrite replaces rather than duplicates its rows
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_ingested(spark: SparkSession, out_dir: str):
    """Read the ingested span table (all batches); drops the
    ``batch_id`` partition column that directory discovery adds."""
    return spark.read.parquet(out_dir).drop("batch_id")
