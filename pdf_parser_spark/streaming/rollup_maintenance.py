"""Continuous-aggregate maintenance: keep the multi-resolution rollup
ladder (operators/rollup.py) current as events stream in.

Shape: ``readStream`` over an events directory → ``foreachBatch`` →
``refresh_rollup`` — each micro-batch merges its (small) delta ladder
into the previous ladder snapshot; raw history is never rescanned.

Exactly-once without a transactional sink: ladder snapshots are
VERSIONED BY BATCH ID (``ladder_dir/batch=N`` holds the ladder state
*after* batch N, written with overwrite). ``foreachBatch`` can replay
a batch whose write finished but whose offset commit didn't; the
replay re-reads snapshot N−1 (stable input) and overwrites snapshot N
— byte-identical output, idempotent. Readers take the highest
committed batch via :func:`read_ladder`.

At production scale the snapshot chain becomes MERGE INTO an Iceberg
rollup table partitioned by (level_us, bucket-time-range): a delta
touches O(|delta|) buckets, so only those partitions rewrite, and
Iceberg's snapshot isolation replaces the batch-id versioning here.
The maintenance invariant is the same one tests/test_rollup.py pins:
incremental refresh ≡ full recompute, bit-exact (decimal partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pdf_parser_spark.operators.rollup import refresh_rollup, rollup_time_buckets


def _snapshot_ids(spark: SparkSession, ladder_dir: str) -> list[int]:
    # Hadoop FS listing (works for local paths and object stores alike;
    # os.listdir would break on hdfs:// / s3a:// URIs)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(ladder_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.startswith("batch=") and fs.exists(
            jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def read_ladder(spark: SparkSession, ladder_dir: str) -> DataFrame | None:
    """The most recent committed ladder snapshot, or None if empty."""
    ids = _snapshot_ids(spark, ladder_dir)
    if not ids:
        return None
    return spark.read.parquet(f"{ladder_dir}/batch={ids[-1]}")


def make_refresh_fn(
    ladder_dir: str,
    ts_us_col: str,
    key_cols: list[str],
    value_col: str,
    widths_us: list[int],
):
    """The foreachBatch function: merge this micro-batch into the
    latest ladder snapshot strictly OLDER than this batch id (a replay
    of batch N must not read N's own partial output)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev_ids = [i for i in _snapshot_ids(spark, ladder_dir) if i < batch_id]
        if prev_ids:
            prev = spark.read.parquet(f"{ladder_dir}/batch={prev_ids[-1]}")
            merged = refresh_rollup(
                prev, batch_df, ts_us_col, key_cols, value_col, widths_us
            )
        else:
            merged = rollup_time_buckets(
                batch_df, ts_us_col, key_cols, value_col, widths_us,
                exact_sums=True,
            )
        merged.write.mode("overwrite").parquet(f"{ladder_dir}/batch={batch_id}")

    return process


def start_rollup_maintenance(
    spark: SparkSession,
    source_dir: str,
    ladder_dir: str,
    checkpoint_dir: str,
    schema,
    ts_us_col: str,
    key_cols: list[str],
    value_col: str,
    widths_us: list[int],
    max_files_per_trigger: int = 1,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the ladder-maintenance stream; returns the query handle."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(
        make_refresh_fn(ladder_dir, ts_us_col, key_cols, value_col, widths_us)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
