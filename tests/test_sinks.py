"""Sink selection (Iceberg writeTo vs parquet directories) and the
checkpoint input-fingerprint guard (round-2 VERDICT task 4 + ADVICE).

The sandbox has no Iceberg runtime jar, so the Iceberg path is tested
at the selection/call-chain level with a stub catalog conf and a
recording DataFrame double; the parquet path runs for real through the
checkpoint tests.
"""

import pytest

from pdf_parser_spark.streaming.sinks import (
    IcebergTableSink,
    ParquetDirSink,
    iceberg_catalogs,
    looks_like_path,
    resolve_sink,
)


def test_path_targets_resolve_to_parquet(spark):
    for target in ("/data/out", "s3://bucket/spans", "rel/dir", "./out"):
        sink = resolve_sink(spark, target)
        assert isinstance(sink, ParquetDirSink) and sink.root == target


def test_table_target_without_catalog_raises(spark):
    with pytest.raises(ValueError, match="no configured Iceberg catalog"):
        resolve_sink(spark, "db.extracted_spans")
    with pytest.raises(ValueError, match="no configured Iceberg catalog"):
        resolve_sink(spark, "ice.db.extracted_spans")


def test_table_target_with_stub_catalog_resolves_iceberg(spark):
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert "ice" in iceberg_catalogs(spark)
        sink = resolve_sink(spark, "ice.db.extracted_spans")
        assert isinstance(sink, IcebergTableSink)
        assert sink.table == "ice.db.extracted_spans"
        # a different catalog name still has no Iceberg catalog
        with pytest.raises(ValueError, match="no configured Iceberg catalog"):
            resolve_sink(spark, "other.db.t")
    finally:
        spark.conf.unset("spark.sql.catalog.ice")


def test_session_catalog_overlay_resolves_two_part_names(spark):
    spark.conf.set(
        "spark.sql.catalog.spark_catalog",
        "org.apache.iceberg.spark.SparkSessionCatalog",
    )
    try:
        sink = resolve_sink(spark, "db.extracted_spans")
        assert isinstance(sink, IcebergTableSink)
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")


class _RecordingWriter:
    def __init__(self, log, df):
        self.log = log
        self.df = df

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def append(self):
        self.log.append(("append", self.df.group))

    def create(self):
        self.log.append(("create", self.df.group))


class _RecordingDF:
    """Stands in for the spans DataFrame: records the writeTo chain."""

    def __init__(self, log, group=None, fail_append=False):
        self.log = log
        self.group = group
        self.fail_append = fail_append

    def withColumn(self, name, col):
        assert name == "_group"
        return _RecordingDF(self.log, group="captured", fail_append=self.fail_append)

    def writeTo(self, table):
        self.log.append(("writeTo", table))
        w = _RecordingWriter(self.log, self)
        if self.fail_append:
            w.append = self._raise
        return w

    def _raise(self):
        raise RuntimeError("TABLE_OR_VIEW_NOT_FOUND")


def test_iceberg_write_group_appends_with_group_column():
    log = []
    sink = IcebergTableSink("ice.db.spans")
    sink.write_group(_RecordingDF(log), "group=3")
    assert log == [("writeTo", "ice.db.spans"), ("append", "captured")]


def test_iceberg_write_group_creates_on_missing_table():
    log = []
    sink = IcebergTableSink("ice.db.spans")
    sink.write_group(_RecordingDF(log, fail_append=True), "group=0")
    assert ("using", "iceberg") in log and ("create", "captured") in log


def test_looks_like_path():
    assert looks_like_path("/abs/path") and looks_like_path("s3a://b/k")
    assert not looks_like_path("db.table") and not looks_like_path("cat.db.table")


def test_checkpoint_rejects_changed_input(spark, tmp_path):
    """Resume with a different/updated docs table must raise, not
    silently extract from the stale staged snapshot."""
    from pdf_parser_spark.streaming.checkpoint import extract_with_checkpoint

    import pyspark.sql.functions as F

    def docs(n):
        return spark.range(n).select(
            F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.lit("hello world").alias("text"),
                    F.lit("").alias("media_ref"),
                    F.lit(0).cast("int").alias("offset"),
                )
            ).alias("spans"),
        )

    out = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(
            spark, docs(8), out, n_buckets=4, group_size=1, fail_after_groups=1
        )
    with pytest.raises(ValueError, match="does not match the staged snapshot"):
        extract_with_checkpoint(spark, docs(9), out, n_buckets=4, group_size=1)
    # the original input finishes the interrupted run
    summary = extract_with_checkpoint(spark, docs(8), out, n_buckets=4, group_size=1)
    assert summary["resumed_from"] == 1
