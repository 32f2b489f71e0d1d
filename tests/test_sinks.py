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

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", len(cols)))
        return self

    def append(self):
        self.log.append(("append", self.df.group))

    def create(self):
        self.log.append(("create", self.df.group))


class _StubCatalog:
    def __init__(self, exists):
        self._exists = exists

    def tableExists(self, name):
        return self._exists


class _StubSession:
    def __init__(self, exists):
        self.catalog = _StubCatalog(exists)


class _RecordingDF:
    """Stands in for the spans DataFrame: records the writeTo chain."""

    def __init__(self, log, group=None, table_exists=True):
        self.log = log
        self.group = group
        self.table_exists = table_exists
        self.sparkSession = _StubSession(table_exists)

    def withColumn(self, name, col):
        assert name == "_group"
        return _RecordingDF(self.log, group="captured", table_exists=self.table_exists)

    def writeTo(self, table):
        self.log.append(("writeTo", table))
        return _RecordingWriter(self.log, self)


def test_iceberg_write_group_appends_with_group_column():
    """Existing table → plain append; existence comes from the catalog,
    not a caught append failure (which would mask real append errors)."""
    log = []
    sink = IcebergTableSink("ice.db.spans")
    sink.write_group(_RecordingDF(log, table_exists=True), "group=3")
    assert log == [("writeTo", "ice.db.spans"), ("append", "captured")]


def test_iceberg_write_group_creates_on_missing_table():
    """Missing table → create PARTITIONED BY _group (compensation
    deletes and group reads partition-prune), never an append attempt."""
    log = []
    sink = IcebergTableSink("ice.db.spans")
    sink.write_group(_RecordingDF(log, table_exists=False), "group=0")
    assert ("using", "iceberg") in log and ("create", "captured") in log
    assert ("partitionedBy", 1) in log
    assert not any(op == "append" for op, _ in log)


def test_looks_like_path():
    assert looks_like_path("/abs/path") and looks_like_path("s3a://b/k")
    assert not looks_like_path("db.table") and not looks_like_path("cat.db.table")


def _docs(spark, n, text="hello world"):
    import pyspark.sql.functions as F

    return spark.range(n).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit(text).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )


def test_checkpoint_rejects_changed_input(spark, tmp_path):
    """Resume with a different/updated docs table must raise, not
    silently extract from the stale staged snapshot."""
    from pdf_parser_spark.streaming.checkpoint import extract_with_checkpoint

    out = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(
            spark, _docs(spark, 8), out, n_buckets=4, group_size=1, fail_after_groups=1
        )
    with pytest.raises(ValueError, match="does not match the staged snapshot"):
        extract_with_checkpoint(spark, _docs(spark, 9), out, n_buckets=4, group_size=1)
    # the original input finishes the interrupted run
    summary = extract_with_checkpoint(
        spark, _docs(spark, 8), out, n_buckets=4, group_size=1
    )
    assert summary["resumed_from"] == 1


def test_checkpoint_rejects_content_edit_same_ids(spark, tmp_path):
    """Round-3 ADVICE: same doc_ids but EDITED span content must be
    caught — the id-only fingerprint missed the exact scenario the
    guard targets (a resume silently extracting the stale staged
    snapshot of the old content)."""
    from pdf_parser_spark.streaming.checkpoint import extract_with_checkpoint

    out = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(
            spark, _docs(spark, 8), out, n_buckets=4, group_size=1, fail_after_groups=1
        )
    with pytest.raises(ValueError, match="does not match the staged snapshot"):
        extract_with_checkpoint(
            spark, _docs(spark, 8, text="edited content"), out,
            n_buckets=4, group_size=1,
        )


def test_checkpoint_rejects_group_size_mismatch(spark, tmp_path):
    """Round-3 ADVICE: an uncommitted Iceberg append from a crashed run
    with a different group_size would carry a _group name outside the
    new pending set and escape compensation — the meta pins it."""
    from pdf_parser_spark.streaming.checkpoint import extract_with_checkpoint

    out = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(
            spark, _docs(spark, 8), out, n_buckets=4, group_size=1, fail_after_groups=1
        )
    with pytest.raises(ValueError, match="group_size=2 but checkpoint"):
        extract_with_checkpoint(spark, _docs(spark, 8), out, n_buckets=4, group_size=2)
    # original group_size resumes fine
    summary = extract_with_checkpoint(
        spark, _docs(spark, 8), out, n_buckets=4, group_size=1
    )
    assert summary["resumed_from"] == 1


def test_checkpoint_meta_backfill_arms_legacy_guards(spark, tmp_path):
    """A _meta.json written before content_hash_sum/group_size existed
    is BACKFILLED on first resume (legacy fields must match first) —
    the guard arms itself instead of staying permanently disabled
    (round-3 ADVICE)."""
    import json
    import os

    from pdf_parser_spark.streaming.checkpoint import extract_with_checkpoint

    out = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(
            spark, _docs(spark, 8), out, n_buckets=4, group_size=1, fail_after_groups=1
        )
    # rewrite the meta as a legacy one: no group_size, id-only fingerprint
    meta_path = os.path.join(out, "_progress", "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    legacy_fp = {
        k: v for k, v in meta["input_fingerprint"].items() if k != "content_hash_sum"
    }
    with open(meta_path, "w") as f:
        json.dump({"n_buckets": 4, "input_fingerprint": legacy_fp}, f)

    # resume succeeds (legacy fields match) and backfills the new fields
    extract_with_checkpoint(spark, _docs(spark, 8), out, n_buckets=4, group_size=1)
    with open(meta_path) as f:
        backfilled = json.load(f)
    assert backfilled["group_size"] == 1
    assert "content_hash_sum" in backfilled["input_fingerprint"]

    # the armed guard now catches a content edit on the next resume
    with pytest.raises(ValueError, match="does not match the staged snapshot"):
        extract_with_checkpoint(
            spark, _docs(spark, 8, text="edited later"), out,
            n_buckets=4, group_size=1,
        )
