"""Resumable batch execution at partition granularity (SURVEY.md §2.10).

The north_rule requires a killed job to resume at partition
granularity with per-partition lineage + metrics. Documents are
bucketed by a stable hash of doc_id; buckets are processed in groups;
each group's output goes to its own directory (idempotent overwrite)
and a marker row is committed only after the write succeeds — so a
kill between write and marker replays that group exactly, never
duplicating and never skipping.

Layout (round-2 fixes from the round-1 review):

- The input is staged ONCE as a ``_bucket``-partitioned parquet layout,
  so each group's read prunes to its bucket directories instead of
  re-scanning the full table per group (G groups previously = G full
  scans). At Iceberg scale the staging step disappears entirely: a
  table partitioned by ``bucket(N, doc_id)`` already has this layout,
  and the group filter becomes partition pruning on the scan.
- ``read_extracted`` derives its directory list from the COMMITTED
  markers rather than globbing ``group=*`` — a crash between write and
  marker can leave an uncommitted directory, and a resume with a
  different group_size can orphan stale ones; both are invisible to
  readers now. Resume also deletes unmarked group directories before
  reprocessing, keeping the layout clean.
- A ``_meta.json`` records ``n_buckets``, ``group_size``, and a
  full-row content fingerprint of the input; resuming with a different
  value raises instead of silently mis-bucketing, letting an
  uncommitted group escape compensation, or extracting a stale staged
  snapshot of an edited input.

Production mapping: the marker table is Iceberg snapshot metadata
(each group commit = one snapshot carrying the bucket list as a
snapshot property); the per-group directories become partitions of the
``extracted_spans`` table written with ``writeTo(...).append()`` inside
the same commit. That sink is real code now — ``streaming/sinks.py``
selects :class:`IcebergTableSink` when the target is a table in a
configured Iceberg catalog (``resolve_sink``) and routes each group
through one atomic ``writeTo(table).append()`` with per-group
compensation deletes for crash replay; the parquet marker files here
are the sandbox stand-in with identical semantics.

The reference's only resume notion is the regression harness skipping
existing goldens (/root/reference/run_regression.py:130-144); this
generalizes it to distributed partition-granular progress.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")


def completed_buckets(out_dir: str) -> set[int]:
    done: set[int] = set()
    for m in _markers(out_dir).values():
        done.update(m["buckets"])
    return done


def _markers(out_dir: str) -> dict[str, dict]:
    """Committed group markers, keyed by group directory name."""
    progress = os.path.join(out_dir, "_progress")
    out: dict[str, dict] = {}
    if os.path.isdir(progress):
        for name in sorted(os.listdir(progress)):
            if name.startswith("group_") and name.endswith(".json"):
                with open(os.path.join(progress, name)) as f:
                    m = json.load(f)
                out[m.get("dir", f"group={min(m['buckets'])}")] = m
    return out


def _input_fingerprint(docs: DataFrame) -> dict:
    """CONTENT fingerprint of the input table: row count, id range, an
    order-insensitive id-hash sum, and an order-insensitive FULL-ROW
    hash sum over every column (round-3 ADVICE: the id-only fields miss
    the exact scenario the guard targets — same doc_ids, edited spans).
    Guards resumes against a DIFFERENT/updated input silently
    extracting from the stale staged snapshot. One input scan; decimal
    sums because a long sum of xxhash64 overflows under ANSI."""
    cols = sorted(docs.columns)
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.coalesce(
            F.sum(F.xxhash64("doc_id").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
        F.coalesce(
            F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("ch"),
    ).collect()[0]
    return {
        "n_docs": row["n"],
        "min_doc_id": row["lo"],
        "max_doc_id": row["hi"],
        "id_hash_sum": str(row["h"]),
        "content_hash_sum": str(row["ch"]),
    }


def _check_meta(
    out_dir: str, n_buckets: int, group_size: int, fingerprint: dict
) -> None:
    """Create or validate the checkpoint's ``_meta.json``. Pins
    ``n_buckets`` (bucket assignment shifts otherwise), ``group_size``
    (an uncommitted Iceberg append from a crashed run with a different
    group_size would carry a ``_group`` name outside the new pending
    set and escape compensation — round-3 ADVICE), and the input
    fingerprint. Metas written before a field existed are BACKFILLED on
    first resume (the legacy fields must still match first), so the
    guard arms itself instead of staying permanently disabled."""
    meta_path = os.path.join(out_dir, "_progress", "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["n_buckets"] != n_buckets:
            raise ValueError(
                f"resume with n_buckets={n_buckets} but checkpoint was written "
                f"with n_buckets={meta['n_buckets']}; bucket assignment would shift"
            )
        if meta.get("group_size") is not None and meta["group_size"] != group_size:
            raise ValueError(
                f"resume with group_size={group_size} but checkpoint was written "
                f"with group_size={meta['group_size']}; an uncommitted group "
                "from the interrupted run could escape compensation — resume "
                "with the original group_size (or delete the checkpoint "
                "directory to start over)"
            )
        recorded = meta.get("input_fingerprint")
        if recorded is not None:
            # legacy metas lack content_hash_sum: compare the fields it
            # did record, then backfill the full fingerprint below
            comparable = {k: fingerprint[k] for k in recorded if k in fingerprint}
            if recorded != comparable:
                raise ValueError(
                    "resume input does not match the staged snapshot "
                    f"(recorded {recorded}, got {comparable}); delete the "
                    "checkpoint directory to reprocess the new input, or pass "
                    "the original input to finish the interrupted run"
                )
        backfilled = dict(meta)
        backfilled["group_size"] = meta.get("group_size", group_size)
        backfilled["input_fingerprint"] = fingerprint
        if backfilled != meta:
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(backfilled, f)
            os.replace(tmp, meta_path)
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "n_buckets": n_buckets,
                    "group_size": group_size,
                    "input_fingerprint": fingerprint,
                },
                f,
            )
        os.replace(tmp, meta_path)


def _stage_bucketed(
    spark: SparkSession, docs: DataFrame, out_dir: str, n_buckets: int
) -> DataFrame:
    """One full input scan → bucket-partitioned staging layout; resumes
    reuse it (the _SUCCESS marker gates completeness). Per-group filters
    on ``_bucket`` then prune to bucket directories at the source."""
    staged = os.path.join(out_dir, "_staged_docs")
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        (
            docs.withColumn("_bucket", _bucket_col(n_buckets))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(staged)
        )
    return spark.read.parquet(staged)


def _clean_uncommitted(out_dir: str, sink=None) -> list[str]:
    """Delete span group outputs that have no committed marker (partial
    writes from a crash, or leftovers from a different group_size).
    Parquet sink: remove uncommitted ``group=`` directories. Iceberg
    sink: compensation happens per-group instead — every pending group
    is ``DELETE WHERE _group = ...``-compensated right before its
    re-append (see the write loop), because enumerating a table's
    groups costs a scan while the pending set is already known."""
    spans_dir = os.path.join(out_dir, "spans")
    committed = set(_markers(out_dir))
    removed = []
    if (sink is None or getattr(sink, "kind", "parquet") == "parquet") and os.path.isdir(
        spans_dir
    ):
        for name in os.listdir(spans_dir):
            if name.startswith("group=") and name not in committed:
                shutil.rmtree(os.path.join(spans_dir, name))
                removed.append(name)
    return removed


def extract_with_checkpoint(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
    group_size: int = 8,
    sections: list[dict] | None = None,
    mode: str = "auto",
    decoder: str = "synthetic",
    fail_after_groups: int | None = None,
    sink=None,
) -> dict:
    """Run the extraction pipeline resumably.

    ``sink``: a span sink from :mod:`pdf_parser_spark.streaming.sinks`
    (or any object with its ``write_group``/``read_group`` surface);
    defaults to parquet group directories under ``out_dir``. Pass
    ``resolve_sink(spark, "cat.db.extracted_spans")`` to commit each
    group as an Iceberg snapshot append instead — the marker log (and
    in production the snapshot properties it stands in for) stays the
    source of truth either way.

    Returns a summary dict. ``fail_after_groups`` injects a crash after
    N committed groups (test hook for kill/resume semantics).
    """
    from pdf_parser_spark.plans.extract import extract_spans
    from pdf_parser_spark.streaming.sinks import ParquetDirSink

    if sink is None:
        sink = ParquetDirSink(out_dir)
    os.makedirs(os.path.join(out_dir, "_progress"), exist_ok=True)
    _check_meta(out_dir, n_buckets, group_size, _input_fingerprint(docs))
    removed = _clean_uncommitted(out_dir, sink)
    done = completed_buckets(out_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    staged = _stage_bucketed(spark, docs, out_dir, n_buckets)

    groups = [pending[i : i + group_size] for i in range(0, len(pending), group_size)]
    metrics_rows = []
    for gi, group in enumerate(groups):
        t0 = time.time()
        sub = staged.filter(F.col("_bucket").isin(group)).drop("_bucket")
        out = extract_spans(sub, sections=sections, mode=mode, decoder=decoder)
        group_name = f"group={min(group)}"
        if getattr(sink, "kind", "parquet") == "iceberg":
            # compensate a possible uncommitted append from a crash
            # between append and marker commit (idempotent replay)
            sink.delete_group(spark, group_name)
        sink.write_group(out, group_name)

        # lineage/metrics for this partition group (replaces the
        # reference's debug-image side effects with columnar rows)
        stats = (
            sink.read_group(spark, group_name)
            .agg(
                F.countDistinct("doc_id").alias("docs"),
                F.count(F.lit(1)).alias("spans"),
            )
            .collect()[0]
        )
        marker = {
            "dir": group_name,
            "buckets": group,
            "docs": stats["docs"],
            "spans": stats["spans"],
            "wall_s": round(time.time() - t0, 2),
            "committed_at": time.time(),
        }
        marker_path = os.path.join(out_dir, "_progress", f"group_{min(group)}.json")
        tmp = marker_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, marker_path)  # atomic commit
        metrics_rows.append(marker)

        if fail_after_groups is not None and gi + 1 >= fail_after_groups:
            raise RuntimeError(f"injected failure after {gi + 1} groups")

    return {
        "resumed_from": len(done),
        "groups_run": len(groups),
        "cleaned_dirs": removed,
        "metrics": metrics_rows,
    }


def read_extracted(spark: SparkSession, out_dir: str, sink=None) -> DataFrame:
    """Read ONLY committed group outputs (the marker log is the source
    of truth — an uncommitted directory/append from a crash is not
    data). Pass the same ``sink`` the run used; defaults to the parquet
    group directories under ``out_dir``."""
    from pdf_parser_spark.streaming.sinks import ParquetDirSink

    if sink is None:
        sink = ParquetDirSink(out_dir)
    return sink.read_groups(spark, list(_markers(out_dir)))


def read_metrics(out_dir: str) -> list[dict]:
    return list(_markers(out_dir).values())
