"""Kill/resume semantics (SURVEY.md §5.2.4): inject a failure after a
partial commit, re-run, assert completed partition groups are skipped
and the final result equals a single-shot run with no duplicates."""

import pytest

from pdf_parser_spark.fixtures.generator import write_fixture_tables
from pdf_parser_spark.plans.extract import extract_spans
from pdf_parser_spark.streaming.checkpoint import (
    extract_with_checkpoint,
    read_extracted,
    read_metrics,
)

N_DOCS = 30


@pytest.fixture(scope="module")
def ck_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("ck_fixture")
    write_fixture_tables(str(d), N_DOCS)
    return str(d)


def test_kill_and_resume(spark, ck_fixture, tmp_path):
    docs = spark.read.parquet(f"{ck_fixture}/documents.parquet")
    out_dir = str(tmp_path / "out")

    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(
            spark, docs, out_dir, n_buckets=8, group_size=2, fail_after_groups=2
        )
    partial = read_metrics(out_dir)
    assert len(partial) == 2  # two groups committed before the kill

    summary = extract_with_checkpoint(spark, docs, out_dir, n_buckets=8, group_size=2)
    assert summary["resumed_from"] == 4  # 2 groups x 2 buckets skipped
    assert summary["groups_run"] == 2  # only the remaining 4 buckets ran

    got = {
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"])
        for r in read_extracted(spark, out_dir).collect()
    }
    exp_rows = extract_spans(docs).collect()
    exp = {(r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"]) for r in exp_rows}
    assert got == exp
    # no duplicates from the replayed group
    assert read_extracted(spark, out_dir).count() == len(exp_rows)

    metrics = read_metrics(out_dir)
    assert sum(m["docs"] for m in metrics) == N_DOCS
    assert all(m["spans"] > 0 for m in metrics)


def test_uncommitted_dirs_invisible_and_cleaned(spark, ck_fixture, tmp_path):
    """A crash BETWEEN write and marker leaves a group directory with no
    marker: readers must not see it (marker log is the read source of
    truth) and resume must delete it before reprocessing."""
    import os

    import pandas as pd

    docs = spark.read.parquet(f"{ck_fixture}/documents.parquet")
    out_dir = str(tmp_path / "out")
    extract_with_checkpoint(spark, docs, out_dir, n_buckets=4, group_size=4)
    baseline = read_extracted(spark, out_dir).count()

    # simulate the torn state: a written-but-unmarked group directory
    orphan = os.path.join(out_dir, "spans", "group=99")
    os.makedirs(orphan)
    pd.DataFrame(
        {"doc_id": ["zz"], "kind": ["text"], "text": ["phantom"],
         "media_ref": [""], "order": [0]}
    ).to_parquet(os.path.join(orphan, "part-0.parquet"), index=False)

    assert read_extracted(spark, out_dir).count() == baseline  # invisible
    summary = extract_with_checkpoint(spark, docs, out_dir, n_buckets=4, group_size=4)
    assert summary["cleaned_dirs"] == ["group=99"]
    assert not os.path.exists(orphan)


def test_bucket_count_mismatch_raises(spark, ck_fixture, tmp_path):
    docs = spark.read.parquet(f"{ck_fixture}/documents.parquet")
    out_dir = str(tmp_path / "out")
    extract_with_checkpoint(spark, docs, out_dir, n_buckets=4, group_size=4)
    with pytest.raises(ValueError, match="n_buckets"):
        extract_with_checkpoint(spark, docs, out_dir, n_buckets=8, group_size=4)


def test_staged_layout_prunes_source(spark, ck_fixture, tmp_path):
    """The staged bucket-partitioned layout exists after a run, and a
    group filter on it compiles to partition pruning (the per-group
    read touches only that bucket's directories, not the full table)."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{ck_fixture}/documents.parquet")
    out_dir = str(tmp_path / "out")
    extract_with_checkpoint(spark, docs, out_dir, n_buckets=4, group_size=2)
    staged_dir = os.path.join(out_dir, "_staged_docs")
    assert sorted(
        n for n in os.listdir(staged_dir) if n.startswith("_bucket=")
    ) == [f"_bucket={b}" for b in range(4)]
    staged = spark.read.parquet(staged_dir)
    plan = (
        staged.filter(F.col("_bucket").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partition filter reaches the scan (pruning, not a post-scan filter)
    assert "PartitionFilters" in plan and "_bucket" in plan.split("PartitionFilters")[1][:200]
