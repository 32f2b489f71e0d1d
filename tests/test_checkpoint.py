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
