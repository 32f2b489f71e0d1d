"""Golden span-sequence parity (the driver invariant, BASELINE.json:14):
the distributed Spark pipeline's per-doc (kind, text, media_ref, order)
sequence must exactly equal the single-process reference oracle's, over
a generated fixture corpus including multi-page docs (cross-page label
continuation + remaining-label state)."""

import pytest

from pdf_parser_spark.fixtures.generator import (
    doc_page_count,
    doc_spans,
    form_schemas,
    page_perception,
    write_fixture_tables,
)
from pdf_parser_spark.oracle import reference_oracle as O
from pdf_parser_spark.plans.extract import extract_document, extract_spans, lineage_metrics
from pdf_parser_spark.testing.span_diff import span_diff

N_DOCS = 40


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixture")
    write_fixture_tables(str(d), N_DOCS)
    return str(d)


def _oracle_spans(doc_id: str):
    pages = {
        p: page_perception(doc_id, p) for p in range(1, doc_page_count(doc_id) + 1)
    }
    return O.extract_document_spans(doc_spans(doc_id), pages, form_schemas())


def test_local_engine_matches_oracle():
    """extract_document (the in-UDF kernel) vs oracle, no Spark."""
    for i in range(N_DOCS):
        doc_id = f"doc_{i:08d}"
        pages = {
            p: page_perception(doc_id, p) for p in range(1, doc_page_count(doc_id) + 1)
        }
        got = extract_document(doc_spans(doc_id), pages, form_schemas())
        exp = _oracle_spans(doc_id)
        assert got == exp, span_diff(got, exp, doc_id)


@pytest.mark.parametrize("mode", ["fused", "paged"])
def test_spark_pipeline_matches_oracle(spark, fixture_dir, mode):
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    out = extract_spans(docs, parallelism=8, mode=mode)
    rows = out.collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["kind"], r["text"], r["media_ref"], r["order"]))
    assert len(by_doc) == N_DOCS
    for i in range(N_DOCS):
        doc_id = f"doc_{i:08d}"
        got = sorted(by_doc[doc_id], key=lambda t: t[3])
        exp = _oracle_spans(doc_id)
        assert got == exp, span_diff(got, exp, doc_id)


def test_lineage_metrics(spark, fixture_dir):
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    out = extract_spans(docs)
    lm = lineage_metrics(docs, out).collect()
    assert len(lm) == N_DOCS
    for r in lm:
        assert r["text"] >= 1  # every fixture doc has at least one text span
        assert r["n_input_spans"] >= 2
    # Q/A kinds are tracked too
    assert sum(r["question"] for r in lm) > 0
    assert sum(r["answer"] for r in lm) > 0


def test_skewed_long_document_parity():
    """A 100+-page document (heavy-tail skew profile) must match the
    oracle exactly — exercises many empty/section-less pages, repeated
    cross-page remaining-label searches, and long flattening runs."""
    from pdf_parser_spark.fixtures.generator import _rng  # deterministic probe

    # find a skewed doc id deterministically
    doc_id = next(
        f"skewp_{i:04d}" for i in range(5000)
        if _rng(f"skewp_{i:04d}", "pages").random() < 0.02
    )
    n = doc_page_count(doc_id, skew=True)
    assert n >= 100
    pages = {p: page_perception(doc_id, p) for p in range(1, n + 1)}
    got = extract_document(doc_spans(doc_id, skew=True), pages, form_schemas())
    exp = O.extract_document_spans(doc_spans(doc_id, skew=True), pages, form_schemas())
    assert got == exp
    assert len(got) > 10
