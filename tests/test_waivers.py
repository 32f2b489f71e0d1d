"""Pins for the two documented dead-code waivers (round-1 VERDICT #10).

W10 multi-column collapse (/root/reference/response_extractor.py:
1422-1445) splits multi-entry row-band answers on '\n' — dead in the
executed path because answers are assembled by joining whitespace-
squeezed lines with single spaces (':1093-1104'), so they can never
contain a newline. F12 looks_like_header (':973-983') is defined but
unused in the fixed-band rule. Both are deliberately not modeled
(COVERAGE.md); these tests make the waiver's PRECONDITION executable —
if the oracle transcription ever starts emitting newline-bearing
answers (i.e. the reference path would go live), the waiver breaks
loudly instead of silently diverging.
"""

from pdf_parser_spark.fixtures.generator import (
    doc_page_count,
    doc_spans,
    form_schemas,
    page_perception,
)
from pdf_parser_spark.oracle import reference_oracle as O

N_DOCS = 60


def _all_spans():
    for i in range(N_DOCS):
        doc_id = f"doc_{i:08d}"
        pages = {
            p: page_perception(doc_id, p) for p in range(1, doc_page_count(doc_id) + 1)
        }
        yield from O.extract_document_spans(doc_spans(doc_id), pages, form_schemas())


def test_answers_never_contain_newlines():
    """W10's trigger condition never occurs: every answer is a single
    whitespace-squeezed line (F11), so the multi-column collapse branch
    is unreachable. If this fails, W10 must be implemented."""
    answers = [text for kind, text, _, _ in _all_spans() if kind == "answer"]
    assert answers, "sweep produced no answers — waiver test is vacuous"
    assert all("\n" not in a for a in answers)
    # and the squeeze is real: no double spaces either
    assert all("  " not in a for a in answers)


def test_no_span_text_contains_newlines():
    """The flattened span contract as a whole is single-line text."""
    assert all("\n" not in text for _, text, _, _ in _all_spans())
