"""span_diff structure folding: the cross-page answer case (round-2
ADVICE) — an answer span opening a new page must attach to the prior
page's question, not index the new page's empty qa list."""

from pdf_parser_spark.testing.span_diff import _structure, span_diff


def test_answer_first_span_of_new_page_attaches_to_prior_question():
    spans = [
        ("question", "Q1", "media/d/p1", 0),
        ("answer", "A1", "media/d/p2", 1),  # first span of page 2
        ("question", "Q2", "media/d/p2", 2),
        ("answer", "A2", "media/d/p2", 3),
    ]
    s = _structure(spans)  # must not raise IndexError
    assert s["pages"]["media/d/p1"]["qa"] == [["Q1", "A1"]]
    assert s["pages"]["media/d/p2"]["qa"] == [["Q2", "A2"]]


def test_diff_names_diverging_question():
    got = [("question", "Q1", "p1", 0), ("answer", "A1", "p1", 1)]
    exp = [("question", "Q1", "p1", 0), ("answer", "B1", "p1", 1)]
    out = span_diff(got, exp, "docX")
    assert "docX" in out and "'Q1'" in out and "'A1'" in out and "'B1'" in out
    assert span_diff(got, got) == ""
