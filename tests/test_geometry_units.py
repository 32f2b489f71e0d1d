"""Engine geometry kernels vs the pure-Python oracle, per operator
(SURVEY.md §5.2.1): NMS dedupe (J1), row clustering (W1), label
matching, section regions, assignment — on both generated fixture pages
and adversarial hand-built cases."""

import random

from pdf_parser_spark.fixtures.generator import form_schema, page_perception
from pdf_parser_spark.oracle import reference_oracle as O
from pdf_parser_spark.plans import geometry as G


def _fixture_pages(n_docs=30):
    for i in range(n_docs):
        doc = f"unit_{i:04d}"
        yield page_perception(doc, 1)


def test_nms_parity_on_fixtures():
    for tokens, matches, _ in _fixture_pages():
        a = G.nms_dedupe(matches)
        b = O.deduplicate_matches(matches)
        assert [(m["x"], m["y"], m["status"], m["score"]) for m in a] == [
            (m["x"], m["y"], m["status"], m["score"]) for m in b
        ]


def test_nms_adversarial_ties():
    r = random.Random(7)
    # many near-dup clusters with equal scores → stable order matters
    matches = []
    seq = 0
    for cx in range(0, 200, 10):
        for _ in range(r.randint(1, 4)):
            matches.append(
                {"seq": seq, "x": cx + r.randint(0, 4), "y": 100 + r.randint(0, 4),
                 "w": 37, "h": 37, "status": "ticked", "score": 0.8}
            )
            seq += 1
    a = G.nms_dedupe(matches)
    b = O.deduplicate_matches(matches)
    assert [(m["x"], m["y"]) for m in a] == [(m["x"], m["y"]) for m in b]


def test_cluster_rows_parity():
    r = random.Random(3)
    for _ in range(20):
        boxes = [
            {"x": r.randint(0, 2000), "y": r.choice([100, 120, 145, 200, 260, 261, 400])}
            for _ in range(r.randint(1, 15))
        ]
        row_id, centroids = G.cluster_rows(boxes)
        oracle_rows = O.cluster_rows(boxes)
        assert len(centroids) == len(oracle_rows)
        for rid, orow in enumerate(oracle_rows):
            assert abs(centroids[rid] - orow["y"]) < 1e-9


def test_label_positions_parity_on_fixtures():
    schema = form_schema()
    labels = [lbl for s in schema for lbl in (s.get("labels") or [])]
    for tokens, _, _hl in _fixture_pages(20):
        page = G.PageView(tokens)
        got = G.find_label_positions(page, labels, None)
        exp = O.get_label_positions(tokens, labels, None)
        exp = {k: v for k, v in exp.items() if v}
        # oracle collects all exact hits; engine too — compare full lists
        assert {k: list(map(tuple, v)) for k, v in got.items()} == {
            k: list(map(tuple, v)) for k, v in exp.items()
        }


def test_section_regions_parity_on_fixtures():
    schema = form_schema()
    for tokens, matches, _ in _fixture_pages(20):
        cbs = O.deduplicate_matches(matches)
        page = G.PageView(tokens)
        got = G.find_section_regions(page, schema, cbs)
        exp = O.detect_section_regions(tokens, schema, cbs)
        assert got == exp


def test_assignment_parity_on_fixtures():
    schema = [s for s in form_schema() if s.get("labels")]
    labels = [lbl for s in schema for lbl in (s.get("labels") or [])]
    for tokens, matches, _ in _fixture_pages(20):
        cbs = O.deduplicate_matches(matches)
        page = G.PageView(tokens)
        positions = G.find_label_positions(page, labels, None)
        regions = G.find_section_regions(page, schema, cbs)
        got = G.assign_checkboxes(cbs, schema, positions, regions)
        exp = O.assign_checkboxes_sectionwise(cbs, schema, positions, regions)
        assert got == exp
