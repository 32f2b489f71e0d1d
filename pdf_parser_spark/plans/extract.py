"""End-to-end extraction pipeline (SURVEY.md §3.4 stages A-D).

    documents ──explode──▶ media_pages ──repartition(RR)──▶ perceive()
        │                                (skew by granularity)   │
        │ (doc rows: spans)                 (tokens+matches per page)
        ▼                                                        ▼
        └────────────── cogroup by doc_id ── applyInPandas ──▶ out spans

Exactly ONE shuffle pair (the cogroup), and it moves token/match rows,
never page pixels. Geometry is per-doc sequential (order-defined greedy
semantics, SURVEY.md §7.4.1) inside the grouped-map kernel; documents
are the parallel unit — at 10^12 docs the job is embarrassingly
parallel and scales linearly with executors.

Cross-page state (remaining-label bookkeeping, reference
/root/reference/extractor.py:978-1056) lives inside one doc's group —
the reason geometry groups by doc_id rather than (doc_id, page_no).

Output contract (driver invariant BASELINE.json:14): per-doc ordered
spans (kind, text, media_ref, order), flattened per SURVEY.md §7.2.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark import config as C
from pdf_parser_spark.plans import geometry as G
from pdf_parser_spark.schemas import OUT_SPANS_SCHEMA
from pdf_parser_spark.sources.decoder import perceive
from pdf_parser_spark.sources.documents import media_pages


def extract_document(
    doc_spans: list[dict],
    pages: dict[int, tuple[list[dict], list[dict]]],
    sections: list[dict],
) -> list[tuple[str, str, str, int]]:
    """One document: cross-page label bookkeeping + per-page geometry +
    canonical span flattening. ``pages``: page_no → (tokens, matches)."""
    n_pages = max(pages) if pages else 0
    label_sections = [s for s in sections if s.get("labels")]
    remaining: dict[str, set[str]] = {s["section_name"]: set(s["labels"]) for s in label_sections}
    completed: set[str] = set()
    page_sections: dict[int, list[dict]] = {}

    for page_no in range(1, n_pages + 1):
        tokens, raw_matches = pages.get(page_no, ([], []))
        checkboxes = G.nms_dedupe(raw_matches)
        page = G.PageView(tokens)

        active: list[dict] = []
        labels_to_search: list[str] = []
        for sec in label_sections:
            name = sec["section_name"]
            if name in completed:
                continue
            rem = remaining.get(name, set())
            if not rem:
                completed.add(name)
                continue
            active.append(sec)
            labels_to_search.extend(sorted(rem))

        next_tokens = pages.get(page_no + 1, (None, None))[0] if page_no < n_pages else None
        positions = G.find_label_positions(page, labels_to_search, next_tokens)
        regions = G.find_section_regions(page, sections, checkboxes)

        for sec in active:
            name = sec["section_name"]
            region = regions.get(name)
            if not region:
                continue
            y1_eff = region["y1"] + C.ANCHOR_OFFSET_PX
            still = {
                lbl
                for lbl in remaining.get(name, set())
                if not any(y1_eff <= ly <= region["y2"] for _, ly in positions.get(lbl, []))
            }
            remaining[name] = still
            if not still:
                completed.add(name)

        page_sections[page_no] = G.assign_checkboxes(checkboxes, active, positions, regions)

    out: list[tuple[str, str, str, int]] = []
    order = 0
    page_no = 0
    for span in sorted(doc_spans, key=lambda s: s["offset"]):
        if span["kind"] == "text":
            out.append(("text", span["text"], "", order))
            order += 1
        else:
            page_no += 1
            for sec in page_sections.get(page_no, []):
                out.append(("section", sec["section"], span["media_ref"], order))
                order += 1
                for cb in sec["checkboxes"]:
                    out.append(
                        ("checkbox", f"{cb['label']}:{cb['status']}", span["media_ref"], order)
                    )
                    order += 1
    return out


def _as_dicts(cell) -> list[dict]:
    """Arrow array<struct> cell → list[dict] (None-safe)."""
    if cell is None:
        return []
    return [dict(el) for el in cell]


def _assemble_factory(sections: list[dict]):
    def assemble(perc: pd.DataFrame, docs: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple[str, str, str, str, int]] = []
        # cogroup key = doc_id; either side may be empty (doc with no
        # media spans, or media with a missing doc row)
        if len(docs) == 0:
            return pd.DataFrame(columns=["doc_id", "kind", "text", "media_ref", "order"])
        for _, doc_row in docs.iterrows():
            doc_id = doc_row["doc_id"]
            pages = {
                int(p): (_as_dicts(t), _as_dicts(m))
                for p, t, m in zip(perc["page_no"], perc["tokens"], perc["matches"])
            }
            spans = _as_dicts(doc_row["spans"])
            for kind, text, media_ref, order in extract_document(spans, pages, sections):
                rows.append((doc_id, kind, text, media_ref, order))
        return pd.DataFrame(rows, columns=["doc_id", "kind", "text", "media_ref", "order"])

    return assemble


def extract_spans(
    docs: DataFrame,
    sections: list[dict] | None = None,
    decoder: str = "synthetic",
    parallelism: int | None = None,
) -> DataFrame:
    """documents → flat output-span rows (doc_id, kind, text, media_ref, order)."""
    if sections is None:
        from pdf_parser_spark.fixtures.generator import form_schema

        sections = form_schema()

    pages = media_pages(docs)
    perc = perceive(pages, decoder=decoder, parallelism=parallelism)
    return (
        perc.groupBy("doc_id")
        .cogroup(docs.groupBy("doc_id"))
        .applyInPandas(_assemble_factory(sections), schema=OUT_SPANS_SCHEMA)
    )


def extract_spans_nested(out_flat: DataFrame) -> DataFrame:
    """Flat span rows → per-doc ordered spans array (golden-table shape)."""
    return out_flat.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("kind", "text", "media_ref", F.col("order"))),
            lambda a, b: F.when(a["order"] < b["order"], -1)
            .when(a["order"] > b["order"], 1)
            .otherwise(0),
        ).alias("spans")
    )


def lineage_metrics(docs: DataFrame, out_flat: DataFrame) -> DataFrame:
    """Per-doc lineage/metrics rows (replaces the reference's debug-image
    side effects, SURVEY.md §2.1 S8/S9): span counts by kind per doc."""
    return (
        out_flat.groupBy("doc_id")
        .pivot("kind", ["text", "section", "checkbox"])
        .count()
        .na.fill(0)
        .join(docs.select("doc_id", F.size("spans").alias("n_input_spans")), "doc_id")
    )
