"""Structured span-sequence diff for parity failures.

The reference ships a structured golden-diff tool
(/root/reference/tools/compare_json.py:52-119) reporting per-page
section/label/status differences and per-question value differences;
raw assert output on a 400-span sequence is useless by comparison.
This applies the same granularity to the engine's flat span model
(kind, text, media_ref, order): spans are folded back into the
page → section → checkbox / question → answer hierarchy and compared
level by level, so a failing parity test names the page, section, and
label/question that diverged — not just the first unequal tuple.
"""

from __future__ import annotations

Span = tuple  # (kind, text, media_ref, order)


def _structure(spans: list[Span]) -> dict:
    """Fold a flat span sequence into {page_ref: {"sections": {name:
    [checkbox texts]}, "qa": [(question, answer|None)]}} plus the
    leading/interleaved text spans."""
    pages: dict[str, dict] = {}
    texts: list[str] = []
    cur_section = None
    # last question as (owning page dict, index): an answer that is the
    # first span of a NEW page must attach to the question on the page
    # it belongs to (cross-page continuation), not index the new page's
    # empty qa list with the old page's offset (round-2 ADVICE — that
    # raised IndexError or mis-attached the answer in the diff output)
    last_q: tuple[dict, int] | None = None
    for kind, text, media_ref, _order in spans:
        if kind == "text":
            texts.append(text)
            cur_section = last_q = None
            continue
        page = pages.setdefault(media_ref, {"sections": {}, "qa": []})
        if kind == "section":
            cur_section = text
            page["sections"].setdefault(cur_section, [])
        elif kind == "checkbox":
            page["sections"].setdefault(cur_section, []).append(text)
        elif kind == "question":
            last_q = (page, len(page["qa"]))
            page["qa"].append([text, None])
        elif kind == "answer" and last_q is not None:
            q_page, q_idx = last_q
            q_page["qa"][q_idx][1] = text
    return {"texts": texts, "pages": pages}


def span_diff(got: list[Span], exp: list[Span], doc_id: str = "") -> str:
    """Human-readable structured diff (empty string when equal)."""
    if list(got) == list(exp):
        return ""
    g, e = _structure(list(got)), _structure(list(exp))
    lines = [f"span mismatch{' for ' + doc_id if doc_id else ''} "
             f"(got {len(got)} spans, expected {len(exp)}):"]

    if g["texts"] != e["texts"]:
        lines.append(f"  text spans differ: got {g['texts']!r} expected {e['texts']!r}")

    for page in sorted(set(g["pages"]) | set(e["pages"])):
        gp = g["pages"].get(page)
        ep = e["pages"].get(page)
        if gp is None or ep is None:
            lines.append(f"  page {page}: {'missing in got' if gp is None else 'extra in got'}")
            continue
        if gp == ep:
            continue
        lines.append(f"  page {page}:")
        for sec in sorted(set(gp["sections"]) | set(ep["sections"]), key=str):
            gcb = gp["sections"].get(sec)
            ecb = ep["sections"].get(sec)
            if gcb is None or ecb is None:
                lines.append(
                    f"    section {sec!r}: {'missing in got' if gcb is None else 'extra in got'}"
                )
            elif gcb != ecb:
                only_g = [c for c in gcb if c not in ecb]
                only_e = [c for c in ecb if c not in gcb]
                lines.append(
                    f"    section {sec!r} checkboxes differ:"
                    f" got-only {only_g} expected-only {only_e}"
                    + ("" if only_g or only_e else f" (order: got {gcb} expected {ecb})")
                )
        gq = {tuple(q) for q in gp["qa"]}
        eq = {tuple(q) for q in ep["qa"]}
        for q, a in sorted(eq - gq, key=str):
            got_a = next((ga for gq2, ga in gp["qa"] if gq2 == q), "<question missing>")
            lines.append(f"    question {q!r}: got answer {got_a!r} expected {a!r}")
        for q, a in sorted(gq - eq, key=str):
            if not any(q == eq2 for eq2, _ in ep["qa"]):
                lines.append(f"    question {q!r}: extra in got (answer {a!r})")

    # first flat divergence as the precise anchor
    for i, (a, b) in enumerate(zip(got, exp)):
        if a != b:
            lines.append(f"  first divergence at span {i}: got {a} expected {b}")
            break
    else:
        lines.append(f"  length mismatch after common prefix of {min(len(got), len(exp))}")
    return "\n".join(lines)
