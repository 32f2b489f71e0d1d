"""Single-process reference oracle (test-only).

A faithful pure-Python transcription of the reference pipeline's
*executed* behavior for the checkbox/section/label layer, used to
produce expected span sequences for fixtures (SURVEY.md §5.2). Cited
algorithms:

- NMS match dedupe            /root/reference/extractor.py:155-181
- label position matching     /root/reference/extractor.py:194-532
- section region detection    /root/reference/extractor.py:534-829
- row clustering              /root/reference/extractor.py:834-861
- label→checkbox assignment   /root/reference/extractor.py:863-945
- cross-page label state      /root/reference/extractor.py:978-1056
- output assembly             /root/reference/extractor.py:1118-1122
  flattened per SURVEY.md §7.2.

This module is deliberately dict-shaped and sequential like the
reference; the distributed engine in pdf_parser_spark.plans is an
independent implementation checked against this oracle.
"""

from __future__ import annotations

import re
import unicodedata
from collections import defaultdict

from pdf_parser_spark import config as C

# ---------------------------------------------------------------------------
# text normalization + IL1-flex matching (extractor.py:218-269)
# ---------------------------------------------------------------------------


def normalize_text(text: str) -> str:
    text = unicodedata.normalize("NFKD", text)
    text = "".join(c for c in text if unicodedata.category(c)[0] != "C")
    text = text.replace("/", "").replace(" ", "").replace("-", "")
    text = re.sub(r"^[^a-zA-Z]+", "", text)
    text = re.sub(r"[^a-zA-Z]+$", "", text)
    return text.upper()


def clean_label_sequence(seq: list[str]) -> str:
    normed = [normalize_text(s) for s in seq]
    joined = "".join(normed)
    joined = unicodedata.normalize("NFKD", joined)
    joined = "".join(c for c in joined if unicodedata.category(c)[0] != "C")
    return joined.replace(" ", "")


def ocr_norm_preserve_punct_upper(text: str) -> str:
    t = unicodedata.normalize("NFKD", text)
    t = "".join(c for c in t if unicodedata.category(c)[0] != "C")
    t = t.replace("/", "").replace(" ", "").replace("-", "")
    return t.upper()


def build_expected_masked_upper(text: str) -> tuple[str, set[int]]:
    t = unicodedata.normalize("NFKD", text)
    t = "".join(c for c in t if unicodedata.category(c)[0] != "C")
    t = t.replace("/", "").replace(" ", "").replace("-", "")
    t = t.upper()
    i_mask = {idx for idx, ch in enumerate(t) if ch == "I"}
    return t, i_mask


def flex_equal(expected_s: str, i_mask: set[int], candidate_s: str) -> bool:
    if len(expected_s) != len(candidate_s):
        return False
    for i, (e, c) in enumerate(zip(expected_s, candidate_s)):
        if i in i_mask and e == "I":
            if c not in ("I", "L", "l", "1"):
                return False
        elif e != c.upper():
            return False
    return True


def flex_contains(expected_s: str, i_mask: set[int], haystack_s: str) -> bool:
    m, n = len(expected_s), len(haystack_s)
    if m == 0:
        return True
    return any(flex_equal(expected_s, i_mask, haystack_s[i : i + m]) for i in range(n - m + 1))


def flex_startswith(expected_s: str, i_mask: set[int], haystack_s: str) -> bool:
    m = len(expected_s)
    if m == 0:
        return True
    if len(haystack_s) < m:
        return False
    return flex_equal(expected_s, i_mask, haystack_s[:m])


# ---------------------------------------------------------------------------
# NMS dedupe (extractor.py:155-181)
# ---------------------------------------------------------------------------


def deduplicate_matches(matches: list[dict], max_dist: int = C.DEDUPE_MAX_DIST) -> list[dict]:
    """matches: rows with x,y,w,h,status,score,seq — already in the
    reference's all_boxes order (ticked raster order then empty raster
    order, encoded by seq). Stable-sort by confidence desc, greedy keep."""
    all_boxes = sorted(matches, key=lambda b: b["seq"])
    all_boxes.sort(key=lambda b: b["score"], reverse=True)
    deduped: list[dict] = []
    for box in all_boxes:
        dup = any(
            abs(box["x"] - ex["x"]) < max_dist and abs(box["y"] - ex["y"]) < max_dist
            for ex in deduped
        )
        if not dup:
            deduped.append(box)
    return sorted(deduped, key=lambda b: (b["y"], b["x"]))


# ---------------------------------------------------------------------------
# line construction shared by matchers
# ---------------------------------------------------------------------------


def _build_lines(tokens: list[dict]) -> list[dict]:
    """Group tokens by (block, par, line) in first-seen order; line y is
    the first token's y; sort lines by y (extractor.py:306-322)."""
    lines: list[dict] = []
    index: dict[tuple, dict] = {}
    for t in tokens:
        key = (t["block"], t["par"], t["line"])
        if key in index:
            index[key]["words"].append(dict(t))
        else:
            ln = {"words": [dict(t)], "y": t["y"]}
            index[key] = ln
            lines.append(ln)
    return sorted(lines, key=lambda ln: ln["y"])


# ---------------------------------------------------------------------------
# label positions (extractor.py:194-532)
# ---------------------------------------------------------------------------


def _try_multiline(lines_input: list[dict], lbl_words: list[str]):
    base_x_tolerance = C.LABEL_MULTILINE_BASE_X_TOLERANCE
    max_lookahead = C.LABEL_MULTILINE_MAX_LOOKAHEAD
    for i, line in enumerate(lines_input):
        words = line["words"]
        if not words:
            continue
        best_start = None
        best_matched_here = 0
        for start_idx in range(len(words)):
            matched_here = 0
            k = start_idx
            for lbl_idx in range(len(lbl_words)):
                if k >= len(words):
                    break
                wu, w_mask = build_expected_masked_upper(lbl_words[lbl_idx])
                if flex_contains(wu, w_mask, normalize_text(words[k]["text"])):
                    matched_here += 1
                    k += 1
                else:
                    break
            if matched_here > best_matched_here:
                best_matched_here = matched_here
                best_start = start_idx
            if matched_here == len(lbl_words):
                break
        if best_matched_here == 0:
            continue
        start_x = words[best_start]["x"]
        start_y = words[best_start]["y"]
        x_ref = start_x
        curr_lbl_idx = best_matched_here
        curr_idx = i
        matched_all = curr_lbl_idx == len(lbl_words)
        lookahead_used = 0
        while not matched_all and lookahead_used < max_lookahead:
            if curr_idx + 1 >= len(lines_input):
                break
            next_tokens = lines_input[curr_idx + 1]["words"]
            if not next_tokens:
                break
            wuN, w_maskN = build_expected_masked_upper(lbl_words[curr_lbl_idx])
            cands = [
                idx
                for idx, tok in enumerate(next_tokens)
                if abs(tok["x"] - x_ref) <= base_x_tolerance
                and flex_contains(wuN, w_maskN, normalize_text(tok["text"]))
            ]
            if not cands:
                cands = [
                    idx
                    for idx, tok in enumerate(next_tokens)
                    if flex_contains(wuN, w_maskN, normalize_text(tok["text"]))
                ]
            if not cands:
                break
            best_line_match = 0
            best_line_start = None
            for ci in cands:
                matched_in_line = 0
                k = ci
                for lbl_idx in range(curr_lbl_idx, len(lbl_words)):
                    if k >= len(next_tokens):
                        break
                    wu2, w2_mask = build_expected_masked_upper(lbl_words[lbl_idx])
                    if flex_contains(wu2, w2_mask, normalize_text(next_tokens[k]["text"])):
                        matched_in_line += 1
                        k += 1
                    else:
                        break
                if matched_in_line > best_line_match:
                    best_line_match = matched_in_line
                    best_line_start = ci
            if best_line_match == 0:
                break
            curr_lbl_idx += best_line_match
            curr_idx += 1
            lookahead_used += 1
            x_ref = next_tokens[best_line_start]["x"]
            matched_all = curr_lbl_idx == len(lbl_words)
        if matched_all:
            return (start_x, start_y)
    return None


def _next_page_head_lines(next_tokens: list[dict], img_h: int, head_lines: int) -> list[dict]:
    if not next_tokens:
        return []
    shifted = [dict(t, y=t["y"] + img_h) for t in next_tokens]
    next_lines = _build_lines(shifted)
    kept: list[dict] = []
    seen_groups = 0
    i2 = 0
    while i2 < len(next_lines) and seen_groups < head_lines:
        group_y = next_lines[i2]["y"]
        while i2 < len(next_lines) and next_lines[i2]["y"] == group_y:
            kept.append(next_lines[i2])
            i2 += 1
        seen_groups += 1
    return kept


def get_label_positions(
    tokens: list[dict],
    expected_labels: list[str],
    next_page_tokens: list[dict] | None = None,
    img_h: int = C.PAGE_H,
) -> dict[str, list[tuple[int, int]]]:
    label_positions: dict[str, list[tuple[int, int]]] = defaultdict(list)
    toks = [t for t in tokens if t["text"].strip()]
    lines = _build_lines(toks)

    for lbl in expected_labels:
        lbl_words = lbl.split()
        first_word = normalize_text(lbl_words[0])
        last_word = normalize_text(lbl_words[-1])
        exp_s, i_mask = build_expected_masked_upper(lbl)
        n = len(toks)
        max_len = len(lbl_words)
        found = False
        for i in range(n):
            for j in range(i, min(i + max_len, n)):
                seq = toks[i : j + 1]
                if first_word in normalize_text(seq[0]["text"]) and last_word in normalize_text(
                    seq[-1]["text"]
                ):
                    seq_clean = clean_label_sequence([t["text"] for t in seq])
                    if flex_contains(exp_s, i_mask, seq_clean):
                        label_positions[lbl].append((seq[0]["x"], seq[0]["y"]))
                        found = True
        if not found:
            pos = _try_multiline(lines, lbl_words)
            if pos is not None:
                label_positions[lbl].append(pos)
            else:
                for skip in range(1, min(5, len(lbl_words))):
                    pos2 = _try_multiline(lines, lbl_words[skip:])
                    if pos2 is not None:
                        label_positions[lbl].append(pos2)
                        break

    if next_page_tokens is not None:
        head = _next_page_head_lines(
            [t for t in next_page_tokens if t["text"].strip()], img_h, C.NEXT_PAGE_HEAD_LINES
        )
        lines_with_next = lines + head
        for lbl in expected_labels:
            if label_positions.get(lbl):
                continue
            lbl_words = lbl.split()
            pos = _try_multiline(lines_with_next, lbl_words)
            if pos is not None:
                label_positions[lbl].append(pos)
                continue
            for skip in range(1, min(5, len(lbl_words))):
                pos2 = _try_multiline(lines_with_next, lbl_words[skip:])
                if pos2 is not None:
                    label_positions[lbl].append(pos2)
                    break
    return label_positions


# ---------------------------------------------------------------------------
# section regions (extractor.py:534-829)
# ---------------------------------------------------------------------------


def _best_span_in_line(words: list[dict], name_words: list[str]):
    best_start = None
    best_matched = 0
    exp_concat_s, exp_concat_mask = build_expected_masked_upper(" ".join(name_words))
    for start_idx in range(len(words)):
        tok0_clean = ocr_norm_preserve_punct_upper(words[start_idx]["text"])
        if flex_startswith(exp_concat_s, exp_concat_mask, tok0_clean):
            return start_idx, len(name_words)
        matched_here = 0
        k = start_idx
        for lbl_idx in range(len(name_words)):
            if k >= len(words):
                break
            wu, w_mask = build_expected_masked_upper(name_words[lbl_idx])
            tok_clean = ocr_norm_preserve_punct_upper(words[k]["text"])
            ok = (
                flex_startswith(wu, w_mask, tok_clean)
                if lbl_idx == 0
                else flex_contains(wu, w_mask, tok_clean)
            )
            if ok:
                matched_here += 1
                k += 1
            else:
                break
        if matched_here > best_matched:
            best_matched = matched_here
            best_start = start_idx
    return best_start, best_matched


def _continue_multiline_from(lines, i_start, start_idx, name_words, matched_here):
    base_x_tolerance = C.LABEL_MULTILINE_BASE_X_TOLERANCE
    max_lookahead = C.LABEL_MULTILINE_MAX_LOOKAHEAD
    curr_idx = i_start
    curr_lbl_idx = matched_here
    x_ref = lines[i_start]["words"][start_idx]["x"]
    lookahead_used = 0
    while curr_lbl_idx < len(name_words) and lookahead_used < max_lookahead:
        j = curr_idx + 1
        curr_y = lines[curr_idx]["y"]
        while j < len(lines) and lines[j]["y"] <= curr_y:
            j += 1
        if j >= len(lines):
            break
        next_y = lines[j]["y"]
        sibling_indices = []
        kidx = j
        while kidx < len(lines) and lines[kidx]["y"] == next_y:
            sibling_indices.append(kidx)
            kidx += 1
        wuN, w_maskN = build_expected_masked_upper(name_words[curr_lbl_idx])
        best_match = 0
        best_idx = None
        best_start = None
        for li in sibling_indices:
            toks = lines[li]["words"]
            if not toks:
                continue
            cands = [
                idx
                for idx, tok in enumerate(toks)
                if abs(tok["x"] - x_ref) <= base_x_tolerance
                and flex_startswith(wuN, w_maskN, ocr_norm_preserve_punct_upper(tok["text"]))
            ]
            if not cands:
                cands = [
                    idx
                    for idx, tok in enumerate(toks)
                    if flex_startswith(wuN, w_maskN, ocr_norm_preserve_punct_upper(tok["text"]))
                ]
            if not cands:
                cands = [
                    idx
                    for idx, tok in enumerate(toks)
                    if abs(tok["x"] - x_ref) <= base_x_tolerance
                    and flex_contains(wuN, w_maskN, ocr_norm_preserve_punct_upper(tok["text"]))
                ]
            if not cands:
                continue
            best_line_match = 0
            best_line_start = None
            for ci in cands:
                matched_in_line = 0
                k = ci
                while k < len(toks) and (curr_lbl_idx + matched_in_line) < len(name_words):
                    wu2, w2_mask = build_expected_masked_upper(
                        name_words[curr_lbl_idx + matched_in_line]
                    )
                    tok_clean = ocr_norm_preserve_punct_upper(toks[k]["text"])
                    ok2 = (
                        flex_startswith(wu2, w2_mask, tok_clean)
                        if matched_in_line == 0
                        else flex_contains(wu2, w2_mask, tok_clean)
                    )
                    if ok2:
                        matched_in_line += 1
                        k += 1
                    else:
                        break
                if matched_in_line > best_line_match:
                    best_line_match = matched_in_line
                    best_line_start = ci
            if best_line_match > best_match:
                best_match = best_line_match
                best_start = best_line_start
                best_idx = li
        if not best_match or best_start is None or best_idx is None:
            break
        seg_tokens = lines[best_idx]["words"][best_start : best_start + best_match]
        curr_lbl_idx += best_match
        curr_idx = best_idx
        x_ref = seg_tokens[0]["x"]
        lookahead_used += 1
    return curr_lbl_idx


def detect_section_regions(
    tokens: list[dict],
    sections: list[dict],
    checkboxes: list[dict],
    img_w: int = C.PAGE_W,
    max_gap: int = C.SECTION_CB_MAX_GAP_PX,
) -> dict[str, dict]:
    anchor_x_threshold = int(C.ANCHOR_X_FRACTION * img_w)
    lines = _build_lines([t for t in tokens if t["text"].strip()])
    checkbox_y_positions = sorted(cb["y"] for cb in checkboxes)
    section_regions: dict[str, dict] = {}
    claimed_anchor_ys: set[int] = set()

    for section in sections:
        name_words = [w for w in section["section_name"].split() if w]
        if not name_words:
            continue
        best_candidate = None
        for i, line in enumerate(lines):
            words = line["words"]
            if not words:
                continue
            start_idx, matched_here = _best_span_in_line(words, name_words)
            if matched_here == 0 or start_idx is None:
                continue
            start_tok = words[start_idx]
            start_x = int(start_tok["x"])
            start_y = int(start_tok["y"])
            if start_x > anchor_x_threshold:
                continue
            if start_y in claimed_anchor_ys:
                continue
            total_matched = _continue_multiline_from(lines, i, start_idx, name_words, matched_here)
            cand = (int(total_matched), start_y, start_x)
            if best_candidate is None or cand > best_candidate:
                best_candidate = cand
            if total_matched >= len(name_words):
                break
        if best_candidate is None:
            continue
        min_required = 1 if len(name_words) == 1 else 2
        if best_candidate[0] < min_required:
            continue
        _, anchor_y, _ = best_candidate
        claimed_anchor_ys.add(anchor_y)

        y2 = anchor_y
        last_cb_y = None
        for cb_y in checkbox_y_positions:
            if cb_y < anchor_y:
                continue
            if last_cb_y is None or cb_y - last_cb_y <= max_gap:
                y2 = cb_y
                last_cb_y = cb_y
            else:
                break
        section_regions[section["section_name"]] = {
            "x1": C.SECTION_X1,
            "y1": anchor_y,
            "x2": C.SECTION_X2,
            "y2": y2 + C.SECTION_BOTTOM_BUFFER_PX,
        }
    return section_regions


# ---------------------------------------------------------------------------
# row clustering + assignment (extractor.py:831-945)
# ---------------------------------------------------------------------------


def cluster_rows(checkboxes: list[dict], gap: int = C.LABEL_ROW_GAP_PX) -> list[dict]:
    sorted_boxes = sorted(checkboxes, key=lambda b: b["y"])
    rows = []
    current: list[dict] = []
    for box in sorted_boxes:
        if not current:
            current.append(box)
            continue
        if abs(box["y"] - current[-1]["y"]) > gap:
            rows.append({"y": sum(b["y"] for b in current) / len(current), "boxes": current})
            current = [box]
        else:
            current.append(box)
    if current:
        rows.append({"y": sum(b["y"] for b in current) / len(current), "boxes": current})
    return rows


def assign_checkboxes_sectionwise(checkboxes, sections, label_positions, section_regions):
    output_sections = []
    used_boxes: set[int] = set()
    for sec in sections:
        sec_name = sec["section_name"]
        sec_checkboxes = []
        if sec_name not in section_regions:
            continue
        region = section_regions[sec_name]
        y1_effective = region["y1"] + C.ANCHOR_OFFSET_PX
        section_boxes = [b for b in checkboxes if region["y1"] <= b["y"] <= region["y2"]]
        rows = cluster_rows(section_boxes)
        for lbl in sec["labels"]:
            assigned = False
            if lbl not in label_positions or not label_positions[lbl]:
                sec_checkboxes.append({"label": lbl, "status": "missing", "score": 0.0})
                continue
            for lx, ly in label_positions[lbl]:
                if not (y1_effective <= ly <= region["y2"]):
                    continue
                best_distance = None
                best_cb = None
                for row in rows:
                    for cb in row["boxes"]:
                        dist = abs(cb["y"] - ly) + abs(cb["x"] - lx)
                        if best_distance is None or dist < best_distance:
                            best_distance = dist
                            best_cb = cb
                if best_cb is not None:
                    best_row = next((r for r in rows if best_cb in r["boxes"]), None)
                    delta_y = abs(best_row["y"] - ly) if best_row else None
                    box_id = id(best_cb)
                    if best_row is None or delta_y > C.LABEL_CB_ASSIGN_MAX_DELTA_Y:
                        continue
                    if box_id in used_boxes:
                        continue
                    used_boxes.add(box_id)
                    sec_checkboxes.append(
                        {"label": lbl, "status": best_cb["status"], "score": best_cb["score"]}
                    )
                    assigned = True
                    break
            if not assigned:
                sec_checkboxes.append({"label": lbl, "status": "missing", "score": 0.0})
        if any(cb["status"] != "missing" for cb in sec_checkboxes):
            output_sections.append({"section": sec_name, "checkboxes": sec_checkboxes})
    return output_sections


# ---------------------------------------------------------------------------
# full-document pipeline + span flattening (extractor.py:947-1126; §7.2)
# ---------------------------------------------------------------------------


def _page_tuple(pages, page_no):
    entry = pages.get(page_no)
    if entry is None:
        return [], [], []
    if len(entry) == 2:  # back-compat: no highlights
        return entry[0], entry[1], []
    return entry


def select_schema(pages: dict[int, tuple], schemas) -> list[dict]:
    """S5/F15: pick the gender-variant schema from page-1 OCR text
    (reference extractor.py:1216-1232; 'male patient information' is a
    substring of the female phrase — index comparison resolves)."""
    if not isinstance(schemas, dict):
        return schemas
    p1 = _page_tuple(pages, 1)[0]
    norm = " ".join(str(t["text"]) for t in sorted(p1, key=lambda t: t.get("tok_seq", 0))).lower()
    female_hit = "female patient information" in norm
    male_hit = "male patient information" in norm
    if female_hit and male_hit:
        variant = (
            "female"
            if norm.find("female patient information") < norm.find("male patient information")
            else "male"
        )
    elif male_hit:
        variant = "male"
    else:
        variant = "female"
    return schemas[variant]


def extract_document_pages(
    pages: dict[int, tuple],
    sections,
) -> tuple[dict[int, list[dict]], dict[int, list[dict]]]:
    """pages: page_no -> (tokens, raw matches[, highlights]). Returns
    (page_no -> sections_data, page_no -> responses_data), with the
    reference's cross-page remaining-label AND remaining-question
    bookkeeping (extractor.py:978-1056, 1062-1114)."""
    from pdf_parser_spark.oracle.response_oracle import extract_page_responses

    sections = select_schema(pages, sections)
    n_pages = max(pages) if pages else 0
    label_sections = [s for s in sections if s.get("labels")]
    remaining = {s["section_name"]: set(s["labels"]) for s in label_sections}
    completed: set[str] = set()
    remaining_questions: dict[str, list[str]] = {}
    completed_questions: set[str] = set()
    result: dict[int, list[dict]] = {}
    responses: dict[int, list[dict]] = {}

    for page_no in range(1, n_pages + 1):
        tokens, raw_matches, highlights = _page_tuple(pages, page_no)
        checkboxes = deduplicate_matches(raw_matches)

        labels_to_search: list[str] = []
        active_sections = []
        for sec in label_sections:
            name = sec["section_name"]
            if name in completed:
                continue
            rem = remaining.get(name, set())
            if not rem:
                completed.add(name)
                continue
            active_sections.append(sec)
            labels_to_search.extend(sorted(rem))

        next_tokens = _page_tuple(pages, page_no + 1)[0] if page_no < n_pages else None
        label_positions = get_label_positions(tokens, labels_to_search, next_tokens)
        section_regions = detect_section_regions(tokens, sections, checkboxes)

        for sec in active_sections:
            sname = sec["section_name"]
            region = section_regions.get(sname)
            if not region:
                continue
            y1_eff = region["y1"] + C.ANCHOR_OFFSET_PX
            still = set()
            for lbl in remaining.get(sname, set()):
                if not any(
                    y1_eff <= ly <= region["y2"] for _, ly in label_positions.get(lbl, [])
                ):
                    still.add(lbl)
            remaining[sname] = still
            if not still:
                completed.add(sname)

        result[page_no] = assign_checkboxes_sectionwise(
            checkboxes, active_sections, label_positions, section_regions
        )

        # --- question/answer layer (extractor.py:1062-1114) ---
        if page_no == 1:
            for sec in sections:
                qs = sec.get("questions") or []
                if qs:
                    remaining_questions[sec["section_name"]] = list(qs)
        question_sections_active = []
        for sec in sections:
            sname = sec["section_name"]
            qs = sec.get("questions") or []
            if not qs or sname in completed_questions:
                continue
            rem_qs = remaining_questions.get(sname, [])
            if not rem_qs:
                completed_questions.add(sname)
                continue
            question_sections_active.append(dict(sec, questions=list(rem_qs)))

        responses_data = extract_page_responses(
            tokens,
            question_sections_active,
            section_regions,
            checkboxes=checkboxes,
            highlights=highlights,
            next_page_tokens=next_tokens,
        )
        for sec in responses_data or []:
            sname = sec.get("section")
            for q in sec.get("questions", []):
                qt = q.get("question")
                rem_list = remaining_questions.get(sname, [])
                if qt in rem_list:
                    rem_list.remove(qt)
                    remaining_questions[sname] = rem_list
            if not remaining_questions.get(sname):
                completed_questions.add(sname)
        responses[page_no] = responses_data
    return result, responses


def extract_document_spans(
    doc_spans: list[dict],
    pages: dict[int, tuple],
    sections,
) -> list[tuple[str, str, str, int]]:
    """Canonical flattening (SURVEY.md §7.2): walk input spans in offset
    order; 'text' spans pass through; each media span contributes its
    page's section + checkbox spans (text = 'label:status'), then its
    responses sections' question + answer spans; media_ref = the page
    ref, order = running counter."""
    page_data, page_responses = extract_document_pages(pages, sections)
    out: list[tuple[str, str, str, int]] = []
    order = 0
    page_no = 0
    for span in sorted(doc_spans, key=lambda s: s["offset"]):
        if span["kind"] == "text":
            out.append(("text", span["text"], "", order))
            order += 1
        else:
            page_no += 1
            for sec in page_data.get(page_no, []):
                out.append(("section", sec["section"], span["media_ref"], order))
                order += 1
                for cb in sec["checkboxes"]:
                    out.append(
                        ("checkbox", f"{cb['label']}:{cb['status']}", span["media_ref"], order)
                    )
                    order += 1
            for rsec in page_responses.get(page_no, []) or []:
                for q in rsec.get("questions", []):
                    out.append(("question", q.get("question", ""), span["media_ref"], order))
                    order += 1
                    if q.get("answer"):
                        out.append(("answer", q["answer"], span["media_ref"], order))
                        order += 1
    return out
