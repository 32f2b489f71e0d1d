"""Single-process reference oracle for the question/answer layer
(test-only), transcribing the *executed* behavior of
/root/reference/response_extractor.py:

- question line construction        response_extractor.py:113-133 (words x-sorted)
- same-line full matches            response_extractor.py:398-446 (find_all_full_in_line)
- best-span + merged-token fast path response_extractor.py:363-396
- multiline lookahead w/ segments   response_extractor.py:450-570 (try_multiline)
- per-question hit collection       response_extractor.py:572-607 (pass1 + pass2, seen_starts)
- bands from section regions        response_extractor.py:618-648
- band filter + crop retry + widen  response_extractor.py:683-748
- cross-page fallback               response_extractor.py:750-766
- ordinal claiming of duplicates    response_extractor.py:769-782 (J9)
- right bound (row Δy≤12, -5px; narrative exempt)  response_extractor.py:901-932
- fixed answer band [+40,+80], left margin 30       response_extractor.py:943-1037
- continuation window (+10,+50], question-line skip  response_extractor.py:1055-1090
- consecutive dedupe + double collapse + space join  response_extractor.py:1092-1104
- dynamic y_end extension           response_extractor.py:1106-1126
- highlight fallback + slides + probes  response_extractor.py:1203-1322
- second-pass x_end trim (Δy≤24)    response_extractor.py:1325-1352
- global row-group x_end trim       response_extractor.py:1355-1397
- strict pruning crop re-OCR + degradation guard  response_extractor.py:1450-1489
- checkbox-pair inference (left=Yes) response_extractor.py:1491-1593
- follow-up inference ("If yes…")    response_extractor.py:1594-1612
- zip sanitization                  response_extractor.py:1615-1631

The multi-column "\\n" collapse (response_extractor.py:1399-1447) is
dead in the executed path — answers are space-joined and never contain
newlines — and is therefore not modeled (SURVEY.md §7.4.4).

Synthetic perception environment (crop re-OCR, highlight OCR) comes
from pdf_parser_spark.fixtures.generator (the deterministic stand-in
shared with the engine).
"""

from __future__ import annotations

import re
from collections import defaultdict

from pdf_parser_spark import config as C
from pdf_parser_spark.fixtures.generator import crop_tokens, highlight_ocr
from pdf_parser_spark.oracle.reference_oracle import (
    build_expected_masked_upper,
    flex_contains,
    flex_startswith,
    ocr_norm_preserve_punct_upper,
)

ANSWER_COL_GAP_PX = 5
ANSWER_PAGE_RIGHT_MARGIN_PX = 20
ANSWER_ROW_Y_TOLERANCE_PX = 12
ANSWER_LEFT_MARGIN_PX = 30
ANSWER_CONTINUATION_MIN_DELTA_Y = 10
ANSWER_CONTINUATION_MAX_DELTA_Y = 50
YESNO_SLIDE_OFFSETS = [4, 8, 12, 16, 20, 24, 28, 32, 36, 40, 44]
YESNO_PROBE_MAX_BANDS = 2


def _qa_lines(tokens: list[dict]) -> list[dict]:
    """Question-matcher line build: group by (block,par,line), words
    sorted by x, lines sorted by y (stable)."""
    lines: dict[tuple, dict] = {}
    order: list[tuple] = []
    for t in tokens:
        if not str(t["text"]).strip():
            continue
        key = (t["block"], t["par"], t["line"])
        if key not in lines:
            lines[key] = {"words": [], "y": t["y"]}
            order.append(key)
        lines[key]["words"].append(dict(t))
    out = [lines[k] for k in order]
    for ln in out:
        ln["words"].sort(key=lambda w: w["x"])
    out.sort(key=lambda ln: ln["y"])
    return out


def _find_all_full_in_line(words: list[dict], q_words: list[str]) -> list[dict]:
    segments = []
    if not words:
        return segments
    full = " ".join(q_words)
    exp_s, exp_mask = build_expected_masked_upper(full)
    for start_idx in range(len(words)):
        tok0 = ocr_norm_preserve_punct_upper(words[start_idx]["text"])
        if flex_startswith(exp_s, exp_mask, tok0):
            seg_tokens = [words[start_idx]]
            segments.append(
                {
                    "line_y": int(min(t["y"] for t in seg_tokens)),
                    "start_x": seg_tokens[0]["x"],
                    "end_x": seg_tokens[-1]["x"] + seg_tokens[-1]["w"],
                    "count": len(q_words),
                    "tokens": [t["text"] for t in seg_tokens],
                }
            )
            continue
        matched = 0
        k = start_idx
        for qi in range(len(q_words)):
            if k >= len(words):
                matched = 0
                break
            wu, w_mask = build_expected_masked_upper(q_words[qi])
            tok_c = ocr_norm_preserve_punct_upper(words[k]["text"])
            ok = (
                flex_startswith(wu, w_mask, tok_c)
                if qi == 0
                else flex_contains(wu, w_mask, tok_c)
            )
            if ok:
                matched += 1
                k += 1
            else:
                matched = 0
                break
        if matched == len(q_words):
            seg_tokens = words[start_idx : start_idx + matched]
            segments.append(
                {
                    "line_y": int(min(t["y"] for t in seg_tokens)),
                    "start_x": seg_tokens[0]["x"],
                    "end_x": seg_tokens[-1]["x"] + seg_tokens[-1]["w"],
                    "count": matched,
                    "tokens": [t["text"] for t in seg_tokens],
                }
            )
    return segments


def _best_span_in_line(words: list[dict], q_words: list[str]):
    full = " ".join(q_words)
    exp_s, exp_mask = build_expected_masked_upper(full)
    best_start = None
    best_matched = 0
    for start_idx in range(len(words)):
        tok0 = ocr_norm_preserve_punct_upper(words[start_idx]["text"])
        if flex_startswith(exp_s, exp_mask, tok0):
            return start_idx, len(q_words)
        matched = 0
        k = start_idx
        for qi in range(len(q_words)):
            if k >= len(words):
                break
            wu, w_mask = build_expected_masked_upper(q_words[qi])
            tok_c = ocr_norm_preserve_punct_upper(words[k]["text"])
            ok = (
                flex_startswith(wu, w_mask, tok_c)
                if qi == 0
                else flex_contains(wu, w_mask, tok_c)
            )
            if ok:
                matched += 1
                k += 1
            else:
                break
        if matched > best_matched:
            best_matched = matched
            best_start = start_idx
        if matched == len(q_words):
            break
    return best_start, best_matched


def _try_multiline(lines: list[dict], q_words: list[str]):
    x_tol = C.LABEL_MULTILINE_BASE_X_TOLERANCE
    max_ahead = C.LABEL_MULTILINE_MAX_LOOKAHEAD
    for i, line in enumerate(lines):
        words = line["words"]
        if not words:
            continue
        best_start, matched = _best_span_in_line(words, q_words)
        if matched == 0:
            continue
        start_x = words[best_start]["x"]
        start_y = words[best_start]["y"]
        x_ref = start_x
        lbl_at = matched
        cur = i
        matched_all = lbl_at == len(q_words)
        ahead = 0
        seg0 = words[best_start : best_start + matched]
        segments = [
            {
                "line_y": int(min(t["y"] for t in seg0) if matched > 0 else line.get("y", 0)),
                "start_x": start_x,
                "end_x": words[min(best_start + max(0, matched - 1), len(words) - 1)]["x"]
                + words[min(best_start + max(0, matched - 1), len(words) - 1)]["w"],
                "count": matched,
                "tokens": [t["text"] for t in seg0],
            }
        ]
        while not matched_all and ahead < max_ahead:
            j = cur + 1
            cur_y = lines[cur]["y"] if cur < len(lines) else None
            while j < len(lines) and cur_y is not None and lines[j]["y"] <= cur_y:
                j += 1
            if j >= len(lines):
                break
            next_y = lines[j]["y"]
            sibs = []
            k = j
            while k < len(lines) and lines[k]["y"] == next_y:
                sibs.append(k)
                k += 1
            want = q_words[lbl_at]
            wuN, w_maskN = build_expected_masked_upper(want)
            best_run, best_li, best_segtoks = 0, None, None
            for li in sibs:
                toks = lines[li]["words"]
                if not toks:
                    continue
                cands = [
                    idx for idx, t in enumerate(toks)
                    if abs(t["x"] - x_ref) <= x_tol
                    and flex_startswith(wuN, w_maskN, ocr_norm_preserve_punct_upper(t["text"]))
                ] or [
                    idx for idx, t in enumerate(toks)
                    if flex_startswith(wuN, w_maskN, ocr_norm_preserve_punct_upper(t["text"]))
                ] or [
                    idx for idx, t in enumerate(toks)
                    if abs(t["x"] - x_ref) <= x_tol
                    and flex_contains(wuN, w_maskN, ocr_norm_preserve_punct_upper(t["text"]))
                ]
                if not cands:
                    continue
                line_best, line_start = 0, None
                for ci in cands:
                    run = 0
                    k2 = ci
                    while k2 < len(toks) and lbl_at + run < len(q_words):
                        wu2, w2m = build_expected_masked_upper(q_words[lbl_at + run])
                        tok_c = ocr_norm_preserve_punct_upper(toks[k2]["text"])
                        ok2 = (
                            flex_startswith(wu2, w2m, tok_c)
                            if run == 0
                            else flex_contains(wu2, w2m, tok_c)
                        )
                        if ok2:
                            run += 1
                            k2 += 1
                        else:
                            break
                    if run > line_best:
                        line_best = run
                        line_start = ci
                if line_best > best_run:
                    best_run = line_best
                    best_li = li
                    best_segtoks = lines[li]["words"][line_start : line_start + line_best]
            if best_run == 0 or best_li is None or best_segtoks is None:
                break
            segments.append(
                {
                    "line_y": int(min(t["y"] for t in best_segtoks)),
                    "start_x": best_segtoks[0]["x"],
                    "end_x": best_segtoks[-1]["x"] + best_segtoks[-1]["w"],
                    "count": best_run,
                    "tokens": [t["text"] for t in best_segtoks],
                }
            )
            lbl_at += best_run
            cur = best_li
            ahead += 1
            x_ref = best_segtoks[0]["x"]
            matched_all = lbl_at == len(q_words)
        if matched_all:
            return {"start": (start_x, start_y), "segments": segments}
    return None


def _next_page_head_qa(next_tokens: list[dict], img_h: int, head_lines: int) -> list[dict]:
    shifted = [dict(t, y=t["y"] + img_h) for t in next_tokens if str(t["text"]).strip()]
    if not shifted:
        return []
    nls = _qa_lines(shifted)
    kept = []
    groups = 0
    i = 0
    while i < len(nls) and groups < max(0, int(head_lines)):
        gy = nls[i]["y"]
        while i < len(nls) and nls[i]["y"] == gy:
            kept.append(nls[i])
            i += 1
        groups += 1
    return kept


def match_questions_like_labels(
    tokens: list[dict],
    questions: list[str],
    next_page_tokens: list[dict] | None = None,
    img_h: int = C.PAGE_H,
    head_lines: int = C.NEXT_PAGE_HEAD_LINES,
) -> dict[str, list[dict]]:
    lines = _qa_lines(tokens)
    if next_page_tokens is not None:
        lines = lines + _next_page_head_qa(next_page_tokens, img_h, head_lines)

    results: dict[str, list[dict]] = defaultdict(list)
    unique_questions = []
    seen_q = set()
    for q in questions:
        if q not in seen_q:
            unique_questions.append(q)
            seen_q.add(q)
    for q in unique_questions:
        q_words = [w for w in q.split() if w]
        if not q_words:
            continue
        seen_starts = set()
        for line in lines:
            for seg in _find_all_full_in_line(line["words"], q_words):
                sx, sy = int(seg["start_x"]), int(seg["line_y"])
                if (sx, sy) in seen_starts:
                    continue
                seen_starts.add((sx, sy))
                results[q].append({"x": sx, "y": sy, "segments": [seg]})
        hit = _try_multiline(lines, q_words)
        if hit is not None:
            sx, sy = int(hit["start"][0]), int(hit["start"][1])
            if (sx, sy) not in seen_starts:
                results[q].append({"x": sx, "y": sy, "segments": hit["segments"]})
    return results


def match_sections_and_questions(
    tokens: list[dict],
    sections: list[dict],
    section_regions: dict,
    img_w: int = C.PAGE_W,
    img_h: int = C.PAGE_H,
    next_page_tokens: list[dict] | None = None,
) -> list[dict]:
    anchors: dict[str, int] = {}
    bands: dict[str, tuple[int, int]] = {}
    for sec in sections:
        name = sec["section_name"]
        reg = section_regions.get(name)
        if not reg:
            continue
        anchors[name] = reg.get("y1")
    ordered = sorted([(n, y) for n, y in anchors.items() if y is not None], key=lambda t: t[1])
    name_to_next = {}
    for idx, (name, y1) in enumerate(ordered):
        name_to_next[name] = ordered[idx + 1][1] - 1 if (idx + 1) < len(ordered) else img_h
    for name, anchor_y in ordered:
        reg = section_regions.get(name) or {}
        region_y2 = int(reg["y2"]) if isinstance(reg.get("y2"), (int, float)) else None
        nb = name_to_next.get(name, img_h)
        bands[name] = (anchor_y, min(region_y2, nb)) if region_y2 is not None else (anchor_y, nb)

    out = []
    for sec in sections:
        sec_name = sec["section_name"]
        qs = sec.get("questions") or []
        if not qs:
            continue
        qhits = match_questions_like_labels(tokens, qs)
        sec_hits = []
        claimed: dict[str, set] = defaultdict(set)
        yband = bands.get(sec_name)
        sec_anchor_y = anchors.get(sec_name)
        min_start_y = (
            int(sec_anchor_y) + C.ANCHOR_OFFSET_PX
            if isinstance(sec_anchor_y, (int, float))
            else None
        )
        for q in qs:
            hits = [h for h in qhits.get(q, []) if not h.get("skipped")]
            if yband:
                y1, y2 = yband
                hits = [
                    h for h in hits
                    if y1 <= h.get("y", 0) <= y2
                    and (min_start_y is None or h.get("y", 0) >= min_start_y)
                ]
            if not hits and yband:
                y1, y2 = yband
                y1_eff = int(y1)
                if isinstance(sec_anchor_y, (int, float)):
                    y1_eff = max(y1_eff, int(sec_anchor_y) + C.ANCHOR_OFFSET_PX)
                y1c = max(0, y1_eff)
                y2c_primary = max(y1c + 1, int(min(img_h, y2)))

                def try_crop(y2c_local):
                    sub = crop_tokens(tokens, 0, y1c, img_w, y2c_local)
                    bhits = match_questions_like_labels(sub, [q]).get(q, [])
                    local = []
                    for bh in bhits:
                        bh["y"] = int(bh.get("y", 0)) + y1c
                        for seg in bh.get("segments", []):
                            seg["line_y"] = int(seg["line_y"]) + y1c
                        if (min_start_y is None) or (bh.get("y", 0) >= min_start_y):
                            local.append(bh)
                    return local

                band_hits = try_crop(y2c_primary)
                if not band_hits and section_regions and sec_name in anchors:
                    idx = next((i for i, (n, _) in enumerate(ordered) if n == sec_name), None)
                    if idx is not None:
                        nb = ordered[idx + 1][1] - 1 if (idx + 1) < len(ordered) else img_h
                        y2c_wide = max(y1c + 1, int(min(img_h, nb)))
                        if y2c_wide > y2c_primary:
                            band_hits = try_crop(y2c_wide)
                hits.extend(band_hits)
            if not hits and next_page_tokens is not None:
                xhits = match_questions_like_labels(
                    tokens, [q], next_page_tokens=next_page_tokens, img_h=img_h
                ).get(q, [])
                if yband:
                    y1, y2 = yband
                    xhits = [
                        h for h in xhits
                        if y1 <= h.get("y", 0) <= y2
                        and (min_start_y is None or h.get("y", 0) >= min_start_y)
                    ]
                hits.extend(xhits)
            if not hits:
                continue
            for chosen in sorted(hits, key=lambda h: (h.get("y", 0), h.get("x", 0))):
                cx, cy = int(chosen.get("x", 0)), int(chosen.get("y", 0))
                if (cx, cy) in claimed[q]:
                    continue
                claimed[q].add((cx, cy))
                sec_hits.append(
                    {
                        "question": q,
                        "position": [cx, cy],
                        "segments": chosen.get("segments", []),
                        "skipped": chosen.get("skipped") if "skipped" in chosen else None,
                    }
                )
                break
        if sec_hits:
            out.append({"section": sec_name, "anchor_y": anchors.get(sec_name), "questions": sec_hits})
    return out


def _looks_yes_no_question(q_text: str) -> bool:
    if not q_text:
        return False
    lower = q_text.lower()
    trig = (
        "would you" in lower or "do you" in lower or "are you" in lower
        or "have you" in lower or "yes" in lower or "no" in lower
    )
    return trig and lower.strip().endswith("?")


def _answer_line_list(tokens: list[dict]) -> list[dict]:
    """Answer-phase line build: (block,par,line) grouping, words in OCR
    order (NOT x-sorted), line y/h from first token, h maxed."""
    lines: dict[tuple, dict] = {}
    order: list[tuple] = []
    for t in tokens:
        word = str(t["text"]).strip()
        key = (t["block"], t["par"], t["line"])
        if key not in lines:
            lines[key] = {"words": [], "y": int(t["y"]), "h": int(t["h"])}
            order.append(key)
        if word:
            lines[key]["words"].append(
                {"text": word, "x": int(t["x"]), "y": int(t["y"]), "w": int(t["w"]), "h": int(t["h"])}
            )
            lines[key]["h"] = max(lines[key]["h"], int(t["h"]))
    out = sorted((lines[k] for k in order), key=lambda ln: ln["y"])
    for ln in out:
        ln["text"] = " ".join(w["text"] for w in ln["words"]) if ln["words"] else ""
    return out


def extract_page_responses(
    tokens: list[dict],
    question_sections: list[dict],
    section_regions: dict,
    checkboxes: list[dict] | None = None,
    highlights: list[dict] | None = None,
    next_page_tokens: list[dict] | None = None,
    img_w: int = C.PAGE_W,
    img_h: int = C.PAGE_H,
) -> list[dict]:
    """Full executed path of extract_responses_from_page."""
    matches = match_sections_and_questions(
        tokens, question_sections, section_regions, img_w, img_h, next_page_tokens
    )
    highlights = highlights or []
    line_list = _answer_line_list(tokens)

    def compute_right_bound(section_questions, current_q):
        cx = current_q["position"][0]
        cy = current_q["position"][1]
        segments = current_q.get("segments") or []
        seg_tokens_lower = []
        for seg in segments:
            if isinstance(seg, dict):
                seg_tokens_lower.extend([t.lower() for t in seg.get("tokens", [])])
        is_narrative = "medical" in seg_tokens_lower and "conditions" in seg_tokens_lower
        candidates = []
        for q in section_questions:
            if q is current_q:
                continue
            qx, qy = q.get("position", [None, None])
            if qx is None or qy is None:
                continue
            if abs(qy - cy) <= ANSWER_ROW_Y_TOLERANCE_PX and qx > cx:
                candidates.append(qx)
        if candidates and not is_narrative:
            return min(candidates) - ANSWER_COL_GAP_PX
        return img_w - ANSWER_PAGE_RIGHT_MARGIN_PX

    def collect_answer_lines(q_start_x, q_start_y, q_segments, right_x, question_line_token_set):
        last_seg_y = q_start_y
        if q_segments:
            seg_ys = [int(s.get("line_y", last_seg_y)) for s in q_segments if isinstance(s, dict)]
            if seg_ys:
                last_seg_y = max(seg_ys)
        start_collect_y = last_seg_y + C.ANCHOR_OFFSET_PX
        band_bottom_y = start_collect_y + C.ANCHOR_OFFSET_PX
        answers = []
        captured_any = False
        left_bound = max(0, q_start_x - ANSWER_LEFT_MARGIN_PX)
        captured_line_ys: list[int] = []
        for ln in line_list:
            ly = ln["y"]
            if ly <= last_seg_y:
                continue
            if ly < start_collect_y or ly > band_bottom_y:
                continue
            window_tokens = [w["text"] for w in ln["words"] if left_bound <= w["x"] <= right_x]
            if window_tokens:
                answers.append(" ".join(t for t in window_tokens if t))
                captured_any = True
                captured_line_ys.append(ly)
        if captured_any and captured_line_ys:
            y_answer = min(captured_line_ys)
            cont_start = y_answer + ANSWER_CONTINUATION_MIN_DELTA_Y
            cont_end = y_answer + ANSWER_CONTINUATION_MAX_DELTA_Y
            for ln2 in line_list:
                ly2 = ln2["y"]
                if ly2 <= y_answer:
                    continue
                if ly2 <= cont_start:
                    continue
                if ly2 > cont_end:
                    break
                if ly2 in captured_line_ys:
                    continue
                c_tokens = [w["text"] for w in ln2["words"] if left_bound <= w["x"] <= right_x]
                if not c_tokens:
                    continue
                if question_line_token_set:
                    if " ".join(c_tokens).strip().lower() in question_line_token_set:
                        continue
                answers.append(" ".join(t for t in c_tokens if t))
                captured_line_ys.append(ly2)
        if answers:
            cleaned = [" ".join(a.split()) for a in answers if a]
            deduped: list[str] = []
            for cl in cleaned:
                if not deduped or deduped[-1] != cl:
                    deduped.append(cl)
            if len(deduped) == 2 and deduped[0] == deduped[1]:
                deduped = [deduped[0]]
            ans_text = " ".join(deduped).strip()
        else:
            ans_text = ""
        dynamic_y_end = band_bottom_y
        if captured_line_ys:
            last_captured_y = max(captured_line_ys)
            last_ln = next((ln for ln in line_list if ln["y"] == last_captured_y), None)
            last_h = int(last_ln.get("h") or 0) if last_ln else 0
            if last_captured_y > band_bottom_y:
                dynamic_y_end = last_captured_y + max(last_h, 0)
        return ans_text, start_collect_y, dynamic_y_end

    # answers + windows per section
    for sec in matches:
        qlist = sec.get("questions", [])
        question_line_token_set = set()
        for q_line in qlist:
            for seg in q_line.get("segments") or []:
                if isinstance(seg, dict):
                    toks = [t.lower() for t in seg.get("tokens", []) if t]
                    if toks:
                        question_line_token_set.add(" ".join(toks))
        for q in qlist:
            q_start_x, q_start_y = q.get("position", [None, None])
            if q_start_x is None:
                continue
            right_bound = compute_right_bound(qlist, q)
            ans_text, win_y1, win_y2 = collect_answer_lines(
                q_start_x, q_start_y, q.get("segments"), right_bound, question_line_token_set
            )
            q["answer_window"] = {
                "x_start": max(0, int(q_start_x) - ANSWER_LEFT_MARGIN_PX),
                "y_start": int(win_y1),
                "x_end": int(right_bound),
                "y_end": int(win_y2),
            }
            if ans_text:
                q["answer"] = ans_text
        # highlight fallback for empty yes/no windows
        for q in qlist:
            if q.get("answer"):
                continue
            aw = q.get("answer_window")
            if not aw:
                continue
            if not _looks_yes_no_question(q.get("question", "")):
                continue
            recovered = highlight_ocr(highlights, aw)
            if recovered in ("Yes", "No"):
                q["answer"] = recovered
                q["answer_inferred"] = False
                q["answer_method"] = "highlight_fallback"
            else:
                segs = q.get("segments") or []
                last_seg_y = None
                for s in segs:
                    ly = s.get("line_y")
                    if isinstance(ly, (int, float)):
                        last_seg_y = ly if last_seg_y is None else max(last_seg_y, ly)
                band_h = aw["y_end"] - aw["y_start"]
                if last_seg_y is not None and band_h > 0 and not q.get("answer"):
                    slide_offsets = list(YESNO_SLIDE_OFFSETS)
                    if band_h not in slide_offsets:
                        slide_offsets.append(band_h)
                    slide_offsets = sorted(slide_offsets)
                    for off in slide_offsets:
                        y1 = int(last_seg_y + off)
                        y2 = y1 + band_h
                        if y2 > img_h:
                            break
                        rec = highlight_ocr(
                            highlights,
                            {"x_start": aw["x_start"], "y_start": y1,
                             "x_end": aw["x_end"], "y_end": y2},
                        )
                        if rec in ("Yes", "No"):
                            q["answer"] = rec
                            q["answer_inferred"] = False
                            q["answer_method"] = f"highlight_slide_{off}"
                            break
                if not q.get("answer"):
                    band_h = aw["y_end"] - aw["y_start"]
                    for probe_idx in range(1, YESNO_PROBE_MAX_BANDS + 1):
                        if q.get("answer"):
                            break
                        rec2 = highlight_ocr(
                            highlights,
                            {"x_start": aw["x_start"],
                             "y_start": aw["y_start"] + probe_idx * band_h,
                             "x_end": aw["x_end"],
                             "y_end": aw["y_start"] + (probe_idx + 1) * band_h},
                        )
                        if rec2 in ("Yes", "No"):
                            q["answer"] = rec2
                            q["answer_inferred"] = False
                            q["answer_method"] = f"highlight_probe_{probe_idx}"
                            break
        # second pass: x_end trim within the section
        for q in qlist:
            aw = q.get("answer_window")
            if not aw:
                continue
            qx = aw.get("x_start")
            q_end = aw.get("x_end")
            qy = q.get("position", [0, 0])[1]
            if qx is None or q_end is None:
                continue
            min_end = q_end
            for other in qlist:
                if other is q:
                    continue
                ox, oy = other.get("position", [None, None])
                if ox is None or ox <= qx:
                    continue
                if abs(oy - qy) <= ANSWER_ROW_Y_TOLERANCE_PX * 2:
                    candidate = ox - ANSWER_COL_GAP_PX
                    if candidate < min_end and candidate >= qx:
                        min_end = candidate
            if min_end < q_end:
                aw["x_end"] = max(qx, min_end)

    # global row-group x_end trim (across sections)
    all_entries = []
    for sec in matches:
        for q in sec.get("questions", []):
            aw = q.get("answer_window")
            pos = q.get("position", [None, None])
            if aw and pos and pos[0] is not None and pos[1] is not None:
                all_entries.append((q, int(pos[1]), int(aw.get("x_start", pos[0]))))
    all_entries.sort(key=lambda t: t[1])
    groups: list[list[tuple]] = []
    for entry in all_entries:
        placed = False
        for g in groups:
            if abs(g[0][1] - entry[1]) <= ANSWER_ROW_Y_TOLERANCE_PX * 2:
                g.append(entry)
                placed = True
                break
        if not placed:
            groups.append([entry])
    for g in groups:
        g.sort(key=lambda t: t[2])
        for i in range(len(g) - 1):
            q_curr, _, x_curr = g[i]
            q_next, _, x_next = g[i + 1]
            aw_curr = q_curr.get("answer_window")
            aw_next = q_next.get("answer_window")
            if not aw_curr or not aw_next:
                continue
            x_end_curr = aw_curr.get("x_end")
            if x_end_curr is None:
                continue
            if x_end_curr >= x_next:
                new_end = x_next - ANSWER_COL_GAP_PX
                if new_end < aw_curr.get("x_start", x_curr):
                    new_end = aw_curr.get("x_start", x_curr)
                aw_curr["x_end"] = new_end

    # strict horizontal pruning: crop re-OCR of the stored window
    for sec in matches:
        for q in sec.get("questions", []):
            aw = q.get("answer_window")
            ans = q.get("answer")
            if not aw or not ans:
                continue
            x0, x1 = aw.get("x_start"), aw.get("x_end")
            y0, y1 = aw.get("y_start"), aw.get("y_end")
            if None in (x0, x1, y0, y1):
                continue
            kept_tokens = [
                str(t["text"]).strip()
                for t in crop_tokens(tokens, int(x0), int(y0), int(x1), int(y1))
                if str(t["text"]).strip()
            ]
            if not kept_tokens:
                continue
            orig_tokens = ans.split()
            removed = [tok for tok in orig_tokens if tok not in kept_tokens]
            joined_new = " ".join(kept_tokens)
            degraded = (
                ("gmail" in ans.lower() and "qmail" in joined_new.lower())
                or ("days" in ans.lower() and "davs" in joined_new.lower())
            )
            if removed and not degraded:
                q["answer"] = joined_new

    # checkbox-pair inference for the reminder question
    if checkboxes:
        cb_list = [
            {"position": [cb["x"], cb["y"], cb["w"], cb["h"]], "status": cb["status"]}
            for cb in checkboxes
        ]
        for sec in matches:
            for q in sec.get("questions", []):
                if q.get("answer"):
                    continue
                segments = q.get("segments") or []
                tokens_flat = []
                for seg in segments:
                    if isinstance(seg, dict):
                        tokens_flat.extend([t.lower() for t in seg.get("tokens", [])])
                if not tokens_flat:
                    continue
                key_hits = 0
                for kw in ("reminders?", "automatic", "appointment", "messages."):
                    if kw.rstrip("?").rstrip(".").lower() in tokens_flat:
                        key_hits += 1
                is_reminder = key_hits >= 2 and (
                    "reminders" in tokens_flat or any(t.startswith("reminder") for t in tokens_flat)
                )
                if not is_reminder:
                    continue
                last_seg_y = None
                for seg in segments:
                    if isinstance(seg, dict) and seg.get("line_y") is not None:
                        ly = seg.get("line_y")
                        if last_seg_y is None or ly > last_seg_y:
                            last_seg_y = ly
                if last_seg_y is None:
                    last_seg_y = q.get("position", [0, 0])[1]
                y_low = last_seg_y - 20
                y_high = last_seg_y + 70
                nearby = [cb for cb in cb_list if y_low <= cb["position"][1] <= y_high]
                nearby.sort(key=lambda c: c["position"][0])
                pair = []
                seen_x: set[int] = set()
                for cb in nearby:
                    x = cb["position"][0]
                    if all(abs(x - ex) >= 5 for ex in seen_x):
                        pair.append(cb)
                        seen_x.add(x)
                    if len(pair) == 2:
                        break
                if len(pair) != 2:
                    continue
                statuses = [cb.get("status") for cb in pair]
                ticked_idx = [i for i, s in enumerate(statuses) if s == "ticked"]
                if len(ticked_idx) == 1:
                    q["answer"] = "Yes" if ticked_idx[0] == 0 else "No"
                    q["answer_inferred"] = True
                    q["answer_source"] = "checkbox"
                elif len(ticked_idx) == 2:
                    q["answer"] = "Yes"
                    q["answer_inferred"] = True
                    q["answer_source"] = "checkbox"

    # follow-up inference
    for sec in matches:
        qs = sec.get("questions", [])
        for i, q in enumerate(qs):
            text = (q.get("question") or "").lower()
            if "appointment" in text and "reminder" in text and not q.get("answer"):
                if i + 1 < len(qs):
                    next_q = qs[i + 1]
                    next_text = (next_q.get("question") or "").lower()
                    if next_q.get("answer") and next_text.startswith("if yes"):
                        q["answer"] = "Yes"
                        q["answer_inferred"] = True
                        q["answer_source"] = "followup_inference"

    # zip sanitization
    zip_re = re.compile(r"^\d{5}(-\d{4})?$")
    for sec in matches:
        for q in sec.get("questions", []):
            qtext = (q.get("question") or "").lower()
            ans = q.get("answer")
            if not ans:
                continue
            if "zip" in qtext and "code" in qtext:
                for tok in ans.split():
                    if zip_re.match(tok):
                        if tok != ans:
                            q["answer"] = tok
                        break
    return matches
