"""Native-decoder simulation fixture: page IMAGES + a pure-function OCR.

Lets ``decoder="native"`` run through REAL Spark transport end-to-end
in an environment without Tesseract: pages are rendered as actual
numpy images (planted checkbox templates, matched by the real
TM_CCOEFF_NORMED kernel after the real preprocess chain), and the OCR
binding is a deterministic simulator — a pure function of the image —
bound on workers via the dotted-path mechanism
(``perception.configure_native(ocr="pdf_parser_spark.fixtures.native_sim:sim_ocr")``).

The simulator must recover (doc, page) from pixels alone (OCR sees
only the image), so each rendered page carries a machine-readable key
strip: 24 bits (16-bit doc index + 8-bit page number) as 12×12 px
black/white blocks in the top-left corner. Block means survive the
preprocess chain (sharpen/contrast/CLAHE/unsharp shift values but keep
near-black blocks below and near-white blocks above mid-gray), so the
key decodes from the PREPROCESSED page the OCR actually receives.
Crops (K5 re-OCR) carry no key strip → the simulator returns no
tokens, modeling an OCR miss.
"""

from __future__ import annotations

import os

import numpy as np

PAGE_H, PAGE_W = 900, 1100
_BLOCK = 12
_KEY_BITS = 24

SIM_SECTIONS = [
    {"section_rank": 0, "section_name": "ALLERGIES",
     "labels": ["Penicillin", "Latex"]},
    {"section_rank": 1, "section_name": "SOCIAL HISTORY",
     "labels": ["Smoking", "Alcohol Use"]},
]

# per-page layout: (section on page 1, section on page 2)
_PAGE_SECTIONS = {1: SIM_SECTIONS[0], 2: SIM_SECTIONS[1]}


def doc_id_of(idx: int) -> str:
    return f"nd_{idx:04d}"


def _ticked(idx: int, page_no: int, col: int) -> bool:
    return (idx + page_no + col) % 2 == 0


def sim_page_tokens(idx: int, page_no: int) -> list[dict]:
    """Deterministic OCR truth for a rendered page: the section header
    plus one label per checkbox column."""
    sec = _PAGE_SECTIONS[page_no]
    tokens = []
    seq = 0

    def emit(text: str, x: int, y: int, block: int):
        nonlocal seq
        tokens.append({"tok_seq": seq, "text": text, "x": x, "y": y,
                       "w": 14 * len(text), "h": 28, "block": block,
                       "par": 1, "line": 1})
        seq += 1

    hx = 80
    for w in sec["section_name"].split():
        emit(w, hx, 200, 1)
        hx += 14 * len(w) + 12
    for col, label in enumerate(sec["labels"]):
        lx = 400 + 350 * col
        for w in label.split():
            emit(w, lx, 330, 2)
            lx += 14 * len(w) + 10
    return tokens


def _encode_key(page: np.ndarray, idx: int, page_no: int) -> None:
    value = (idx & 0xFFFF) << 8 | (page_no & 0xFF)
    for i in range(_KEY_BITS):
        bit = (value >> i) & 1
        page[0:_BLOCK, i * _BLOCK : (i + 1) * _BLOCK] = 0 if bit else 255


def decode_key(img: np.ndarray) -> tuple[int, int] | None:
    """(doc_idx, page_no) from the key strip, or None if absent. A
    plausible strip requires the guard block (always-black block at the
    end) to read black."""
    if img.shape[0] < _BLOCK or img.shape[1] < (_KEY_BITS + 1) * _BLOCK:
        return None
    gray = img.mean(axis=-1) if img.ndim == 3 else img
    guard = gray[0:_BLOCK, _KEY_BITS * _BLOCK : (_KEY_BITS + 1) * _BLOCK].mean()
    if guard >= 128:
        return None
    value = 0
    for i in range(_KEY_BITS):
        block = gray[0:_BLOCK, i * _BLOCK : (i + 1) * _BLOCK].mean()
        if block < 128:
            value |= 1 << i
    return value >> 8, value & 0xFF


def render_page(idx: int, page_no: int) -> np.ndarray:
    """Actual page image: key strip + guard, planted checkbox templates
    left of each label position (matched later by the real
    TM_CCOEFF_NORMED kernel on the preprocessed image)."""
    from pdf_parser_spark.sources.perception import default_templates

    ticked_t, empty_t = default_templates()
    page = np.full((PAGE_H, PAGE_W, 3), 255, dtype=np.uint8)
    _encode_key(page, idx, page_no)
    page[0:_BLOCK, _KEY_BITS * _BLOCK : (_KEY_BITS + 1) * _BLOCK] = 0  # guard
    sec = _PAGE_SECTIONS[page_no]
    for col in range(len(sec["labels"])):
        x = 400 + 350 * col - 70
        t = ticked_t if _ticked(idx, page_no, col) else empty_t
        page[330:367, x : x + 37] = t[..., None]
    return page


def sim_ocr(img: np.ndarray) -> list[dict]:
    """Pure-function OCR simulator: reads the page key from the pixels
    and returns that page's deterministic token table; crops (no key)
    recognize nothing."""
    key = decode_key(img)
    if key is None:
        return []
    idx, page_no = key
    return sim_page_tokens(idx, page_no)


def sim_yesno(img: np.ndarray) -> str:
    return ""


def expected_spans(idx: int, out_dir: str) -> list[tuple]:
    """The extraction output this fixture must produce (independent
    hand-derivation, not via the engine)."""
    out = [("text", f"native doc {idx}", "", 0)]
    order = 1
    for page_no in (1, 2):
        ref = os.path.join(out_dir, f"d{idx}_p{page_no}.npy")
        sec = _PAGE_SECTIONS[page_no]
        out.append(("section", sec["section_name"], ref, order))
        order += 1
        for col, label in enumerate(sec["labels"]):
            status = "ticked" if _ticked(idx, page_no, col) else "empty"
            out.append(("checkbox", f"{label}:{status}", ref, order))
            order += 1
    return out


def build_native_fixture(out_dir: str, n_docs: int) -> str:
    """Write page .npy images + a documents parquet whose media_refs
    point at them. Returns the documents parquet path."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for idx in range(n_docs):
        spans = [{"kind": "text", "text": f"native doc {idx}",
                  "media_ref": "", "offset": 0}]
        for page_no in (1, 2):
            path = os.path.join(out_dir, f"d{idx}_p{page_no}.npy")
            np.save(path, render_page(idx, page_no))
            spans.append({"kind": "pdf_page", "text": "",
                          "media_ref": path, "offset": page_no})
        rows.append({"doc_id": doc_id_of(idx), "spans": spans})
    docs_path = os.path.join(out_dir, "documents.parquet")
    pd.DataFrame(rows).to_parquet(docs_path, index=False)
    return docs_path
