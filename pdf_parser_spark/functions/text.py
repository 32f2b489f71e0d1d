"""Scalar text functions of the extraction engine (SURVEY.md §2.8).

Python forms (used inside the per-doc geometry kernels and the oracle)
plus Spark-expression builders for the relationally-expressible pieces:
the IL1-flex matchers F4-F6 compile to anchored/unanchored regexes
consumed by ``rlike`` — char-wise equivalent to the reference's
character loop (/root/reference/extractor.py:249-269): expected
uppercase 'I' also accepts 'L'/'l'/'1'; all other positions are
case-insensitive equality.

Reference provenance:
- normalize_text                  /root/reference/extractor.py:218-225
- clean_label_sequence            /root/reference/extractor.py:227-233
- build_expected_masked_upper     /root/reference/extractor.py:237-247
- flex equal/contains/startswith  /root/reference/extractor.py:249-269
- ocr_norm_preserve_punct_upper   /root/reference/response_extractor.py:348-363
- letters_only                    /root/reference/extractor.py:593-596
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache


def nfkd_strip_controls(text: str) -> str:
    t = unicodedata.normalize("NFKD", text)
    return "".join(c for c in t if unicodedata.category(c)[0] != "C")


# normalize_text / ocr_norm are the geometry kernel's hottest scalar
# calls (every token × every label comparison). OCR vocabularies are
# highly repetitive, so memoization turns the NFKD pass into a dict hit.
@lru_cache(maxsize=65536)
def normalize_text(text: str) -> str:
    """F1: NFKD → strip controls → drop '/',' ','-' → trim non-alpha ends → upper."""
    t = nfkd_strip_controls(text)
    t = t.replace("/", "").replace(" ", "").replace("-", "")
    t = re.sub(r"^[^a-zA-Z]+", "", t)
    t = re.sub(r"[^a-zA-Z]+$", "", t)
    return t.upper()


@lru_cache(maxsize=65536)
def ocr_norm_preserve_punct_upper(text: str) -> str:
    """F7: like F1 but without the alpha edge-trim."""
    t = nfkd_strip_controls(text)
    return t.replace("/", "").replace(" ", "").replace("-", "").upper()


def clean_label_sequence(words: list[str]) -> str:
    """F2: concat of F1-normalized words, re-NFKD'd, spaces dropped."""
    joined = "".join(normalize_text(w) for w in words)
    return nfkd_strip_controls(joined).replace(" ", "")


def letters_only_upper(text: str) -> str:
    """F8."""
    return re.sub(r"[^A-Za-z]", "", nfkd_strip_controls(text)).upper()


@lru_cache(maxsize=4096)
def expected_masked(text: str) -> tuple[str, frozenset[int]]:
    """F3: normalized expected string + positions of uppercase 'I'."""
    t = nfkd_strip_controls(text)
    t = t.replace("/", "").replace(" ", "").replace("-", "").upper()
    return t, frozenset(i for i, ch in enumerate(t) if ch == "I")


@lru_cache(maxsize=4096)
def flex_regex(expected: str, anchor: str = "both") -> str:
    """Compile the expected string to an IL1-flex regex (F4-F6).

    Applied to an UPPERCASED candidate: 'I' positions → [IL1], other
    chars → literal. anchor: 'both' = F4 equality, 'none' = F5
    contains, 'start' = F6 startswith.
    """
    exp, _ = expected_masked(expected)
    body = "".join("[IL1]" if ch == "I" else re.escape(ch) for ch in exp)
    if anchor == "both":
        return f"^{body}$"
    if anchor == "start":
        return f"^{body}"
    return body


@lru_cache(maxsize=262144)
def flex_equal(expected: str, candidate: str) -> bool:
    """F4 on a raw (pre-normalized) candidate string."""
    exp, mask = expected_masked(expected)
    if len(exp) != len(candidate):
        return False
    for i, (e, c) in enumerate(zip(exp, candidate)):
        if i in mask and e == "I":
            if c not in ("I", "L", "l", "1"):
                return False
        elif e != c.upper():
            return False
    return True


@lru_cache(maxsize=262144)
def flex_contains(expected: str, haystack: str) -> bool:
    """F5: any substring of haystack flex-equals expected."""
    exp, _ = expected_masked(expected)
    m = len(exp)
    if m == 0:
        return True
    return any(flex_equal(expected, haystack[i : i + m]) for i in range(len(haystack) - m + 1))


@lru_cache(maxsize=262144)
def flex_startswith(expected: str, haystack: str) -> bool:
    """F6: prefix flex-equality."""
    exp, _ = expected_masked(expected)
    m = len(exp)
    if m == 0:
        return True
    return len(haystack) >= m and flex_equal(expected, haystack[:m])


# ---------------------------------------------------------------------------
# Spark expression builders (JVM-side fast path for the relational forms)
# ---------------------------------------------------------------------------


def spark_normalize_expr(col_name: str):
    """Approximate F1 as a pure Catalyst expression (no UDF): assumes
    ASCII input (true for the synthetic fixtures; real OCR output with
    non-ASCII goes through the pandas-UDF NFKD path)."""
    from pyspark.sql import functions as F

    c = F.regexp_replace(F.col(col_name), r"[/\s\-]", "")
    c = F.regexp_replace(c, r"^[^a-zA-Z]+", "")
    c = F.regexp_replace(c, r"[^a-zA-Z]+$", "")
    return F.upper(c)


def spark_flex_match_expr(col_name: str, expected: str, anchor: str = "both"):
    """F4/F5/F6 as an ``rlike`` over the uppercased candidate column."""
    from pyspark.sql import functions as F

    return F.upper(F.col(col_name)).rlike(flex_regex(expected, anchor))


def detect_schema_variant(page1_text: str) -> str:
    """F15 — gender keyword detect on first-page text (reference
    /root/reference/extractor.py:1216-1232): earliest keyword wins;
    note "male patient information" is a substring of the female
    phrase, so both-hit resolution by index is load-bearing; default
    female."""
    norm = page1_text.lower()
    female_hit = "female patient information" in norm
    male_hit = "male patient information" in norm
    if female_hit and not male_hit:
        return "female"
    if male_hit and not female_hit:
        return "male"
    if female_hit and male_hit:
        f_idx = norm.find("female patient information")
        m_idx = norm.find("male patient information")
        return "female" if f_idx < m_idx else "male"
    return "female"
