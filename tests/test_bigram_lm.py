"""Bigram LM scoring vs a pure-Python brute force on a tiny corpus:
exact count/smoothing semantics, single-token-doc exclusion, and
partitioning invariance of the decimal-quantized average."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

from pdf_parser_spark.operators.textstats import bigram_lm_score

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat"),
    (2, "dog dog dog dog"),
    (3, "solo"),
    (4, "the mat"),
]


def brute_scores():
    toks = {i: t.split(" ") for i, t in DOCS}
    uni = Counter(w for ws in toks.values() for w in ws)
    v = len(uni)
    bg = Counter(
        (ws[i], ws[i + 1]) for ws in toks.values() for i in range(len(ws) - 1)
    )
    out = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        lps = []
        for a, b in zip(ws, ws[1:]):
            lp = math.log((bg[(a, b)] + 1) / (uni[a] + v))
            lps.append(Decimal(repr(lp)).quantize(Decimal("1e-9"), ROUND_HALF_UP))
        avg = float(sum(lps) / len(lps))
        out[i] = (round(avg, 4), len(lps))
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_bruteforce(df):
    got = {
        r["doc_id"]: (r["lm_score"], r["n_bigrams"])
        for r in bigram_lm_score(df, "doc_id", "text").collect()
    }
    want = brute_scores()
    assert set(got) == set(want)  # doc 3 (single token) excluded
    for i in want:
        assert got[i][1] == want[i][1]
        assert abs(got[i][0] - want[i][0]) <= 1e-4, (i, got[i], want[i])


def test_partitioning_invariant(df):
    a = bigram_lm_score(df, "doc_id", "text").collect()
    b = bigram_lm_score(df.repartition(5, "text"), "doc_id", "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
