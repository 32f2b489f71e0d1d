"""Passage-level dedup: shared aligned blocks are found, unrelated
docs aren't paired, boilerplate fingerprints are dropped structurally,
and short docs produce no fingerprints."""

import pytest

from pdf_parser_spark.operators.dedup import passage_dup_pairs, passage_fingerprints


def words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


@pytest.fixture(scope="module")
def df(spark):
    shared = words("s", 30)
    boiler = words("b", 20)
    rows = [
        (1, shared + " " + words("a", 15)),          # shares block with 2
        (2, shared + " " + words("c", 15)),
        (3, words("d", 40)),                          # unrelated
        (4, "tiny doc under twenty tokens"),          # too short
    ]
    # 60 docs that all open with the same boilerplate 20-gram
    rows += [(100 + i, boiler + " " + words(f"x{i}_", 25)) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_block_found_unrelated_not(df):
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in passage_dup_pairs(df, "doc_id", "text", width=20, stride=10).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] >= 2  # windows at offsets 1 and 11 both inside the block
    assert not any(3 in p or 4 in p for p in pairs)


def test_boilerplate_fp_dropped(df):
    # the opening 20-gram appears in 60 docs > max_fp_docs=50: without
    # the structural bound it would emit C(60,2)=1770 pairs
    pairs = passage_dup_pairs(
        df, "doc_id", "text", width=20, stride=10, max_fp_docs=50
    ).collect()
    assert not any(r["id_a"] >= 100 and r["id_b"] >= 100 for r in pairs)
    # raising the bound reinstates them — the guard, not the join, filtered
    loose = passage_dup_pairs(
        df, "doc_id", "text", width=20, stride=10, max_fp_docs=100
    )
    assert loose.filter("id_a >= 100 AND id_b >= 100").count() == 60 * 59 // 2


def test_short_docs_yield_no_fingerprints(df):
    fp = passage_fingerprints(df, "doc_id", "text", width=20, stride=10)
    assert fp.filter("doc_id = 4").count() == 0
