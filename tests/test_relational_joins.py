"""Edge-case tests for asof_join, bucketed_range_join, decontaminate
and top_tokens — the boundary semantics the sf0.01 oracle gate can't
isolate (exact-tie matching, band boundaries, short docs, token ties).
"""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.dedup import decontaminate
from pdf_parser_spark.operators.joins import asof_join, bucketed_range_join
from pdf_parser_spark.operators.textstats import top_tokens


def _asof(spark, allow_exact):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 200, "p2"), (2, 50, "p3")],
        "user bigint, ts bigint, name string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10, 1.0), (1, 150, 11, 2.0), (1, 150, 12, 3.0), (3, 10, 13, 4.0)],
        "user bigint, rts bigint, rid bigint, rv double",
    )
    out = asof_join(
        left, right, ["user"], "ts", "rts",
        payload=["rid", "rv"], tie_col="rid",
        allow_exact_matches=allow_exact,
    )
    return {r["name"]: (r["rid_r"], r["rv_r"]) for r in out.collect()}


def test_asof_backward_non_strict(spark):
    got = _asof(spark, allow_exact=True)
    # p1 at ts=100 matches the equal-ts right row (non-strict)
    assert got["p1"] == (10, 1.0)
    # p2 at ts=200: most recent is ts=150; tie between rid 11/12 breaks
    # toward the LARGER rid
    assert got["p2"] == (12, 3.0)
    # p3: user 2 has no right rows -> NULL payload (left semantics)
    assert got["p3"] == (None, None)


def test_asof_backward_strict(spark):
    got = _asof(spark, allow_exact=False)
    # strict: the equal-ts right row no longer matches and user 1 has
    # nothing earlier than ts=100
    assert got["p1"] == (None, None)
    assert got["p2"] == (12, 3.0)


def test_asof_row_count_preserved(spark):
    left = spark.createDataFrame(
        [(1, i, f"n{i}") for i in range(50)], "user bigint, ts bigint, name string"
    )
    right = spark.createDataFrame(
        [(1, i * 2, i, float(i)) for i in range(40)],
        "user bigint, rts bigint, rid bigint, rv double",
    )
    out = asof_join(left, right, ["user"], "ts", "rts", payload=["rid"], tie_col="rid")
    assert out.count() == 50  # never explodes or drops left rows


def test_range_join_boundaries(spark):
    left = spark.createDataFrame([(1, 1000, "a")], "k bigint, ts bigint, lid string")
    right = spark.createDataFrame(
        [(1, 900, "in_lo"), (1, 1100, "in_hi"), (1, 899, "out_lo"),
         (1, 1101, "out_hi"), (2, 1000, "other_key")],
        "k bigint, rts bigint, rid string",
    )
    out = bucketed_range_join(left, right, ["k"], "ts", "rts", 100)
    got = sorted(r["rid"] for r in out.collect())
    # |dt| == radius is INCLUDED; wrong key and out-of-band excluded
    assert got == ["in_hi", "in_lo"]


def test_range_join_each_pair_once(spark):
    # right rows landing in each of the left row's three candidate
    # buckets — every qualifying pair must appear exactly once
    left = spark.createDataFrame([(1, 100, "L")], "k bigint, ts bigint, lid string")
    right = spark.createDataFrame(
        [(1, t, f"r{t}") for t in (0, 50, 100, 150, 199)],
        "k bigint, rts bigint, rid string",
    )
    out = bucketed_range_join(left, right, ["k"], "ts", "rts", 100).collect()
    rids = [r["rid"] for r in out]
    assert sorted(rids) == sorted(set(rids))  # no duplicate pairs
    assert sorted(rids) == ["r0", "r100", "r150", "r199", "r50"]


def test_range_join_rejects_bad_radius(spark):
    df = spark.createDataFrame([(1, 1)], "k bigint, ts bigint")
    with pytest.raises(ValueError, match="radius"):
        bucketed_range_join(df, df.withColumnRenamed("ts", "rts"), ["k"], "ts", "rts", 0)


def test_decontaminate_counts_and_short_docs(spark):
    bench = spark.createDataFrame(
        [(100, "a b c d e f")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),     # identical: all three 4-grams shared
            (2, "x a b c d y"),     # one shared 4-gram ("a b c d")
            (3, "u v w x y z"),     # disjoint
            (4, "a b c"),           # shorter than n=4: zero grams
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate(corpus, bench, "doc_id", "text", n=4).collect()
    }
    assert got == {1: 3, 2: 1}


def test_top_tokens_ties_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "b a  a b"), (2, "c b a")], "doc_id bigint, text string"
    )
    rows = top_tokens(df, "text", k=3).orderBy("rk").collect()
    # a and b both occur 3x -> tie breaks toward the smaller token; the
    # double space yields an empty token that must be filtered
    assert [(r["token"], r["cnt"], r["rk"]) for r in rows] == [
        ("a", 3, 1), ("b", 3, 2), ("c", 1, 3)
    ]
