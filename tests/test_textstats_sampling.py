"""Edge cases for repetition_profile and stratified_cap."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators.textstats import repetition_profile, stratified_cap


def test_repetition_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x"), (3, "u v w")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["top_token_ratio"], r["distinct_ratio"], r["top_bigram_ratio"])
        for r in repetition_profile(df, "doc_id", "text").collect()
    }
    # doc 1: 'a'x3 of 4 tokens; bigrams ['a a','a a','a b'] -> 2/3
    assert got[1] == (0.75, 0.5, 0.666667)
    # single word: no bigrams -> 0.0 by definition
    assert got[2] == (1.0, 1.0, 0.0)
    # all-distinct: max run 1
    assert got[3] == (0.333333, 1.0, 0.5)


def test_repetition_profile_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = (
        repetition_profile(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # row-local by construction


def test_stratified_cap_basics(spark):
    rows = [(s, s * 100 + i) for s in range(3) for i in range(20)]
    df = spark.createDataFrame(rows, "src bigint, doc_id bigint")
    out = stratified_cap(df, ["src"], "doc_id", 5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], set()).add(r["doc_id"])
    assert all(len(v) == 5 for v in by_src.values())
    # hash-ordered, not first-k by id
    assert by_src[0] != {0, 1, 2, 3, 4}


def test_stratified_cap_stable_under_other_strata_growth(spark):
    base = [(0, i) for i in range(20)]
    grown = base + [(1, 1000 + i) for i in range(50)]
    df_a = spark.createDataFrame(base, "src bigint, doc_id bigint")
    df_b = spark.createDataFrame(grown, "src bigint, doc_id bigint").repartition(7)
    keep = lambda df: {  # noqa: E731
        r["doc_id"]
        for r in stratified_cap(df, ["src"], "doc_id", 5)
        .filter(F.col("src") == 0)
        .collect()
    }
    # stratum-0 survivors are a pure function of (salt, id): adding a
    # new stratum and changing partitioning reassigns nothing
    assert keep(df_a) == keep(df_b)
