"""Deterministic hash-split properties (reproducible train/val/test)."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.textstats import hash_split

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ids(n):
    return [(f"doc_{i:05d}",) for i in range(n)]


def test_split_stable_and_growth_invariant(spark):
    small = spark.createDataFrame(_ids(300), ["doc_id"])
    big = spark.createDataFrame(_ids(900), ["doc_id"])
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", FR).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big.repartition(7), "doc_id", FR).collect()}
    # growing the corpus (and any repartitioning) never moves a doc
    assert all(b[d] == s for d, s in a.items())
    # proportions roughly honored
    from collections import Counter

    c = Counter(b.values())
    assert 0.7 < c["train"] / 900 < 0.9
    assert c["train"] + c["val"] + c["test"] == 900


def test_split_salt_changes_assignment(spark):
    df = spark.createDataFrame(_ids(400), ["doc_id"])
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", FR, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", FR, salt="s2").collect()}
    assert any(a[d] != b[d] for d in a)  # different salt, different partition


def test_split_fraction_validation(spark):
    df = spark.createDataFrame(_ids(5), ["doc_id"])
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", {"train": 0.8, "val": 0.1})
    # every row assigned (no NULL split even at the boundary bucket)
    out = hash_split(df, "doc_id", FR)
    assert out.filter(F.col("split").isNull()).count() == 0


def test_split_thirds_covers_every_bucket(spark):
    """Rounded boundaries for thirds undershoot the bucket space
    (3 x 333,333 = 999,999 of 1,000,000) — the last split must absorb
    the remainder so no document lands in NO split (review finding)."""
    df = spark.createDataFrame(_ids(3000), ["doc_id"])
    thirds = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    out = hash_split(df, "doc_id", thirds)
    assert out.filter(F.col("split").isNull()).count() == 0
    got = {r["split"] for r in out.select("split").distinct().collect()}
    assert got == {"a", "b", "c"}
    # oracle shares the no-gap property
    import duckdb

    from pdf_parser_spark.operators.textstats import hash_split_oracle_sql

    con = duckdb.connect(":memory:")
    con.execute("CREATE TABLE documents AS SELECT 'doc_' || i AS doc_id FROM range(3000) t(i)")
    nulls = con.execute(
        f"SELECT count(*) FROM ({hash_split_oracle_sql('documents', 'doc_id', thirds)}) WHERE split IS NULL"
    ).fetchone()[0]
    assert nulls == 0


def test_split_rejects_nonpositive_fractions(spark):
    df = spark.createDataFrame(_ids(5), ["doc_id"])
    with pytest.raises(ValueError, match="> 0"):
        hash_split(df, "doc_id", {"train": 1.5, "val": -0.5})
    with pytest.raises(ValueError, match="> 0"):
        hash_split(df, "doc_id", {"train": 1.0, "val": 0.0})
