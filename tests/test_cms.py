"""Count-min sketch: never underestimates, exact for heavy hitters at
low load, merge-by-addition law, partitioning invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.sketches import cms_build, cms_query


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish: token t{i} appears (200 // (i+1)) times
    rows = [(f"t{i}",) for i in range(40) for _ in range(200 // (i + 1))]
    return spark.createDataFrame(rows, "v string")


def true_counts(stream):
    return {
        r["v"]: r["c"]
        for r in stream.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_never_underestimates(stream, spark):
    cms = cms_build(stream, "v", depth=4, width=64)
    items = stream.select("v").distinct()
    est = {r["v"]: r["est_cnt"] for r in cms_query(cms, items, "v", 4, 64).collect()}
    want = true_counts(stream)
    for v, c in want.items():
        assert est[v] >= c, (v, est[v], c)


def test_exact_at_low_load(stream):
    # width >> distinct values: collisions are unlikely enough that the
    # heavy hitters come back exact
    cms = cms_build(stream, "v", depth=4, width=4096)
    items = stream.select("v").distinct()
    est = {r["v"]: r["est_cnt"] for r in cms_query(cms, items, "v", 4, 4096).collect()}
    want = true_counts(stream)
    assert est == want


def test_merge_by_addition(stream, spark):
    h = F.pmod(F.xxhash64("v"), F.lit(2))
    a = cms_build(stream.filter(h == 0), "v", 4, 64)
    b = cms_build(stream.filter(h == 1), "v", 4, 64)
    merged = (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_build(stream, "v", 4, 64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_kmv_setops_accuracy(spark):
    """Union/intersection estimates vs exact set algebra on overlapping
    vocabularies: 300-distinct A, 300-distinct B, 150 shared."""
    from pdf_parser_spark.operators.sketches import kmv_set_ops

    a = spark.createDataFrame([(f"w{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"w{i}",) for i in range(150, 450)], "v string")
    r = kmv_set_ops(a, b, "v", k=64).collect()[0]
    assert abs(r["est_a"] - 300) / 300 < 0.35
    assert abs(r["est_union"] - 450) / 450 < 0.35
    # true J = 150/450 = 1/3; KMV Jaccard has ~1/sqrt(k) noise
    assert 0.1 < r["jaccard_est"] < 0.6
    assert 40 < r["est_intersection"] < 300


def test_kmv_setops_small_sets_exact(spark):
    """Below k distinct values the sketches ARE the sets: every
    estimate must be exact."""
    from pdf_parser_spark.operators.sketches import kmv_set_ops

    a = spark.createDataFrame([(f"w{i}",) for i in [0, 1, 2, 3]], "v string")
    b = spark.createDataFrame([(f"w{i}",) for i in [2, 3, 4]], "v string")
    r = kmv_set_ops(a, b, "v", k=64).collect()[0]
    assert (r["est_a"], r["est_b"], r["est_union"]) == (4.0, 3.0, 5.0)
    assert r["jaccard_est"] == 0.4
    assert r["est_intersection"] == 2.0


def test_absent_item_and_validation(stream, spark):
    cms = cms_build(stream, "v", 4, 4096)
    ghost = spark.createDataFrame([("never-seen-token",)], "v string")
    est = cms_query(cms, ghost, "v", 4, 4096).collect()[0]["est_cnt"]
    assert est >= 0  # may collide, never negative
    with pytest.raises(ValueError):
        cms_build(stream, "v", depth=0)
