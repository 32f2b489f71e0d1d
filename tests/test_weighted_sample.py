"""A-ES weighted sampling: proportional inclusion across independent
salts, determinism under repartitioning, heavy-weight dominance, and
the exact-k / filter semantics."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.textstats import weighted_sample


@pytest.fixture(scope="module")
def df(spark):
    # one heavy doc (weight 2000) among 99 light ones (weight 10 each):
    # P(heavy in a k=10 sample) is essentially 1
    rows = [(0, 2000)] + [(i, 10) for i in range(1, 100)]
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_heavy_weight_dominates(df):
    hits = 0
    for salt in range(12):
        got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10, salt=f"s{salt}").collect()}
        assert len(got) == 10
        hits += 0 in got
    assert hits >= 11  # P(miss) ~ (1 - 2000/2990)^10 per draw-ish; ~0


def test_proportional_inclusion(spark):
    """Two weight classes 3:1 — inclusion frequency ratio across many
    salts should be roughly 3:1 (loose band; it's a statistical law,
    not an exact identity)."""
    rows = [(i, 30 if i < 50 else 10) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    heavy = light = 0
    for salt in range(20):
        got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 30, salt=f"p{salt}").collect()}
        heavy += sum(1 for i in got if i < 50)
        light += sum(1 for i in got if i >= 50)
    ratio = (heavy / 50) / (light / 100)
    assert 1.8 < ratio < 5.0, (heavy, light, ratio)


def test_deterministic_under_repartition(df):
    a = weighted_sample(df, "doc_id", "w", 10).collect()
    b = weighted_sample(df.repartition(7, "w"), "doc_id", "w", 10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_nonpositive_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, 5)], "doc_id long, w long"
    )
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    assert got == {1, 4}


def test_k_validation(df):
    with pytest.raises(ValueError):
        weighted_sample(df, "doc_id", "w", 0)
