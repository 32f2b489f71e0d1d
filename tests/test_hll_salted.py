"""HLL sketch: accuracy on both estimator branches, partitioning
invariance. Salted join: result-set equality with the plain join under
duplicates and non-matching keys."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.joins import salted_join
from pdf_parser_spark.operators.sketches import hll_distinct


@pytest.fixture(scope="module")
def card_df(spark):
    # group 'small' -> 60 distinct (linear-counting branch, many empty
    # registers); group 'large' -> 5000 distinct (raw HLL branch)
    rows = [("small", f"s{i % 60}") for i in range(300)]
    rows += [("large", f"L{i}") for i in range(5000)]
    return spark.createDataFrame(rows, "g string, v string")


def test_hll_accuracy_both_branches(card_df):
    out = {r["g"]: r for r in hll_distinct(card_df, "g", "v", p=8).collect()}
    # ~6.5% relative stddev at m=256; assert a generous 3-sigma band
    assert abs(out["small"]["distinct_est"] - 60) / 60 < 0.2
    assert abs(out["large"]["distinct_est"] - 5000) / 5000 < 0.2
    assert out["small"]["empty_registers"] > 0
    assert out["large"]["empty_registers"] == 0 or out["large"]["empty_registers"] < 30


def test_hll_partitioning_invariant(card_df):
    a = hll_distinct(card_df, "g", "v", p=8).collect()
    b = hll_distinct(card_df.repartition(13, "v"), "g", "v", p=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_duplicates_dont_move_estimate(card_df, spark):
    doubled = card_df.unionByName(card_df)
    a = hll_distinct(card_df, "g", "v", p=8).collect()
    b = hll_distinct(doubled, "g", "v", p=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_p_validation(card_df):
    with pytest.raises(ValueError):
        hll_distinct(card_df, "g", "v", p=3)


def test_hll_shard_merge_equals_single_pass(card_df):
    """The 100-TB deployment shape: per-shard register tables, unioned
    with register-wise max, estimated once — must equal the one-pass
    sketch EXACTLY (same registers → same integers → same estimate)."""
    from pdf_parser_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    h = F.pmod(F.xxhash64("v"), F.lit(3))
    shard1 = card_df.filter(h == 0)
    shard2 = card_df.filter(h == 1)
    shard3 = card_df.filter(h == 2)
    merged = hll_merge(
        *[hll_registers(s, "g", "v", p=8) for s in (shard1, shard2, shard3)]
    )
    a = hll_estimate(merged, "g", p=8).collect()
    b = hll_distinct(card_df, "g", "v", p=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.fixture(scope="module")
def join_sides(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ([1] * 3 + [2])][:500],
        "k long, rid long",
    )
    right = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "never")], "k long, tag string"
    )
    return left, right


def test_salted_join_equals_plain_join(join_sides):
    left, right = join_sides
    salted = salted_join(left, right, "k", n_salts=4, salt_src="rid")
    plain = left.join(right, "k", "inner")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_validation(join_sides):
    left, right = join_sides
    with pytest.raises(ValueError):
        salted_join(left, right, "k", n_salts=0, salt_src="rid")
