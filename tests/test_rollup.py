"""Multi-resolution rollup: every level of the ladder must equal a
direct aggregation of the raw rows at that width (the continuous-
aggregate maintenance invariant), and the width-nesting precondition
must be enforced loudly."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.rollup import rollup_time_buckets

WIDTHS = [10, 100, 1000]


@pytest.fixture(scope="module")
def raw(spark):
    # deterministic skewed synthetic: 3 keys, values with 2 decimals,
    # timestamps spanning several coarse buckets with gaps
    rows = [
        (((i * 7919) % 4003) * 3 + (i % 7), f"k{i % 3}", ((i * 37) % 997) / 100.0)
        for i in range(500)
    ]
    return spark.createDataFrame(rows, "us long, key string, value double")


def _direct(raw, w):
    return (
        raw.withColumn("bucket_us", F.expr(f"(us div {w}) * {w}"))
        .groupBy("bucket_us", "key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def test_each_level_equals_direct_aggregation(raw):
    out = rollup_time_buckets(raw, "us", ["key"], "value", WIDTHS)
    for w in WIDTHS:
        got = sorted(
            out.filter(F.col("level_us") == w)
            .select("bucket_us", "key", "n", "sum_value", "min_value", "max_value")
            .collect()
        )
        want = sorted(_direct(raw, w).collect())
        assert got == want, f"level {w} diverges from direct aggregation"


def test_level_schema_uniform(raw):
    out = rollup_time_buckets(raw, "us", ["key"], "value", WIDTHS)
    fields = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert fields["level_us"] == "bigint"
    assert fields["sum_value"] == "double"
    assert fields["n"] == "bigint"


def test_row_count_is_sum_of_levels(raw):
    out = rollup_time_buckets(raw, "us", ["key"], "value", WIDTHS)
    per_level = {
        r["level_us"]: r["c"]
        for r in out.groupBy("level_us").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert set(per_level) == set(WIDTHS)
    # coarser levels strictly collapse buckets on this spread-out input
    assert per_level[10] > per_level[100] > per_level[1000]


@pytest.mark.parametrize("widths", [[], [100, 150], [100, 100], [100, 50]])
def test_bad_widths_raise(raw, widths):
    with pytest.raises(ValueError):
        rollup_time_buckets(raw, "us", ["key"], "value", widths)


def test_incremental_refresh_equals_full_recompute(raw):
    from pdf_parser_spark.operators.rollup import refresh_rollup

    old = raw.filter(F.col("us") % 5 != 0)
    delta = raw.filter(F.col("us") % 5 == 0)
    assert delta.count() > 0 and old.count() > 0
    base = rollup_time_buckets(old, "us", ["key"], "value", WIDTHS, exact_sums=True)
    merged = refresh_rollup(base, delta, "us", ["key"], "value", WIDTHS)
    full = rollup_time_buckets(raw, "us", ["key"], "value", WIDTHS, exact_sums=True)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_refresh_twice_is_associative(raw):
    from pdf_parser_spark.operators.rollup import refresh_rollup

    a = raw.filter(F.col("us") % 3 == 0)
    b = raw.filter(F.col("us") % 3 == 1)
    c = raw.filter(F.col("us") % 3 == 2)
    ladder = rollup_time_buckets(a, "us", ["key"], "value", WIDTHS, exact_sums=True)
    ladder = refresh_rollup(ladder, b, "us", ["key"], "value", WIDTHS)
    ladder = refresh_rollup(ladder, c, "us", ["key"], "value", WIDTHS)
    full = rollup_time_buckets(raw, "us", ["key"], "value", WIDTHS, exact_sums=True)
    assert sorted(map(tuple, ladder.collect())) == sorted(map(tuple, full.collect()))
