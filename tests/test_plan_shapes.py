"""Plan-shape regression pins for the round-4 operators: the physical
properties PLANS.md claims (exchange counts, broadcast/replication
shapes) are asserted against the executed plan, so a refactor that
silently adds a shuffle fails a test, not a bench round later."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(30))) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shard_pack_single_exchange(docs):
    from pdf_parser_spark.operators.textstats import shard_pack, token_count

    d = docs.select("doc_id", token_count("text").alias("w"))
    plan = _plan(shard_pack(d, "doc_id", "w", budget=500, n_buckets=4))
    assert plan.count("Exchange") == 1, plan


def test_rollup_one_scan_two_exchanges(spark):
    from pdf_parser_spark.operators.rollup import rollup_time_buckets

    raw = spark.createDataFrame(
        [(i * 7, "k", float(i)) for i in range(100)], "us long, key string, value double"
    )
    # single-pass ladder: raw scanned once, shuffled once (finest agg),
    # then ONE explode+re-aggregation produces every level — 2
    # exchanges regardless of ladder depth. (The chained-groupBy form
    # lazily recomputed the whole chain per union branch: 3 raw scans
    # and 6 exchanges for this 3-level ladder — caught by this test.)
    plan = _plan(rollup_time_buckets(raw, "us", ["key"], "value", [10, 100, 1000]))
    assert plan.count("Exchange") == 2, plan
    assert plan.count("Scan ExistingRDD") == 1, plan


def test_pii_mask_zero_exchange(docs):
    from pdf_parser_spark.operators.textstats import pii_mask

    plan = _plan(pii_mask(docs, "doc_id", "text"))
    assert "Exchange" not in plan, plan


def test_salted_join_replicates_right(spark):
    from pdf_parser_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, i) for i in range(50)], "k long, rid long")
    right = spark.createDataFrame([(1, "a")], "k long, tag string")
    out = salted_join(left, right, "k", n_salts=4, salt_src="rid")
    plan = _plan(out)
    # the salt explode is the replication mechanism; result stays exact
    assert "Generate explode" in plan, plan
    assert out.count() == 50
