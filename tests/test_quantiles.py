"""Exact order-statistic quantiles: definitional edge cases (q=100 =
max, single-element groups, ties), brute-force equivalence, validation,
and the one-Exchange plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.quantiles import exact_group_quantiles


@pytest.fixture(scope="module")
def df(spark):
    rows = []
    for g, n in [("a", 17), ("b", 1), ("c", 100)]:
        for i in range(n):
            rows.append((g, float((i * 31) % n)))
    rows += [("d", 5.0), ("d", 5.0), ("d", 5.0), ("d", 7.0)]  # ties
    return spark.createDataFrame(rows, "g string, v double")


def brute(values, q):
    s = sorted(values)
    return s[math.ceil(q * len(s) / 100) - 1]


def test_matches_bruteforce(df):
    qs = [1, 25, 50, 75, 90, 99, 100]
    got = {
        (r["g"], r["q"]): r["value"]
        for r in exact_group_quantiles(df, ["g"], "v", qs).collect()
    }
    data = {}
    for r in df.collect():
        data.setdefault(r["g"], []).append(r["v"])
    for g, values in data.items():
        for q in qs:
            assert got[(g, q)] == brute(values, q), (g, q)
    assert len(got) == len(data) * len(qs)


def test_single_element_group(df):
    out = exact_group_quantiles(df, ["g"], "v", [1, 50, 100])
    b = {r["q"]: r["value"] for r in out.filter(F.col("g") == "b").collect()}
    assert b == {1: 0.0, 50: 0.0, 100: 0.0}


def test_validation(df):
    for bad in ([], [0], [101], [50.5]):
        with pytest.raises(ValueError):
            exact_group_quantiles(df, ["g"], "v", bad)


def test_single_exchange_plan(df):
    plan = exact_group_quantiles(df, ["g"], "v", [25, 50])._jdf.queryExecution().executedPlan().toString()
    # row_number and count share the window partitioning: one Exchange
    assert plan.count("Exchange") == 1, plan
