"""Absolute-correctness pins for the sketch family: a pure-Python HLL
replica (the driver gate only proves Spark ≡ DuckDB — both shared a
deliberately-wrong estimator constant during development and still
matched), plus Hypothesis sweeps for quantiles and shard packing."""

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_parser_spark.operators.quantiles import exact_group_quantiles
from pdf_parser_spark.operators.sketches import hll_distinct
from pdf_parser_spark.operators.textstats import shard_pack


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hll_reference(values, p=8):
    """Independent pure-Python HLL over the same md5-derived hashes:
    registers, integer harmonic sum, raw + linear-counting branches."""
    m = 1 << p
    max_rank = (60 - p) + 1
    regs = [0] * m
    for v in set(values):
        h = _md5_long(v)
        bucket, w = h % m, h // m
        rank = max_rank if w == 0 else max_rank - w.bit_length()
        regs[bucket] = max(regs[bucket], rank)
    s = sum(1 << (max_rank - r) for r in regs)
    v_empty = sum(1 for r in regs if r == 0)
    alpha = 0.7213 / (1 + 1.079 / m)
    c = alpha * m * m * float(1 << max_rank)
    e_raw = c / s
    if v_empty > 0 and e_raw <= 2.5 * m:
        est = float(m) * math.log(float(m) / v_empty)
    else:
        est = e_raw
    return round(est, 2), s, v_empty


@pytest.mark.parametrize("n_distinct", [5, 60, 700, 4000])
def test_hll_matches_python_reference(spark, n_distinct):
    values = [f"v{i}" for i in range(n_distinct)]
    df = spark.createDataFrame([("g", v) for v in values], "g string, v string")
    row = hll_distinct(df, "g", "v", p=8).collect()[0]
    est, s, v_empty = hll_reference(values)
    assert (row["distinct_est"], row["register_sum"], row["empty_registers"]) == (
        est,
        s,
        v_empty,
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
    st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=4, unique=True),
)
def test_quantiles_property(spark, xs, qs):
    df = spark.createDataFrame([("g", float(x)) for x in xs], "g string, v double")
    got = {
        r["q"]: r["value"] for r in exact_group_quantiles(df, ["g"], "v", qs).collect()
    }
    s = sorted(xs)
    for q in qs:
        assert got[q] == float(s[math.ceil(q * len(s) / 100) - 1])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=80),
    st.integers(min_value=100, max_value=2000),
)
def test_shard_pack_property(spark, weights, budget):
    """Replicate the bucketed exclusive-prefix-sum packing in Python
    over the same md5 bucket assignment."""
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["bucket"], r["shard_id"])
        for r in shard_pack(df, "doc_id", "w", budget=budget, n_buckets=4).collect()
    }
    buckets: dict[int, list] = {}
    for i, w in rows:
        b = _md5_long(f"pack:{i}") % 4
        buckets.setdefault(b, []).append((i, w))
    for b, docs in buckets.items():
        prefix = 0
        for i, w in sorted(docs):
            assert got[i] == (b, prefix // budget), (i, got[i], b, prefix)
            prefix += w
