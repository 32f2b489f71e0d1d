"""PII masking + shard packing: semantics beyond the driver gate —
multi-occurrence masking, count correctness, packing invariants
(contiguity, overshoot bound, determinism under repartitioning)."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.textstats import pii_mask, shard_pack


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "mail a@b.com and c.d+x@e-f.org end"),
        (2, "call +1-555-867-5309 or 44 20 7946 0958 now"),
        (3, "host 192.168.0.1 and 10.0.255.7"),
        (4, "clean text with no pii at all"),
        (5, "mix a@b.co 1.2.3.4 +1-555-123-4567"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_mask_counts_and_replacement(pii_df):
    out = {r["doc_id"]: r for r in pii_mask(pii_df, "doc_id", "text").collect()}
    assert out[1]["n_email"] == 2
    assert out[1]["masked_text"] == "mail <EMAIL> and <EMAIL> end"
    assert out[2]["n_phone"] >= 1
    assert "5309" not in out[2]["masked_text"]
    assert out[3]["n_ip"] == 2
    assert out[3]["masked_text"] == "host <IP> and <IP>"
    assert out[4]["masked_text"] == "clean text with no pii at all"
    assert (out[4]["n_email"], out[4]["n_ip"], out[4]["n_phone"]) == (0, 0, 0)
    # chain order: the email is consumed before numeric patterns run,
    # and the dotted quad is consumed before the phone pattern sees it
    assert out[5]["masked_text"] == "mix <EMAIL> <IP> <PHONE>"
    assert out[6]["masked_text"] == ""


@pytest.fixture(scope="module")
def pack_df(spark):
    rows = [(i, 50 + (i * 37) % 400) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_shard_pack_invariants(pack_df):
    budget = 700
    out = shard_pack(pack_df, "doc_id", "w", budget=budget, n_buckets=4)
    rows = out.orderBy("bucket", "doc_id").collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) <= set(range(4))
    for bucket_rows in by_bucket.values():
        max_w = max(r["weight"] for r in bucket_rows)
        # shard ids are nondecreasing in id order and contiguous from 0
        sids = [r["shard_id"] for r in bucket_rows]
        assert sids[0] == 0
        assert all(a <= b for a, b in zip(sids, sids[1:]))
        assert set(sids) == set(range(max(sids) + 1))
        # start-offset packing: every shard except possibly the last
        # reaches at least the budget boundary, and overshoots it by
        # less than one document
        totals: dict[int, int] = {}
        for r in bucket_rows:
            totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["weight"]
        for sid in range(max(sids)):
            assert totals[sid] + max_w > budget
            assert totals[sid] < budget + max_w


def test_shard_pack_stable_under_repartition(pack_df):
    a = shard_pack(pack_df, "doc_id", "w", budget=700, n_buckets=4)
    b = shard_pack(
        pack_df.repartition(7, "w"), "doc_id", "w", budget=700, n_buckets=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_shard_pack_bad_budget(pack_df):
    with pytest.raises(ValueError):
        shard_pack(pack_df, "doc_id", "w", budget=0)
