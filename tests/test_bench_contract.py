"""bench.py delivery-contract tests (no Spark session needed).

Round-3 VERDICT finding #1: BENCH_r03.json recorded ``"parsed": null``
because the final JSON line outgrew the driver's tail capture. bench.py
now emits one compact line and self-verifies it — but the *next* run
must also survive reading that broken record for its round-over-round
deltas instead of crashing on ``None.get``.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def test_deltas_survive_parsed_null_record():
    """The real BENCH_r03.json in the repo has parsed:null; deltas must
    recover the prior queries from the raw tail, not crash."""
    out = bench._deltas_vs_prev({"x1_extract_spans": 3.516}, {})
    assert out, "deltas should not be empty — the tail is recoverable"
    # recovered from the r3 tail: x1 was 3.516 s, so delta is ~0
    assert abs(out["delta_pct_vs_prev"]["x1_extract_spans"]) < 0.1
    assert out["prev_cfg"] == {"sf": 0.1, "cpus": 32, "timing_method": "best_of_2"}
    assert out["regressions"] == []


def test_recover_from_tail_roundtrip():
    rec = json.dumps(
        {
            "metric": "m",
            "queries": {"a": 1.5, "b": 0.25},
            "sf": 0.01,
            "cpus": 8,
            "timing_method": "best_of_2",
        }
    )
    # simulate the driver's tail truncation chopping the line's head
    got = bench._recover_from_tail(rec[10:])
    assert got == {
        "queries": {"a": 1.5, "b": 0.25},
        "sf": 0.01,
        "cpus": 8,
        "timing_method": "best_of_2",
    }


def test_recover_from_tail_garbage():
    assert bench._recover_from_tail("") is None
    assert bench._recover_from_tail('"queries": {not json}') is None
