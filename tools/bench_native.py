"""Paged+NATIVE-decoder throughput measurement (round-2 VERDICT task 8).

BENCH previously had only synthetic-decoder numbers; the mode="auto"
fused/paged crossover claim (paged wins when per-page decode cost
dominates) was backed by a synthetic paged run alone. This measures
decoder="native" — the REAL kernel path: per-page preprocess chain
(sharpen/contrast/CLAHE/unsharp) + FFT TM_CCOEFF_NORMED template
matching on rendered 900×1100 page images — through both physical
modes, using the .npy native-simulator corpus (fixtures/native_sim.py;
the OCR binding is the deterministic pixel-key simulator, so the only
fake step is character recognition itself — decode, preprocess, and
match are the shipped kernels).

Writes BENCH/native.json (referenced BY PATH from the bench JSON
line — round-3 VERDICT: embedding the payload broke the driver's
tail-capture contract) and prints one JSON line.

Usage: python tools/bench_native.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_skewed(spark, NS, fix_dir: str, n_small: int, heavy_pages: int):
    """documents DataFrame: n_small 2-page docs + ONE heavy_pages-page
    doc (distinct .npy per page so the per-path raster cache can't
    collapse the decode work). Rendered content cycles the simulator's
    two page layouts; only timing matters here — parity is pytest's."""
    import numpy as np
    import pandas as pd

    skew_dir = os.path.join(fix_dir, "skew")
    os.makedirs(skew_dir, exist_ok=True)
    rows = []
    for idx in range(n_small):
        spans = [{"kind": "text", "text": f"s{idx}", "media_ref": "", "offset": 0}]
        for page_no in (1, 2):
            path = os.path.join(skew_dir, f"s{idx}_p{page_no}.npy")
            np.save(path, NS.render_page(idx, page_no))
            spans.append({"kind": "pdf_page", "text": "",
                          "media_ref": path, "offset": page_no})
        rows.append({"doc_id": f"skew_s{idx:04d}", "spans": spans})
    spans = [{"kind": "text", "text": "heavy", "media_ref": "", "offset": 0}]
    for p in range(1, heavy_pages + 1):
        path = os.path.join(skew_dir, f"heavy_p{p}.npy")
        np.save(path, NS.render_page(1000 + p, 1 + (p % 2)))
        spans.append({"kind": "pdf_page", "text": "", "media_ref": path,
                      "offset": p})
    rows.append({"doc_id": "skew_heavy", "spans": spans})
    path = os.path.join(skew_dir, "documents.parquet")
    pd.DataFrame(rows).to_parquet(path, index=False)
    return spark.read.parquet(path)


def main() -> dict:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    from pdf_parser_spark.fixtures import native_sim as NS
    from pdf_parser_spark.plans.extract import extract_spans
    from pdf_parser_spark.session import get_spark
    from pdf_parser_spark.sources import perception as P

    fix_dir = tempfile.mkdtemp(prefix="bench_native_")
    try:
        docs_path = NS.build_native_fixture(fix_dir, n_docs)
        spark = get_spark(
            "bench_native", master=f"local[{cpus}]", shuffle_partitions=cpus
        )
        P.configure_native(
            ocr="pdf_parser_spark.fixtures.native_sim:sim_ocr",
            yesno_ocr="pdf_parser_spark.fixtures.native_sim:sim_yesno",
        )
        docs = spark.read.parquet(docs_path)
        expected_rows = None
        result: dict = {
            "metric": "documents/sec, decoder=native (real preprocess+match kernels, sim OCR)",
            "n_docs": n_docs,
            "pages_per_doc": 2,
            "cpus": cpus,
            "timing_method": "best_of_2",
            "modes": {},
        }
        for mode in ("paged", "fused"):
            best = None
            for _ in range(2):
                t0 = time.time()
                out = extract_spans(docs, sections=NS.SIM_SECTIONS,
                                    decoder="native", mode=mode)
                n = out.count()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
                if expected_rows is None:
                    expected_rows = n
                assert n == expected_rows, f"row drift in {mode}: {n} != {expected_rows}"
            result["modes"][mode] = {
                "sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 2),
                "pages_per_sec": round(2 * n_docs / best, 2),
            }
        result["span_rows"] = expected_rows

        # Skewed corpus: one multi-page straggler among 2-page docs —
        # the regime the paged plan exists for. Under fused, the heavy
        # doc serializes one task; paged fans its pages across cores
        # before the single doc_id assembly shuffle.
        heavy_pages = 48
        skew_docs = _build_skewed(spark, NS, fix_dir, n_small=16,
                                  heavy_pages=heavy_pages)
        result["skew"] = {"n_small_docs": 16, "heavy_pages": heavy_pages,
                          "modes": {}}
        skew_rows = None
        for mode in ("paged", "fused"):
            best = None
            for _ in range(2):
                t0 = time.time()
                n = extract_spans(skew_docs, sections=NS.SIM_SECTIONS,
                                  decoder="native", mode=mode).count()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
                if skew_rows is None:
                    skew_rows = n
                assert n == skew_rows, f"row drift in skew {mode}"
            result["skew"]["modes"][mode] = {
                "sec": round(best, 3),
                "pages_per_sec": round((16 * 2 + heavy_pages) / best, 2),
            }
        spark.stop()
    finally:
        shutil.rmtree(fix_dir, ignore_errors=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH", "native.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    print(json.dumps(main()))
