"""Native-binary deployment smoke test (round-3 VERDICT task 9).

The engine's pypdfium2 rasterize glue (sources/kernels.py:569-610,
mirroring /root/reference/extractor.py:960-976), tesseract OCR glue
(kernels.py:612-653, extractor.py:987-989), and PIL template loading
(kernels.py:656+) are import-gated because this sandbox has none of
those binaries. This script is the first-deployment checklist run as
code: on a machine where the libraries exist it executes every gated
call — driver-side AND through a real Spark worker — so the ~40
never-run glue lines get exercised before any production job does.

Each check prints ``PASS`` / ``FAIL`` / ``SKIP (lib absent)``; the
exit code is non-zero only if a runnable check fails, so the script is
safe to run anywhere (in this sandbox it prints SKIPs). See
tools/NATIVE_RUNBOOK.md for install + spark-submit commands.

Usage: python tools/native_smoke.py            # driver-side checks
       spark-submit --py-files <pkg.zip> tools/native_smoke.py --spark
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def minimal_pdf(n_pages: int = 2) -> bytes:
    """A byte-accurate minimal PDF (correct xref offsets) with
    ``n_pages`` blank 200x100pt pages — enough for pdfium to open and
    rasterize without any external fixture file."""
    objs: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for _ in range(n_pages):
        objs.append(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def text_image(text: str = "YES") -> np.ndarray:
    """White canvas with black text via PIL's built-in bitmap font —
    the OCR smoke input (no font files needed)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (160, 60), 255)
    ImageDraw.Draw(img).text((20, 20), text, fill=0)
    return np.asarray(img, dtype=np.uint8)


def check_rasterize() -> list[tuple[str, str]]:
    if not _has("pypdfium2"):
        return [("pypdfium2 rasterize_pdf_page/bytes", "SKIP (lib absent)")]
    from pdf_parser_spark.sources.kernels import (
        rasterize_pdf_bytes,
        rasterize_pdf_page,
    )

    pdf = minimal_pdf(2)
    page = rasterize_pdf_page(pdf, 0, dpi=72)
    assert page.ndim == 2 and page.shape[0] > 0, f"bad page shape {page.shape}"
    pages = rasterize_pdf_bytes(pdf, dpi=72)
    assert len(pages) == 2, f"expected 2 pages, got {len(pages)}"
    return [("pypdfium2 rasterize_pdf_page/bytes", "PASS")]


def check_ocr() -> list[tuple[str, str]]:
    if not (_has("pytesseract") and _has("PIL")):
        return [("tesseract image_to_data/yesno", "SKIP (lib absent)")]
    import pytesseract

    try:  # the python package can be present without the binary
        pytesseract.get_tesseract_version()
    except Exception:
        return [("tesseract image_to_data/yesno", "SKIP (binary absent)")]
    from pdf_parser_spark.sources.kernels import (
        tesseract_image_to_data,
        tesseract_yesno,
    )

    tokens = tesseract_image_to_data(text_image("HELLO WORLD"))
    assert isinstance(tokens, list), "token list expected"
    _ = tesseract_yesno(text_image("YES"))  # exercises the PSM-8 path
    return [("tesseract image_to_data/yesno", "PASS")]


def check_template_load() -> list[tuple[str, str]]:
    if not _has("PIL"):
        return [("PIL load_template", "SKIP (lib absent)")]
    import tempfile

    from PIL import Image

    from pdf_parser_spark.sources.kernels import load_template

    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        Image.fromarray(text_image("X")).save(f.name)
        tpl = load_template(f.name)
    os.unlink(f.name)
    assert tpl.ndim == 2 and tpl.dtype == np.uint8
    return [("PIL load_template", "PASS")]


def check_spark_worker_side() -> list[tuple[str, str]]:
    """Run the rasterize kernel INSIDE a Spark python worker — the
    deployment failure mode the driver-side checks can't see is a lib
    installed on the driver but missing from executor images."""
    if not _has("pypdfium2"):
        return [("worker-side rasterize via mapInPandas", "SKIP (lib absent)")]
    from pdf_parser_spark.session import get_spark

    spark = get_spark("native-smoke", master="local[2]", shuffle_partitions=2)
    pdf_bytes = minimal_pdf(1)

    def count_pages(it):
        import pandas as pd

        from pdf_parser_spark.sources.kernels import rasterize_pdf_bytes

        for batch in it:
            yield pd.DataFrame(
                {"n_pages": [len(rasterize_pdf_bytes(bytes(b), dpi=72)) for b in batch["pdf"]]}
            )

    df = spark.createDataFrame([(pdf_bytes,)], "pdf binary")
    n = df.mapInPandas(count_pages, "n_pages int").collect()[0]["n_pages"]
    spark.stop()
    assert n == 1, f"worker-side rasterize returned {n} pages"
    return [("worker-side rasterize via mapInPandas", "PASS")]


def main() -> int:
    checks = [check_rasterize, check_ocr, check_template_load]
    if "--spark" in sys.argv or os.environ.get("NATIVE_SMOKE_SPARK"):
        checks.append(check_spark_worker_side)
    results: list[tuple[str, str]] = []
    failed = False
    for fn in checks:
        try:
            results.extend(fn())
        except Exception:
            results.append((fn.__name__, "FAIL"))
            traceback.print_exc()
            failed = True
    for name, status in results:
        print(f"{status:24s} {name}")
    if all(s.startswith("SKIP") for _, s in results):
        print("all checks skipped — no native libraries in this environment "
              "(see tools/NATIVE_RUNBOOK.md for install commands)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
