"""Perception layer: page decode → (OCR tokens, checkbox matches).

This is the engine's vectorized-UDF surface (SURVEY.md §2.9 K1-K4):
``mapInPandas`` over page rows, each Arrow batch decoding many pages
and emitting one output row per page carrying the token and match
arrays. Two interchangeable decoders:

- ``synthetic`` (default in this sandbox): regenerates the
  deterministic perception rows from (doc_id, page_no) alone via the
  seeded fixture generator — the OCR/template-match stand-in
  (SURVEY.md §5.2.3: the reference's geometry stack consumes only the
  OCR dict + match list, so injecting these exercises everything
  downstream deterministically).
- ``native``: the real kernel chain — pypdfium2 rasterize @300 DPI
  (reference: /root/reference/extractor.py:960-976), OpenCV preprocess
  (extractor.py:108-137), cv2.matchTemplate checkbox detection
  (extractor.py:139-153), Tesseract image_to_data OCR
  (extractor.py:987-989). The CV/OCR libs are not installed in this
  container, so the native path import-gates and raises
  ``NotImplementedError`` with the exact kernel contract; the Spark
  plumbing (schema, batching, partitioning) is identical for both and
  is what the tests exercise.

Scale notes: the decode stage is the dominant cost at 10^12 docs. It
runs on page-granular rows after a round-robin repartition, so one
500-page doc spreads across up to 500 tasks (skew by granularity,
R13). Output rows carry tokens/matches arrays — orders of magnitude
smaller than page images — so the single downstream shuffle (group by
doc_id for geometry) moves only token data, never pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TOKEN_STRUCT = StructType(
    [
        StructField("tok_seq", IntegerType()),
        StructField("text", StringType()),
        StructField("x", IntegerType()),
        StructField("y", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("block", IntegerType()),
        StructField("par", IntegerType()),
        StructField("line", IntegerType()),
    ]
)

MATCH_STRUCT = StructType(
    [
        StructField("seq", IntegerType()),
        StructField("x", IntegerType()),
        StructField("y", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("status", StringType()),
        StructField("score", FloatType()),
    ]
)

# Perception transport: the (tokens, matches) payload crosses the one
# shuffle of the pipeline as an opaque pickled binary column. Nested
# array<struct> transport through Arrow→pandas materializes per-element
# Python dicts on both sides of every boundary — measured ~3-5× the
# cost of the geometry itself — while a binary blob is a straight
# memcpy. The relational OCR-token view (`tokens_relation`) explodes
# the payload into the flat columnar table when relational access is
# wanted; the extraction hot path never pays for it.
PERCEPTION_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("page_no", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _synthetic_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    import pickle

    from pdf_parser_spark.fixtures.generator import page_perception

    payloads = []
    for doc_id, page_no in zip(pdf["doc_id"], pdf["page_no"]):
        toks, matches, highlights = page_perception(str(doc_id), int(page_no))
        payloads.append(pickle.dumps((toks, matches, highlights), protocol=5))
    return pd.DataFrame(
        {"doc_id": pdf["doc_id"], "page_no": pdf["page_no"], "payload": payloads}
    )


def _native_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    try:
        import cv2  # noqa: F401
        import pypdfium2  # noqa: F401
        import pytesseract  # noqa: F401
    except ImportError as e:  # pragma: no cover - libs absent in sandbox
        raise NotImplementedError(
            "native perception kernels (pypdfium2 rasterize @300DPI -> "
            "cv2 preprocess [SHARPEN, contrast x1.15, CLAHE clip=2.0 "
            "tile=8, unsharp r=1.2 a=1.3] -> cv2.matchTemplate "
            "TM_CCOEFF_NORMED vs 37x37 ticked/unticked templates, "
            "threshold 0.6 -> pytesseract image_to_data PSM 6) require "
            "cv2/pypdfium2/pytesseract, not installed in this container; "
            "use decoder='synthetic'"
        ) from e
    raise NotImplementedError("native decode wiring pending CV libs")  # pragma: no cover


_DECODERS = {"synthetic": _synthetic_decode_batch, "native": _native_decode_batch}


def perceive(pages: DataFrame, decoder: str = "synthetic", parallelism: int | None = None) -> DataFrame:
    """media_pages → perception rows (one per page) via mapInPandas.

    ``parallelism``: round-robin repartition width before the heavy UDF
    (skew by granularity). Default: leave partitioning as-is.
    """
    decode = _DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                # bounded work-budget: decode in chunks so a batch of
                # many pages never materializes all decoded output at
                # once (R12, SURVEY.md §4)
                for start in range(0, len(pdf), 256):
                    yield decode(pdf.iloc[start : start + 256])

    if parallelism is None:
        # default: 2 waves per core — page-granular rows spread a skewed
        # multi-hundred-page doc across many tasks (R13, SURVEY.md §4)
        parallelism = pages.sparkSession.sparkContext.defaultParallelism * 2
    pages = pages.repartition(parallelism)
    return pages.mapInPandas(run, schema=PERCEPTION_SCHEMA)


def decode_pages_for_doc(doc_id: str, spans: list[dict], decoder: str = "synthetic"):
    """Doc-local decode for the fused pipeline mode: media spans (in
    offset order) → {page_no: (tokens, matches)}. The synthetic decoder
    derives perception deterministically from (doc_id, page_no); the
    native decoder would rasterize+OCR the bytes behind media_ref."""
    if decoder != "synthetic":
        raise NotImplementedError("fused mode currently supports the synthetic decoder")
    from pdf_parser_spark.fixtures.generator import page_perception

    media = [s for s in sorted(spans, key=lambda s: s["offset"]) if s["kind"] != "text"]
    return {i + 1: page_perception(doc_id, i + 1) for i in range(len(media))}


def tokens_relation(perception: DataFrame) -> DataFrame:
    """Perception rows → the flat columnar OCR-token relation
    (SURVEY.md §1.1: the engine's central fact table), for relational
    consumers; the extraction hot path keeps the packed payload."""
    import pickle

    out_schema = StructType(
        [StructField("doc_id", StringType()), StructField("page_no", IntegerType())]
        + list(TOKEN_STRUCT.fields)
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            rows = []
            for doc_id, page_no, payload in zip(pdf["doc_id"], pdf["page_no"], pdf["payload"]):
                toks = pickle.loads(bytes(payload))[0]
                for t in toks:
                    rows.append(
                        (doc_id, page_no, t["tok_seq"], t["text"], t["x"], t["y"],
                         t["w"], t["h"], t["block"], t["par"], t["line"])
                    )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return perception.mapInPandas(explode, schema=out_schema)
