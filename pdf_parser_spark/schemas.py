"""Engine relation schemas (SURVEY.md §1.2).

The input table shape is fixed by the driver contract
(BASELINE.json input_hint):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

All intermediate relations are fixed nullable-column StructTypes — the
reference's conditionally-present dict keys become nullable columns
(SURVEY.md §1.3).
"""

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_STRUCT)),
    ]
)

# OCR token relation — the engine's central fact table. Mirrors the
# fields of a Tesseract image_to_data result the reference consumes
# (text/left/top/width/height/block_num/par_num/line_num); `tok_seq`
# preserves raw emission order (the reference's matching loops iterate
# tokens in OCR order, not sorted order).
OCR_TOKENS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("page_no", IntegerType()),
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

# Pre-NMS checkbox template-match relation. `seq` preserves the match
# emission order (all ticked matches in raster order, then all empty
# matches) — the NMS greedy pass sorts by confidence descending with a
# *stable* sort, so original order is behavioral.
CHECKBOX_MATCHES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("page_no", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("x", IntegerType()),
        StructField("y", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("status", StringType()),
        StructField("score", FloatType()),
    ]
)

# Output span relation (flat form; driver invariant is the per-doc
# ordered sequence of (kind, text, media_ref, order)).
OUT_SPANS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType()),
    ]
)

# Per-document lineage/metrics relation (replaces the reference's
# debug-image side effects with pure columnar rows).
LINEAGE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("n_tokens", IntegerType()),
        StructField("n_matches", IntegerType()),
        StructField("n_spans", IntegerType()),
    ]
)
