"""pdf_parser_spark — a PySpark-native form-extraction engine.

A from-scratch re-implementation (NOT a port) of the extraction
capabilities of the reference single-machine CV/OCR pipeline
(kraghunadhareddy/pdf-parser, surveyed in SURVEY.md). The engine reads
an interleaved text+media documents table
(doc_id, spans: array<struct<kind,text,media_ref,offset>>), decodes
media in page-parallel vectorized UDF batches, and runs the reference's
geometric layer (NMS dedupe, section anchoring, row clustering,
label→checkbox assignment) as Spark DataFrame transforms plus
doc-grouped Arrow UDFs, emitting per-document ordered spans
(kind, text, media_ref, order).
"""

__version__ = "0.1.0"
