from pdf_parser_spark.oracle.reference_oracle import extract_document_spans  # noqa: F401
