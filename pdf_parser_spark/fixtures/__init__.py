from pdf_parser_spark.fixtures.generator import (  # noqa: F401
    doc_page_count,
    doc_spans,
    form_schema,
    page_perception,
    write_fixture_tables,
)
