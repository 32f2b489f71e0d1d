"""Generate the committed golden for the x1_extract_spans driver query.

The extraction pipeline's geometry is not SQL-expressible, but its
output IS deterministic: the pure-Python reference oracle computes the
expected span rows for the sf0.01 documents table (converted to the
interleaved shape exactly as __spark_entry__._interleaved_docs does),
and the result is committed as golden/x1_sf0.01.parquet. The driver's
oracle SQL then simply reads the golden — upgrading x1 from a
rows-only check to full value parity.

MUST be re-run whenever fixtures/generator.py (the synthetic
perception model) or the extraction semantics change:

    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.fixtures.generator import form_schemas, page_perception
    from pdf_parser_spark.oracle.reference_oracle import extract_document_spans

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()

    schemas = form_schemas()
    rows = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "order": []}
    for doc_id_raw, text in docs:
        doc_id = str(doc_id_raw)
        spans = [
            {"kind": "text", "text": text, "media_ref": "", "offset": 0},
            {"kind": "pdf_page", "text": "", "media_ref": f"media/{doc_id}/p1", "offset": 1},
        ]
        pages = {1: page_perception(doc_id, 1)}
        for kind, t, m, order in extract_document_spans(spans, pages, schemas):
            rows["doc_id"].append(doc_id)
            rows["kind"].append(kind)
            rows["text"].append(t)
            rows["media_ref"].append(m)
            rows["order"].append(order)

    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("order", pa.int32()),
        ]
    )
    out_dir = os.path.join(REPO, "golden")
    os.makedirs(out_dir, exist_ok=True)
    sf = os.path.basename(sf_dir.rstrip("/"))
    out_path = os.path.join(out_dir, f"x1_{sf}.parquet")
    pq.write_table(pa.Table.from_pydict(rows, schema=schema), out_path)
    print(f"wrote {out_path}: {len(rows['doc_id'])} rows over {len(docs)} docs")


if __name__ == "__main__":
    main()
