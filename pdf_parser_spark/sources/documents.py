"""Documents-table source (SURVEY.md §2.1 S1-S3).

Reads the interleaved ``documents`` table (driver input_hint shape:
``doc_id: string, spans: array<struct<kind,text,media_ref,offset>>``)
and derives the two relations the pipeline consumes:

- ``media_pages(doc_id, page_no, media_ref)`` — one row per media span,
  in offset order (page_no is the 1-based rank of media spans within
  the doc, matching the reference's page numbering,
  /root/reference/extractor.py:991).
- the original doc rows, for final span assembly.

Scale notes: the explode is a narrow transform (no shuffle); page-level
rows are what the heavy perception kernels run over, so a skewed
500-page document naturally fans out into 500 independently schedulable
rows — skew is handled by *granularity*, plus an explicit round-robin
``repartition`` before the expensive UDF stage (R13, SURVEY.md §4).

In production the table is Iceberg (``spark.read.format("iceberg")``);
parquet is the sandbox stand-in with identical schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Load the documents table (parquet sandbox / Iceberg in prod)."""
    if path.startswith("iceberg:"):
        return spark.read.format("iceberg").load(path[len("iceberg:") :])
    return spark.read.parquet(path)


def media_pages(docs: DataFrame) -> DataFrame:
    """Explode media spans to one row per (doc_id, page_no, media_ref).

    ``page_no`` is the 1-based index of the media span within the
    document's media spans ordered by ``offset`` — computed with
    ``filter`` + ``posexplode`` on the already-ordered span array, so no
    window/shuffle is needed (spans arrive sorted by offset per the
    input contract; we sort defensively with array_sort).
    """
    media = F.array_sort(
        F.filter(F.col("spans"), lambda s: s["kind"] != F.lit("text")),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return (
        docs.select("doc_id", F.posexplode(media).alias("pos", "span"))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("page_no"),
            F.col("span.media_ref").alias("media_ref"),
        )
    )
