"""spark-submit entrypoint for the extraction pipeline.

The deployment surface of the north_star ("runs via spark-submit
--py-files on multi-executor clusters") and the engine's replacement
for the reference CLI (/root/reference/extractor.py:1266-1331:
argparse + config.json merge — its hardcoded Windows tool paths are
exactly what this replaces with job arguments):

    spark-submit --py-files pdf_parser_spark.zip \
        -m pdf_parser_spark.jobs.extract_job  # or path to this file
        --input  /data/documents            # parquet or iceberg:db.tbl
        --output /data/extracted_spans
        --sections sections.json            # form schema (else synthetic)
        --decoder native --mode auto
        --checkpoint-dir /data/ck --n-buckets 1024 --group-size 32
        --native-ocr mypkg.ocr:image_to_data  # worker-side binding
        --media-loader mypkg.store:fetch

With ``--checkpoint-dir`` the run is resumable at bucket-group
granularity (kill it, rerun the same command, committed groups are
skipped); without it the pipeline writes in one pass. Lineage metrics
are written alongside the output either way.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="pdf_parser_spark extraction job")
    p.add_argument("--input", required=True, help="documents table: parquet path or iceberg:<table>")
    p.add_argument("--output", required=True, help="output path for extracted span rows")
    p.add_argument("--sections", help="form-schema JSON file (list of sections, or "
                                      "{variant: list} for gender-variant schemas)")
    p.add_argument("--decoder", default="synthetic", choices=["synthetic", "native"])
    p.add_argument("--mode", default="auto", choices=["auto", "fused", "paged"])
    p.add_argument("--parallelism", type=int, default=None)
    p.add_argument("--checkpoint-dir", help="enable resumable bucket-group execution")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--group-size", type=int, default=8)
    p.add_argument("--ticked-template", help="path to ticked checkbox template (.npy/.png)")
    p.add_argument("--empty-template", help="path to empty checkbox template (.npy/.png)")
    p.add_argument("--native-ocr", help="module:attr OCR binding for the native decoder")
    p.add_argument("--native-yesno-ocr", help="module:attr whitelist-OCR binding")
    p.add_argument("--media-loader", help="module:attr media_ref->bytes binding")
    p.add_argument("--metrics-output", help="lineage metrics path (default <output>_metrics)")
    return p


def load_sections(path: str | None):
    if path is None:
        return None
    with open(path) as f:
        raw = json.load(f)
    # accept the reference's sections.json shape: [{section_name, labels?|questions?}]
    return raw


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from pdf_parser_spark.plans.extract import extract_spans, lineage_metrics
    from pdf_parser_spark.sources.documents import read_documents

    spark = SparkSession.builder.appName("pdf-parser-spark-extract").getOrCreate()

    if args.decoder == "native" and (
        args.native_ocr or args.media_loader or args.native_yesno_ocr
        or args.ticked_template or args.empty_template
    ):
        # record the bindings (dotted paths + template paths) — the
        # decode/assembly UDF factories capture them at plan time and
        # re-apply them inside every Python worker
        from pdf_parser_spark.sources.perception import configure_native

        configure_native(
            args.media_loader, args.native_ocr, args.native_yesno_ocr,
            args.ticked_template, args.empty_template,
        )

    docs = read_documents(spark, args.input)
    sections = load_sections(args.sections)

    if args.checkpoint_dir:
        from pdf_parser_spark.streaming.checkpoint import (
            extract_with_checkpoint,
            read_extracted,
        )

        summary = extract_with_checkpoint(
            spark, docs, args.checkpoint_dir,
            n_buckets=args.n_buckets, group_size=args.group_size,
            sections=sections, mode=args.mode, decoder=args.decoder,
        )
        out = read_extracted(spark, args.checkpoint_dir)
        out.write.mode("overwrite").parquet(args.output)
        print(f"checkpointed run: {json.dumps({k: summary[k] for k in ('resumed_from', 'groups_run')})}")
    else:
        out = extract_spans(
            docs, sections=sections, decoder=args.decoder,
            parallelism=args.parallelism, mode=args.mode,
        )
        out.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)

    metrics_path = args.metrics_output or args.output.rstrip("/") + "_metrics"
    lineage_metrics(docs, out).write.mode("overwrite").parquet(metrics_path)
    n = out.count()
    print(f"extracted {n} spans -> {args.output} (metrics -> {metrics_path})")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
