"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a struct of
typed metadata; decode / feature-extract kernels are Arrow-batched
``mapInPandas`` UDFs. The real codec libraries (PIL/ffmpeg/librosa)
are not in this container, so the decode step is STUBBED: a
deterministic header parse (for tests/bench) plus an import-gated
``NotImplementedError`` path documenting the real kernel contract.
The Spark-side plumbing — schema, batch shape, partitioning — is real
and tested; swapping the stub for a real codec changes only the inner
``_decode_payload`` function.

Scale posture: payload rows are processed where they live (narrow
mapInPandas, no shuffle); metadata extraction emits small typed rows
so downstream filters/joins never touch the bytes again (decode-once,
the analogue of the reference's single-OCR-pass rule,
/root/reference/extractor.py:987-989).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("media_kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def _decode_payload(payload: bytes, kind: str) -> tuple[int, int]:
    """STUB decode: deterministic fake dimensions derived from the
    payload header bytes. Real kernel contract: image → (PIL.Image.open
    → .size), video → (frame sample via pyav), audio → (duration,
    channels). Deterministic here so tests and oracle agree."""
    if not payload:
        return (0, 0)
    w = 64 + payload[0] % 192
    h = 64 + payload[-1] % 192
    return (w, h)


def media_metadata(df: DataFrame, id_col: str, payload_col: str, kind_col: str) -> DataFrame:
    """binary payload rows → typed metadata rows via Arrow-batched
    mapInPandas (one batch = many payloads; bytes never shuffle)."""
    import hashlib

    cols = [id_col, payload_col, kind_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                "media_id": [], "media_kind": [], "byte_len": [],
                "width": [], "height": [], "checksum": [],
            }
            for mid, payload, kind in zip(pdf[id_col], pdf[payload_col], pdf[kind_col]):
                payload = bytes(payload) if payload is not None else b""
                w, h = _decode_payload(payload, kind)
                out["media_id"].append(str(mid))
                out["media_kind"].append(str(kind))
                out["byte_len"].append(len(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["checksum"].append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=MEDIA_META_SCHEMA)


def media_metadata_sql(df: DataFrame, id_col: str, payload_col: str, kind_col: str) -> DataFrame:
    """The same metadata via pure Catalyst expressions (JVM fast path —
    used when the derivation needs no codec): byte length, md5, and the
    stub's header-byte dimensions, expressed relationally. Serves as
    the oracle-checkable twin of ``media_metadata``."""
    payload = F.col(payload_col)
    first_b = F.conv(F.substring(F.hex(payload), 1, 2), 16, 10).cast("int")
    hexstr = F.hex(payload)
    last_b = F.conv(F.substring(hexstr, F.length(hexstr) - 1, 2), 16, 10).cast("int")
    empty = F.coalesce(F.octet_length(payload), F.lit(0)) == 0
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(kind_col).alias("media_kind"),
        F.coalesce(F.octet_length(payload), F.lit(0)).cast("bigint").alias("byte_len"),
        F.when(empty, 0).otherwise(64 + first_b % 192).cast("int").alias("width"),
        F.when(empty, 0).otherwise(64 + last_b % 192).cast("int").alias("height"),
        F.md5(payload).alias("checksum"),
    )


MEDIA_TRANSFORM_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("media_kind", StringType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("n_frames_sampled", IntegerType()),
        StructField("frame_offsets", StringType()),  # csv of sampled offsets
        StructField("out_bytes", LongType()),
    ]
)


def _resize_dims(w: int, h: int, target: int) -> tuple[int, int]:
    """STUB resize: aspect-preserving fit into target x target (the real
    kernel is PIL Image.thumbnail / cv2.resize on the decoded array)."""
    if w <= 0 or h <= 0:
        return (0, 0)
    scale = min(target / w, target / h, 1.0)
    return (max(1, int(w * scale)), max(1, int(h * scale)))


def _sample_frames(payload: bytes, every: int) -> list[int]:
    """STUB frame sampler: deterministic byte offsets standing in for
    video frame indices (real kernel: pyav keyframe iteration)."""
    if not payload:
        return []
    return list(range(0, len(payload), max(1, every)))[:8]


def media_transform(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    kind_col: str,
    target_size: int = 64,
    frame_every: int = 4096,
) -> DataFrame:
    """Decode → resize / frame-sample feature extraction over binary
    media payloads (Arrow-batched mapInPandas; bytes never shuffle).
    Decode internals are stubs (no codec libs in this container); the
    Spark plumbing — schema, batch iteration, per-kind branching,
    bounded output — is the real production shape."""

    cols = [id_col, payload_col, kind_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k.name: [] for k in MEDIA_TRANSFORM_SCHEMA.fields}
            for mid, payload, kind in zip(pdf[id_col], pdf[payload_col], pdf[kind_col]):
                payload = bytes(payload) if payload is not None else b""
                w, h = _decode_payload(payload, kind)
                rw, rh = _resize_dims(w, h, target_size)
                frames = _sample_frames(payload, frame_every) if kind == "video" else []
                out["media_id"].append(str(mid))
                out["media_kind"].append(str(kind))
                out["out_width"].append(rw)
                out["out_height"].append(rh)
                out["n_frames_sampled"].append(len(frames))
                out["frame_offsets"].append(",".join(map(str, frames)))
                out["out_bytes"].append(rw * rh * 3)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=MEDIA_TRANSFORM_SCHEMA)
