"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns next to typed metadata
(byte length, magic bytes, declared mime). The Spark-side plumbing — schema,
Arrow batch shape, mapInPandas signatures, partition sizing — is real and
tested; the actual media DECODE step is stubbed (image/audio libs are not in
this container) behind ``NotImplementedError`` with a deterministic fake
path for tests.

Scale notes: binary payloads dominate row size, so jobs over these columns
set ``spark.sql.files.maxPartitionBytes`` down (payload-aware splits) and
NEVER collect; metadata extraction is a pure column expression, and decode /
feature-extract runs in mapInPandas so one Arrow batch holds a bounded
number of payloads (maxRecordsPerBatch) rather than a bounded byte size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

#: magic-byte prefixes → mime (the usual sniff table)
MAGIC_MIME = {
    "89504e47": "image/png",
    "ffd8ffe0": "image/jpeg",
    "ffd8ffe1": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF
    "494433": "audio/mpeg",   # ID3
}

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", BinaryType()),
])


def binary_metadata(df: DataFrame, bin_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bytes, magic, mime): typed metadata, pure column exprs."""
    magic = F.lower(F.hex(F.substring(F.col(bin_col), 1, 4)))
    mime = F.lit("application/octet-stream")
    for prefix, m in MAGIC_MIME.items():
        mime = F.when(magic.startswith(prefix), F.lit(m)).otherwise(mime)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        magic.alias("magic"),
        mime.alias("mime"),
    )


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires PIL/opencv — not in this container.

    The Spark-side contract (bytes in, ndarray out, called per element inside
    an Arrow batch) is what's under test; swap this body for
    ``PIL.Image.open(io.BytesIO(payload))`` on a real cluster."""
    raise NotImplementedError("image decode stubbed: PIL/opencv not available")


def fake_feature(payload: bytes, dim: int = 8) -> bytes:
    """Deterministic stand-in for decode+feature-extract: ``dim`` bytes of
    a rolling checksum — keeps the full pipeline testable end-to-end."""
    acc, out = 2166136261, bytearray()
    for i, b in enumerate(payload):
        acc = (acc ^ b) * 16777619 & 0xFFFFFFFF
        if i % max(1, len(payload) // dim) == 0 and len(out) < dim:
            out.append(acc & 0xFF)
    while len(out) < dim:
        acc = acc * 16777619 & 0xFFFFFFFF
        out.append(acc & 0xFF)
    return bytes(out)


def extract_features(df: DataFrame, bin_col: str = "payload",
                     id_col: str = "doc_id", use_stub: bool = True) -> DataFrame:
    """mapInPandas decode/feature pipeline over binary payloads.

    Arrow-batched: each pandas batch holds maxRecordsPerBatch payloads; the
    UDF yields one feature row per payload. ``use_stub=False`` exercises the
    real (NotImplementedError) decode path.
    """
    meta = binary_metadata(df, bin_col, id_col)
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload")) \
            .join(meta.select("doc_id", "mime", "n_bytes"), "doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                feats.append(fake_feature(raw) if use_stub else decode_image(raw))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["n_bytes"],
                "feature": feats,
            })

    return src.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("payload", BinaryType()),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame", BinaryType()),
])


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for image resize: stretches/truncates the
    byte stream to width*height bytes (real impl: PIL resize)."""
    target = max(1, width * height)
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_images(df: DataFrame, width: int = 32, height: int = 32,
                  bin_col: str = "payload", id_col: str = "doc_id",
                  use_stub: bool = True) -> DataFrame:
    """mapInPandas image-resize pipeline (STUBBED decode — PIL/opencv are
    not in this container; the Spark-side contract — Arrow batch shape,
    output schema, partition behavior — is real and tested)."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if not use_stub:
                    decode_image(raw)  # raises NotImplementedError
                out.append(fake_resize(raw, width, height))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "width": [width] * len(out),
                                "height": [height] * len(out),
                                "payload": out})

    return src.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  bin_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas video frame sampling: one output row per sampled frame
    (doc_id, frame_idx, frame). The decode is a deterministic fake (evenly
    spaced byte windows); swap for pyav/ffmpeg on a real cluster. Output
    cardinality = n_frames x input rows — the 1:N generator shape video
    pipelines need, with bounded Arrow batches."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                step = max(1, len(raw) // n_frames)
                for j in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(j)
                    frames.append(raw[j * step:(j + 1) * step] or b"\x00")
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return src.mapInPandas(run, FRAME_SCHEMA)


def synth_payloads(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary column for tests: utf-8 bytes of the text with a
    PNG magic prefix on even ids, raw text bytes on odd ids."""
    body = F.encode(F.col(text_col), "utf-8")
    png = F.concat(F.unhex(F.lit("89504E470D0A1A0A")), body)
    payload = F.when(F.col(id_col) % 2 == 0, png).otherwise(body)
    return docs.select(F.col(id_col).alias("doc_id"), payload.alias("payload"))
