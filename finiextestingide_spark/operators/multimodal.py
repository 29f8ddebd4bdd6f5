"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

A 100 TB training-data lake carries media as binary columns with sidecar
metadata; the engine's job is the Spark-side plumbing — schema, Arrow batch
shape, partition-friendly transforms — with the codec behind a narrow seam.
The decode seam is STUBBED here (no image/audio libs in this container):
``decoder=None`` uses a deterministic fake so the distributed plumbing is
fully testable; pass a real decode callable (PIL/av/librosa) in production.

Everything runs through ``mapInPandas``: Arrow-batched, streaming per
partition (never materializes a partition of binaries in memory at once),
and schema-checked at the boundary.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_FIELDS = [
    StructField("media_size_bytes", LongType()),
    StructField("media_sha", StringType()),
    StructField("media_kind", StringType()),
]


def with_media_metadata(df: DataFrame, media: str = "media") -> DataFrame:
    """Cheap JVM-side metadata: size, content hash, magic-byte kind sniff.
    No Python round-trip — this is the fast path for dedup/stats over media."""
    kind = (
        F.when(F.substring(F.col(media), 1, 3) == F.lit(bytes.fromhex("ffd8ff")), "jpeg")
        .when(
            F.substring(F.col(media), 1, 8) == F.lit(bytes.fromhex("89504e470d0a1a0a")),
            "png",
        )
        .when(F.substring(F.col(media), 1, 4) == F.lit(b"RIFF"), "riff")
        .otherwise("unknown")
    )
    return (
        df.withColumn("media_size_bytes", F.length(media).cast("long"))
        .withColumn("media_sha", F.sha2(F.col(media), 256))
        .withColumn("media_kind", kind)
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: byte histogram shaped
    as an 16x16 'image'. Stable across runs/workers (pure function of bytes)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    return hist.reshape(16, 16)


def extract_features(
    df: DataFrame,
    *,
    media: str = "media",
    id_col: str = "media_id",
    decoder: Callable[[bytes], np.ndarray] | None = None,
    feature_dim: int = 256,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode -> feature-vector per media row via mapInPandas.

    The output schema (id, features array<double>, height, width) is the
    contract downstream similarity search consumes; the decoder is the only
    swap point for real codecs.
    """
    decode = decoder or _fake_decode
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(DoubleType())),
            StructField("height", IntegerType()),
            StructField("width", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[media]):
                if payload is None:
                    out.append((mid, None, None, None))
                    continue
                img = decode(bytes(payload))
                flat = img.reshape(-1).astype(np.float64)
                if len(flat) < feature_dim:
                    flat = np.pad(flat, (0, feature_dim - len(flat)))
                out.append(
                    (mid, flat[:feature_dim].tolist(), img.shape[0], img.shape[1])
                )
            yield pd.DataFrame(out, columns=[id_col, "features", "height", "width"])

    return df.select(id_col, media).mapInPandas(run, schema)


def resize_stub(
    df: DataFrame, height: int, width: int, *, media: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Resize plumbing with the codec stubbed: validates the batch contract
    and emits (id, resized binary, h, w). A real implementation replaces the
    body's transform only.

    Raises NotImplementedError through the seam if called with
    ``require_real=True`` semantics — here the deterministic fake truncates/
    pads the byte payload so tests can assert the plumbing end-to-end."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("media", df.schema[media].dataType),
            StructField("height", IntegerType()),
            StructField("width", IntegerType()),
        ]
    )
    target = height * width

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[media]):
                if payload is None:
                    out.append((mid, None, None, None))
                    continue
                b = bytes(payload)
                resized = (b * (target // max(len(b), 1) + 1))[:target]
                out.append((mid, resized, height, width))
            yield pd.DataFrame(out, columns=[id_col, "media", "height", "width"])

    return df.select(id_col, media).mapInPandas(run, schema)


def frame_sample_stub(
    df: DataFrame,
    every_n: int = 10,
    *,
    media: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame with
    a frame index — the explode shape a real av-based sampler produces. The
    fake treats each 64-byte block as a 'frame'."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", df.schema[media].dataType),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[media]):
                if payload is None:
                    continue
                b = bytes(payload)
                n_frames = max(len(b) // 64, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi * 64 : (fi + 1) * 64])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, media).mapInPandas(run, schema)


def chunk_hashes(
    df: DataFrame,
    *,
    media: str = "media",
    id_col: str = "doc_id",
    chunk_bytes: int = 65536,
) -> DataFrame:
    """Fixed-size chunk fingerprints over a binary column: (id, chunk_idx,
    chunk_md5, chunk_len). The media analogue of document shingling — the
    unit for chunk-level dedup (two videos sharing a leading segment), for
    content-defined shard verification, and for frame-aligned sampling when
    ``chunk_bytes`` matches the codec's frame stride.

    Pure Column expressions (sequence/posexplode/substring/md5 — substring
    and md5 operate natively on BINARY): JVM-side, no Python round-trip,
    and the explode is lazy per row so a partition never holds more than
    one payload's chunk list. Empty payloads emit zero rows."""
    n = F.octet_length(F.col(media))
    n_chunks = F.ceil(n / F.lit(chunk_bytes)).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    exploded = df.select(id_col, media, F.explode(idx).alias("chunk_idx"))
    chunk = F.expr(
        f"substring({media}, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})"
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.md5(chunk).alias("chunk_md5"),
        F.octet_length(chunk).cast("long").alias("chunk_len"),
    )
