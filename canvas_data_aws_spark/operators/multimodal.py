"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested; the actual media decoding is stubbed
behind ``decode_media_stub`` because codec libraries (PIL/ffmpeg/librosa)
are not in this environment. Each stub either raises ``NotImplementedError`` (strict
mode) or produces a deterministic fake derived from the bytes (test mode),
so pipelines exercise the exact dataflow a real decoder would use.

Batch shape contract: ``mapInPandas`` receives an iterator of pandas frames
(Arrow batches, bounded by spark.sql.execution.arrow.maxRecordsPerBatch) —
decode cost is amortized per batch and memory is bounded per batch, which
is what makes this safe against 100 TB of media files.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # 'image' | 'audio' | 'video'
        StructField("content", BinaryType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256_prefix", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def decode_media_stub(content: bytes) -> tuple[int, int, int]:
    """Strict-mode decoder entry point: real pixels when an optional public
    codec (PIL) is importable AND the payload parses; otherwise raises —
    strict mode never fabricates dimensions."""
    return _decoder(strict=True)(content)


def _decoder(strict: bool):
    """Build the per-batch decode callable as a CLOSURE: cloudpickle ships
    closures by value, so Python workers never need this package importable
    — module-level functions captured in a UDF pickle by reference and fail
    under drivers whose workers lack the repo on sys.path.

    Decode policy (per payload, inside the worker):
    1. If PIL imports and the bytes parse as an image -> real
       (width, height, n_frames) — no extra required dependency, just an
       optional one honored when present.
    2. Else strict=True -> NotImplementedError (never fake in strict mode);
       strict=False -> deterministic digest-derived fake (the documented
       sandbox stand-in: no codec libraries in this environment).
    """

    def decode(content: bytes) -> tuple[int, int, int]:
        content = content or b""
        try:  # optional real decode — PIL is a public, widely-packaged codec
            import io

            from PIL import Image

            with Image.open(io.BytesIO(content)) as img:
                return int(img.width), int(img.height), int(getattr(img, "n_frames", 1))
        except Exception:
            pass  # PIL absent or payload not an image: fall through
        if strict:
            raise NotImplementedError(
                "media decoding requires PIL/ffmpeg/librosa (payload did not "
                "decode); use strict=False for the deterministic fake decoder"
            )
        d = hashlib.sha256(content).hexdigest()
        width = 64 + (ord(d[0]) * 7 + ord(d[1])) % 192
        height = 64 + (ord(d[2]) * 7 + ord(d[3])) % 192
        n_frames = 1 + (ord(d[4]) * 7 + ord(d[5])) % 32
        return width, height, n_frames

    return decode


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Fabricate a multimodal table from the documents fixture: utf-8 bytes
    as the opaque payload (the driver corpus ships no real media)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("content_type"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode / feature-extract over the binary column via mapInPandas.

    One Arrow batch at a time; output rows align 1:1 with input rows. In
    ``strict`` mode the decoder raises (no codec libs here); otherwise the
    deterministic fake decoder stands in.
    """

    decode = _decoder(strict)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "sha256_prefix": [
                        hashlib.sha256(c or b"").hexdigest()[:8] for c in pdf["content"]
                    ],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("resized_sha256", StringType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 64, target_h: int = 64, strict: bool = False
) -> DataFrame:
    """Image resize stub over the binary column (1:1 mapInPandas).

    The real version decodes, resamples, and re-encodes per Arrow batch;
    the stub derives the output deterministically (digest of payload +
    target box, output size = w*h*3 RGB bytes) so the full dataflow —
    schema, batch shape, downstream joins — is exercised and oracle-checked.
    """

    decode = _decoder(strict)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                for c in pdf["content"]:
                    decode(c)
            tag = f":{target_w}x{target_h}".encode()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized_sha256": [
                        hashlib.sha256((c or b"") + tag).hexdigest()[:16] for c in pdf["content"]
                    ],
                    "n_bytes_out": [target_w * target_h * 3] * len(pdf),
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, strict: bool = False) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame index —
    a 1:N mapInPandas expansion (the real version would emit decoded frame
    tensors; the plumbing — schema, expansion, batch bounds — is identical)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_sha256", StringType()),
        ]
    )

    decode = _decoder(strict)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, hashes = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _w, _h, n_frames = decode(content)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    frames.append(fno)
                    hashes.append(
                        hashlib.sha256((content or b"") + fno.to_bytes(4, "big")).hexdigest()[:8]
                    )
            yield pd.DataFrame({"media_id": ids, "frame_no": frames, "frame_sha256": hashes})

    return media.filter(F.col("modality") == "video").mapInPandas(_sample, out_schema)


def embed_media(media: DataFrame, dim: int = 64, strict: bool = False) -> DataFrame:
    """Media -> embedding bridge (the CLIP/CLAP-encoder slot in a
    multimodal curation pipeline): mapInPandas over the opaque payload
    column producing a unit-norm ``array<float>`` per row, ready for the
    engine's similarity/dedup/PCA operators downstream.

    The real encoder (a vision/audio model forward pass) is not available
    in this environment; ``strict=True`` raises NotImplementedError at the
    encoder slot, otherwise a DETERMINISTIC stand-in embeds from a
    sha256-seeded RNG — stable across runs/partitionings, so downstream
    plumbing (batch shapes, schema, normalization, ANN joins) is tested
    for real. Batch contract matches the production shape: one Arrow batch
    in, an (media_id, modality, embedding) frame out, payloads never leave
    the executor.
    """
    import hashlib

    import numpy as np

    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("modality", StringType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "no media encoder available in this environment; "
                    "plug the model forward pass in here"
                )
            vecs = []
            for content in pdf["content"]:
                seed = int.from_bytes(
                    hashlib.sha256(bytes(content)).digest()[:8], "big"
                )
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim)
                vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "embedding": vecs,
                }
            )

    return media.select("media_id", "modality", "content").mapInPandas(
        _embed, out_schema
    )
