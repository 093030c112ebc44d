"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing here is real and tested — schema,
Arrow batching, ``mapInPandas`` signatures, partition sizing — while the actual
codec step is stubbed (no image/audio libraries in this container): decode
raises ``NotImplementedError`` unless the optional dependency imports, and a
deterministic fake decoder exercises the identical batch path so the pipeline
shape is verified end to end.

Scale design: payloads never pass through Python row-at-a-time — ``mapInPandas``
moves whole Arrow record batches; feature extraction is vectorized over the
batch (hashlib per payload is the stand-in for the vectorized codec). Partition
budget: keep ``spark.sql.files.maxPartitionBytes`` ≲ executor-memory/8 when
payloads are MB-scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # 'image' | 'audio' | 'video' | 'blob'
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_binary(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Documents → media rows: utf-8 payload bytes standing in for real blobs.

    (Real pipelines read payloads via ``spark.read.format('binaryFile')`` or an
    Iceberg blob column; the downstream plumbing is identical.)
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("blob").alias("kind"),
        payload.alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """Real codec hook — stubbed: no imaging library ships in this container."""
    try:
        from PIL import Image  # noqa: F401  (optional dependency, absent here)
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - exercised only without PIL
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; use fake_features for pipeline testing"
        ) from exc


def _fake_feature_vec(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec+model embedding: sha256-seeded."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    The batch path (schema in → record batches → schema out) is the real
    production shape; only ``_fake_feature_vec`` would be swapped for a codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]),
                    "features": payloads.map(lambda b: _fake_feature_vec(bytes(b), dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata pass (no Python): per-kind byte stats."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def resize_image(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize over binary payloads (Arrow-batched). The codec is stubbed
    (no imaging library in this container): payloads pass through a
    deterministic fake that emits a (width·height·3)-byte pseudo-bitmap seeded
    by the payload digest — the batch path, schema, and partition shape are
    the production plumbing; only the decode/resample call would be swapped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nbytes = width * height * 3
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                seed = int.from_bytes(hashlib.sha256(bytes(b)).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                out.append(rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "n_bytes": np.int64(nbytes),
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video-like payloads: emit up to ``max_frames`` evenly
    spaced byte windows per payload (one output row per frame — the fan-out
    shape of real frame extraction; decode itself is the stubbed step)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, frames, idxs = [], [], [], []
            for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(b)
                n = max(1, min(max_frames, len(raw) // every_n_bytes))
                for i in range(n):
                    off = i * len(raw) // n
                    ids.append(mid)
                    kinds.append(kind)
                    frames.append(raw[off : off + every_n_bytes])
                    idxs.append(i)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "payload": frames,
                    "width": pd.array([None] * len(ids), dtype="Int32"),
                    "height": pd.array([None] * len(ids), dtype="Int32"),
                    "n_bytes": np.array([len(f) for f in frames], dtype=np.int64),
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
