"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step (image decode, audio resample, video frame-sample) requires
libraries not present in this container, so it is STUBBED: each decoder
raises ``NotImplementedError`` unless its library imports, and the pipeline
ships a deterministic fake feature extractor instead — the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is real and
tested.  Swapping the stub for a real decoder changes one function.

Scale notes: payloads stay byte-opaque through the scan (parquet binary
column, no JVM decode); `mapInPandas` moves payload bytes to Python only in
the feature stage, batch-sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(drop it for multi-MB payloads so a batch fits executor memory); feature
vectors come back as ``array<float>`` ready for the similarity operators in
``dataops.py``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal item schema: payload is opaque bytes + typed metadata
ITEM_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video | text
        StructField("payload", BinaryType(), False),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_DIM = 8


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWxC array.  STUB: needs Pillow."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("image decode requires Pillow (not in this container)") from e
    raise NotImplementedError("wire Pillow decode here")


def decode_audio(payload: bytes) -> np.ndarray:
    """Decode audio to a waveform array.  STUB: needs soundfile/librosa."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("audio decode requires soundfile (not in this container)") from e
    raise NotImplementedError("wire soundfile decode here")


def fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for decode+embed: FEATURE_DIM floats derived
    from the md5 of the payload bytes.  Vectorized per Arrow batch; replaces
    the real decoder without changing any plumbing."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        dig = hashlib.md5(bytes(b)).digest()
        out[i] = np.frombuffer(dig[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0
    return out


def extract_features(items: DataFrame, payload_col: str = "payload") -> DataFrame:
    """items(item_id, modality, payload binary, ...) ->
    (item_id, modality, n_bytes, feature array<float>).

    The UDF signature and batch shape are exactly what a real decoder needs;
    only ``fake_features`` is a stand-in."""
    out_schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("modality", StringType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("feature", ArrayType(FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = fake_features(pdf[payload_col])
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf[payload_col].map(len),
                    "feature": list(feats),
                }
            )

    return items.select("item_id", "modality", payload_col).mapInPandas(run, out_schema)


def fake_resize(payload: bytes, height: int, width: int) -> bytes:
    """Deterministic stand-in for decode+resize: interprets the payload as a
    square 1-channel byte matrix (side = ceil(sqrt(n)), zero-padded) and
    nearest-neighbor-resamples it to height x width bytes.  A real Pillow
    ``Image.resize`` drops in here without touching the Spark plumbing."""
    raw = np.frombuffer(bytes(payload), dtype=np.uint8)
    side = max(1, int(np.ceil(np.sqrt(raw.size))))
    padded = np.zeros(side * side, dtype=np.uint8)
    padded[: raw.size] = raw
    img = padded.reshape(side, side)
    ri = (np.arange(height) * side // height).clip(0, side - 1)
    ci = (np.arange(width) * side // width).clip(0, side - 1)
    return img[np.ix_(ri, ci)].tobytes()


def resize_items(items: DataFrame, height: int = 16, width: int = 16, payload_col: str = "payload") -> DataFrame:
    """(item_id, modality, payload) -> (item_id, modality, payload resized,
    out_h, out_w): the image-resize stage as an Arrow-batched ``mapInPandas``
    — payload bytes enter Python once per batch, the resized bytes flow back
    as a binary column ready for the feature stage."""
    out_schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("modality", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("out_h", LongType(), False),
            StructField("out_w", LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": pdf["modality"],
                    "payload": [fake_resize(b, height, width) for b in pdf[payload_col]],
                    "out_h": height,
                    "out_w": width,
                }
            )

    return items.select("item_id", "modality", payload_col).mapInPandas(run, out_schema)


FRAME_BYTES = 64  # stand-in fixed frame size for the pseudo-container format


def sample_frames(items: DataFrame, every_n: int = 4, payload_col: str = "payload") -> DataFrame:
    """Video frame sampling as a row-EXPLODING ``mapInPandas``: each payload
    is treated as a sequence of fixed-size pseudo-frames (FRAME_BYTES chunks
    — a real demuxer slots in here) and every ``every_n``-th frame is emitted
    as its own row (item_id, frame_idx, frame).  This is the batch shape that
    matters for real video: one input row fans out to many output rows inside
    the same Arrow batch, without ever materializing all frames of all videos
    driver-side."""
    out_schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for item_id, b in zip(pdf["item_id"], pdf[payload_col]):
                raw = bytes(b)
                n_frames = max(1, (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES)
                for f in range(0, n_frames, every_n):
                    ids.append(item_id)
                    idxs.append(f)
                    frames.append(raw[f * FRAME_BYTES : (f + 1) * FRAME_BYTES])
            yield pd.DataFrame({"item_id": ids, "frame_idx": idxs, "frame": frames})

    return items.select("item_id", payload_col).mapInPandas(run, out_schema)


def items_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal item table from the documents table (text payloads
    encoded to bytes) — the stand-in source used by tests and queries."""
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
