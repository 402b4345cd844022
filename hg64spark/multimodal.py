"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Two formats decode FOR REAL, dependency-free (numpy/struct only): binary
PPM (P6) images and RIFF/WAVE 16-bit PCM audio — full encode+decode codecs
with spec-grammar parsing and corruption checks, oracle-gated end-to-end
(``multimodal_image_decode`` / ``multimodal_audio_decode``).  Formats that
need heavy libraries not present in this container (JPEG/PNG via Pillow,
compressed audio via soundfile, video demux) still raise
``NotImplementedError`` unless their library imports; the pipeline also
ships a deterministic fake feature extractor so the feature-stage plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is exercised for
every modality.  Swapping in a real heavy decoder changes one function.

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


# ---------------------------------------------------------- real codecs
#
# Two container-friendly formats get REAL dependency-free codecs (numpy +
# struct only), making the multimodal column end-to-end genuine: binary PPM
# (P6 — the netpbm spec's binary RGB form) and RIFF/WAVE PCM.  Every other
# format still dispatches to the optional heavy library and raises
# NotImplementedError when it is absent — the stub is now the fallback, not
# the path.


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 array -> binary PPM (P6) bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_ppm wants HxWx3, got {img.shape}")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 uint8 array.  Full header grammar: '#'
    comments anywhere in the header, any whitespace runs between tokens,
    exactly ONE whitespace byte after maxval before the raster (per the
    netpbm spec).  Corrupt input raises ValueError, never an index error."""
    buf = bytes(payload)
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (P6 magic missing)")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[pos : pos + 1]
        if c == b"#":
            nl = buf.find(b"\n", pos)
            pos = len(buf) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while end < len(buf) and buf[end : end + 1].isdigit():
                end += 1
            tokens.append(int(buf[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    w, h, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval} (1-byte samples only)")
    if pos >= len(buf) or not buf[pos : pos + 1].isspace():
        raise ValueError("PPM raster must start after ONE whitespace byte")
    pos += 1
    need = w * h * 3
    raster = buf[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"PPM raster truncated: want {need} bytes, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono/stereo array (n,) or (n, ch) -> RIFF/WAVE PCM bytes."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (sample_rate, int16 array (n, ch)).  Walks the
    chunk list (extra chunks like LIST/fact are skipped, per RIFF), supports
    16-bit PCM (format tag 1).  Corrupt input raises ValueError."""
    import struct

    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"WAV fmt chunk too short ({size} bytes)")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _brate, _block, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (tag={tag}, bits={bits})")
    if ch == 0:
        raise ValueError("WAV fmt declares 0 channels")
    arr = np.frombuffer(data[: len(data) - len(data) % (2 * ch)], dtype="<i2")
    return rate, arr.reshape(-1, ch)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWxC uint8 array.  PPM (P6) decodes
    natively (dependency-free, above); JPEG/PNG/WebP/... go through Pillow
    when it is installed (an optional dependency — not in the test
    container, where only the PPM path is exercised; the Pillow branch is
    covered by a skip-if-absent test)."""
    if bytes(payload[:2]) == b"P6":
        return decode_ppm(payload)
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "non-PPM image decode requires Pillow (optional dependency; "
            "pip install Pillow)"
        ) from e
    import io as _io

    img = Image.open(_io.BytesIO(bytes(payload)))
    # normalize to the same contract the PPM path has: HxWxC uint8,
    # C in {1, 3} (palette/alpha modes collapse to RGB; grayscale stays 1)
    if img.mode == "L":
        arr = np.asarray(img, dtype=np.uint8)[:, :, None]
    else:
        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
    return arr


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode audio to (sample_rate, waveform int16 [frames, channels]).
    RIFF/WAVE PCM decodes natively (dependency-free, above); FLAC/OGG/...
    go through soundfile when it is installed (optional dependency, same
    skip-if-absent test policy as :func:`decode_image`)."""
    if bytes(payload[:4]) == b"RIFF":
        return decode_wav(payload)
    try:
        import soundfile
    except ImportError as e:
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile (optional dependency; "
            "pip install soundfile)"
        ) from e
    import io as _io

    # int16 + always_2d matches the WAV path's (rate, [frames, channels])
    data, rate = soundfile.read(
        _io.BytesIO(bytes(payload)), dtype="int16", always_2d=True
    )
    return int(rate), data


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


# ------------------------------------------- synthesized codec round-trips
#
# The gate strategy for the real codecs: payloads are synthesized as a
# DETERMINISTIC closed-form function of item_id (below), encoded to real
# container bytes (PPM / WAV) in one Arrow-batched stage, then decoded by
# the real parsers in another — so a DuckDB oracle can predict the decoded
# stats (dimensions, integer pixel/amplitude sums) straight from item_id
# without ever touching bytes.  Any bug in either codec direction, the
# binary column plumbing, or the batch shape breaks the value hash.


def synth_image(d: int) -> np.ndarray:
    """Deterministic test image for id ``d``: (d%3+2) x (d%5+2) RGB with
    pixel[i] = (d*31 + i) % 256 in raster order."""
    w, h = d % 5 + 2, d % 3 + 2
    px = (np.int64(d) * 31 + np.arange(w * h * 3, dtype=np.int64)) % 256
    return px.astype(np.uint8).reshape(h, w, 3)


def synth_audio(d: int) -> tuple[int, np.ndarray]:
    """Deterministic mono waveform for id ``d``: rate 8000 + (d%3)*4000,
    n = d%50 + 10 samples, sample[i] = ((d*7 + i*13) % 2048) - 1024."""
    rate = 8000 + (d % 3) * 4000
    n = d % 50 + 10
    s = ((np.int64(d) * 7 + 13 * np.arange(n, dtype=np.int64)) % 2048) - 1024
    return rate, s.astype(np.int16)


def synth_items(docs: DataFrame, modality: str) -> DataFrame:
    """(doc_id) -> ITEM_SCHEMA-shaped items with REAL encoded payloads
    (binary PPM for ``image``, RIFF/WAVE PCM for ``audio``), one Arrow
    batch at a time.  NULL ids are excluded (no deterministic payload)."""
    if modality not in ("image", "audio"):
        raise ValueError(f"synth_items: unknown modality {modality!r}")
    out_schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("modality", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["item_id"].astype("int64")
            if modality == "image":
                payloads = [encode_ppm(synth_image(int(d))) for d in ids]
            else:
                waves = [synth_audio(int(d)) for d in ids]
                payloads = [encode_wav(wave, rate) for rate, wave in waves]
            yield pd.DataFrame({"item_id": ids, "modality": modality, "payload": payloads})

    src = docs.filter(F.col("doc_id").isNotNull()).select(
        F.col("doc_id").cast("long").alias("item_id")
    )
    return src.mapInPandas(run, out_schema)


def image_stats(items: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode each image payload with the REAL parser and emit
    (item_id, width, height, px_sum) — integer stats an oracle can verify
    exactly.  Arrow-batched; payload bytes enter Python once."""
    out_schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
            StructField("px_sum", LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, s = [], [], []
            for b in pdf[payload_col]:
                img = decode_image(b)
                w.append(img.shape[1])
                h.append(img.shape[0])
                s.append(int(img.astype(np.int64).sum()))
            yield pd.DataFrame(
                {"item_id": pdf["item_id"].astype("int64"), "width": w, "height": h, "px_sum": s}
            )

    return items.select("item_id", payload_col).mapInPandas(run, out_schema)


def audio_stats(items: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode each audio payload with the REAL parser and emit
    (item_id, sample_rate, n_samples, amp_sum) where amp_sum is the exact
    integer sum of absolute sample values."""
    out_schema = StructType(
        [
            StructField("item_id", LongType(), False),
            StructField("sample_rate", LongType(), False),
            StructField("n_samples", LongType(), False),
            StructField("amp_sum", LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            r, n, a = [], [], []
            for b in pdf[payload_col]:
                rate, wave = decode_audio(b)
                r.append(rate)
                n.append(wave.shape[0])
                a.append(int(np.abs(wave.astype(np.int64)).sum()))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"].astype("int64"),
                    "sample_rate": r,
                    "n_samples": n,
                    "amp_sum": a,
                }
            )

    return items.select("item_id", payload_col).mapInPandas(run, out_schema)


def items_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal item table from the documents table (text payloads
    encoded to bytes) — the stand-in source used by tests and queries."""
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
