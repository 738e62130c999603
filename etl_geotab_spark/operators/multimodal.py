"""Multimodal columns (SURVEY.md §2.9 X4): media as opaque binary +
typed metadata, processed with Arrow-batched ``mapInPandas``.

Pattern at 100 TB: media bytes live in a ``binary`` column (or a path
column resolved lazily); metadata (codec, dims, duration) is a typed
struct so Catalyst can prune/filter WITHOUT touching the bytes.
Decode/resize/feature-extract run as ``mapInPandas`` stages — Arrow
moves each partition batch to Python once, the per-item work is
vectorized, and the output schema is declared so downstream stays
relational.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernel is a clearly-marked deterministic fake: media is
synthesized in a tiny self-describing format (``FAKE`` header + dims +
payload derived from a seed) and "decoding" parses that header. The
Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and is what these operators test. Swap ``_decode_fake`` for a
PIL/ffmpeg call to productionize; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"FAKE"  # synthetic media container: FAKE | kind | w | h | payload


class UndecodableMediaError(NotImplementedError):
    """One stable exception for every blob the codec stack cannot
    decode — whether the codec is unavailable in this environment
    (no Pillow) or the bytes are garbage. Subclasses
    NotImplementedError so the original documented stub contract
    (catch NotImplementedError) keeps working in both environments."""


# ----------------------------------------------------------- synthesis


def synthesize_media(
    df: DataFrame, id_col: str, seed_col: str, kind: str = "image"
) -> DataFrame:
    """Attach a deterministic synthetic media column (binary) + typed
    metadata struct. Stands in for ``spark.read.format('binaryFile')``
    — downstream operators only see (bytes, metadata), so swapping in
    real files is transparent."""
    kind_code = {"image": 1, "audio": 2, "video": 3}[kind]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # zip over plain columns, not pdf.iterrows(): iterrows builds a
        # pandas Series per row — the slowest iteration path (r1 ADVICE)
        for pdf in batches:
            out_rows = []
            for rid, seed_val in zip(pdf[id_col], pdf[seed_col]):
                seed = hashlib.sha256(str(seed_val).encode()).digest()
                w = 16 + seed[0] % 48
                h = 16 + seed[1] % 48
                payload = (seed * ((w * h) // len(seed) + 1))[: w * h]
                blob = _MAGIC + struct.pack("<BHH", kind_code, w, h) + payload
                out_rows.append(
                    {
                        id_col: rid,
                        "media": blob,
                        "media_kind": kind,
                        "media_bytes": len(blob),
                    }
                )
            yield pd.DataFrame(out_rows)

    schema = StructType(
        [
            df.select(id_col).schema.fields[0],
            StructField("media", BinaryType()),
            StructField("media_kind", StringType()),
            StructField("media_bytes", LongType()),
        ]
    )
    return df.select(id_col, seed_col).mapInPandas(gen, schema)


# -------------------------------------------------------------- decode


DECODED_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
        # exact integer byte-sum: the cross-engine-checkable stat (no
        # float rounding ties), mean = intensity_sum / (width*height)
        StructField("intensity_sum", LongType()),
        StructField("histogram", ArrayType(DoubleType())),
    ]
)


# Real-codec feature gate: when Pillow is present (production image),
# non-FAKE blobs decode through it; in this container it is absent and
# only the synthetic container decodes. Probed once at import.
try:  # pragma: no cover - environment probe
    from PIL import Image as _PILImage  # noqa: N813

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def _decode_real(blob: bytes) -> tuple[int, int, np.ndarray]:
    """PIL-backed decode for real image bytes (PNG/JPEG/...). Grayscale
    ('L') so the pixel array contract matches the stub codec: bytes in
    → (w, h, uint8 pixel array) out. Only reachable when HAS_PIL.
    Undecodable bytes raise UndecodableMediaError (the same class the
    no-PIL path raises — callers quarantine bad rows with ONE except
    clause in every environment)."""
    import io as _io

    try:
        img = _PILImage.open(_io.BytesIO(blob)).convert("L")
    except Exception as e:  # UnidentifiedImageError, truncated data, ...
        raise UndecodableMediaError(
            f"undecodable media blob ({len(blob)} bytes): {e}"
        ) from e
    w, h = img.size
    return w, h, np.asarray(img, dtype=np.uint8).reshape(-1)


def _decode_fake(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Codec dispatch: FAKE container → header parse (deterministic
    stub, always available); anything else → PIL when installed
    (HAS_PIL), else UndecodableMediaError (also raised by the PIL path
    on garbage bytes — ONE failure class in every environment). The
    operator contract (bytes in → (w, h, pixel array) out) is identical
    on every path — swapping containers/codecs changes nothing
    downstream."""
    if blob[:4] != _MAGIC:
        if HAS_PIL:
            return _decode_real(blob)
        raise UndecodableMediaError(
            "real media decode requires PIL/ffmpeg (not in this container); "
            "only the FAKE synthetic container is decodable here"
        )
    _kind, w, h = struct.unpack("<BHH", blob[4:9])
    pixels = np.frombuffer(blob[9 : 9 + w * h], dtype=np.uint8)
    return w, h, pixels


def decode_media(df: DataFrame, id_col: str, media_col: str = "media") -> DataFrame:
    """Decode each blob to (dims, mean intensity, 16-bin byte
    histogram). One Arrow round-trip per partition batch; the numpy
    work is vectorized per item. Histogram is density-normalized so
    results are resolution-independent."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode is inherently per-item; iterate via zip over the two
        # needed columns (not iterrows — r1 ADVICE)
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                w, h, px = _decode_fake(blob)
                hist = np.histogram(px, bins=16, range=(0, 256))[0]
                rows.append(
                    {
                        "id": str(rid),
                        "width": w,
                        "height": h,
                        "mean_intensity": round(float(px.mean()), 6),
                        "intensity_sum": int(px.sum()),
                        "histogram": (hist / max(len(px), 1)).round(6).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, DECODED_SCHEMA)


def resize_media(
    df: DataFrame, id_col: str, width: int, height: int, media_col: str = "media"
) -> DataFrame:
    """Resize plumbing: decode → (stub) nearest-neighbor downsample →
    re-encode into the same container. Output schema mirrors the input
    so resize stages compose."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                w, h, px = _decode_fake(blob)
                grid = px[: w * h].reshape(h, w) if len(px) >= w * h else None
                if grid is None:
                    continue
                ys = np.linspace(0, h - 1, height).astype(int)
                xs = np.linspace(0, w - 1, width).astype(int)
                small = grid[np.ix_(ys, xs)]
                out = (
                    _MAGIC
                    + struct.pack("<BHH", 1, width, height)
                    + small.tobytes()
                )
                rows.append(
                    {
                        "id": str(rid),
                        "media": out,
                        "media_kind": "image",
                        "media_bytes": len(out),
                    }
                )
            yield pd.DataFrame(rows)

    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("media", BinaryType()),
            StructField("media_kind", StringType()),
            StructField("media_bytes", LongType()),
        ]
    )
    return df.mapInPandas(kernel, schema)


# -------------------------------------------------------- frame sampling


def sample_frames(
    df: DataFrame,
    id_col: str,
    duration_ms_col: str,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.
    Pure Spark (sequence + explode — no Python), because the frame
    *schedule* is metadata math; only the frame *decode* (downstream,
    decode_media) needs the media bytes. At 100 TB this matters: the
    explode multiplies rows BEFORE the expensive decode, so Spark can
    repartition the frame workload evenly."""
    n_frames = (F.col(duration_ms_col) / every_ms).cast("int")
    return (
        df.where(F.col(duration_ms_col) > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
        )
        .withColumn("frame_ms", F.col("frame_idx") * every_ms)
        .where(F.col("frame_ms") <= F.col(duration_ms_col))
    )
