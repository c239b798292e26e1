"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct.  The Spark-side plumbing — schema, Arrow batch shape, partitioning,
UDF signatures — is real and tested; the actual codec work is STUBBED
because no image/audio libraries exist in this environment:

- ``probe_media``: parses magic bytes deterministically (real);
- ``decode_image`` / ``decode_audio``: raise NotImplementedError unless a
  decoder backend (PIL / soundfile) is importable — clearly-marked stubs;
- ``fake_features``: deterministic stand-in feature extractor so the full
  pipeline (decode -> feature -> similarity) can be exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
    ]
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]

_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("detected_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def probe_one(blob: bytes) -> tuple[str, int, int]:
    """(detected_type, n_bytes, crc32) for one blob — module-level so the
    golden-fixture generator replays the EXACT kernel outside Spark."""
    import zlib

    b = bytes(blob)
    detected = "application/octet-stream"
    for magic, mt in _MAGIC:
        if b.startswith(magic):
            detected = mt
            break
    return detected, len(b), zlib.crc32(b)


def probe_media(df: DataFrame) -> DataFrame:
    """Deterministic media probe: magic-byte type sniff + size + crc."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, types_, sizes, sums = [], [], [], []
            for mid, blob in zip(batch["media_id"], batch["media"]):
                detected, n, crc = probe_one(blob)
                ids.append(int(mid))
                types_.append(detected)
                sizes.append(n)
                sums.append(crc)
            yield pd.DataFrame(
                {"media_id": ids, "detected_type": types_, "n_bytes": sizes,
                 "checksum": sums}
            )

    return df.select("media_id", "media").mapInPandas(run, schema=_PROBE_SCHEMA)


def _try_import_pil():
    try:  # pragma: no cover - not installed in this environment
        from PIL import Image

        return Image
    except ImportError:
        return None


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def image_features(df: DataFrame, dim: int = 64, use_decoder: bool = False) -> DataFrame:
    """media -> feature vectors.

    With ``use_decoder`` a real decoder backend is required
    (NotImplementedError otherwise — STUB: no codecs in this container).
    Default path: deterministic byte-histogram features, so downstream
    similarity/partitioning logic is exercised with the exact production
    batch shapes.
    """
    pil = _try_import_pil()
    if use_decoder and pil is None:
        raise NotImplementedError(
            "image decoding requires PIL; not available in this environment "
            "(stub per SURVEY.md — Spark plumbing is real, codec is not)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, feats = [], []
            for mid, blob in zip(batch["media_id"], batch["media"]):
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
                total = hist.sum()
                if total > 0:
                    hist /= total
                ids.append(int(mid))
                feats.append([float(x) for x in hist])
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select("media_id", "media").mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4, frame_bytes: int = 256) -> DataFrame:
    """Deterministic 'frame' sampling for video blobs: n evenly spaced byte
    windows (stand-in for keyframe extraction; windowing/partitioning
    logic matches what a real decoder would feed downstream)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(batch["media_id"], batch["media"]):
                b = bytes(blob)
                if not b:
                    continue
                step = max(1, (len(b) - frame_bytes) // max(1, n_frames - 1))
                for j in range(n_frames):
                    off = min(j * step, max(0, len(b) - frame_bytes))
                    ids.append(int(mid))
                    idxs.append(j)
                    frames.append(b[off : off + frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("media_id", "media").mapInPandas(run, schema=schema)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, max_side: int = 32, use_decoder: bool = False
) -> DataFrame:
    """media -> resized media + (width, height) metadata.

    With ``use_decoder`` a real decoder backend is required
    (NotImplementedError otherwise — STUB: no codecs in this container).
    Default path: the blob is treated as a square byte raster (side =
    floor(sqrt(len))) and box-downsampled with numpy to ``max_side`` —
    deterministic, so the full resize pipeline (binary in, smaller binary +
    typed dims out, Arrow both ways) is exercised with production batch
    shapes.
    """
    pil = _try_import_pil()
    if use_decoder and pil is None:
        raise NotImplementedError(
            "image resize requires PIL; not available in this environment "
            "(stub per SURVEY.md — Spark plumbing is real, codec is not)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, blobs, ws, hs = [], [], [], []
            for mid, blob in zip(batch["media_id"], batch["media"]):
                out, w, h = resize_one(blob, max_side)
                ids.append(int(mid))
                blobs.append(out)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"media_id": ids, "media": blobs, "width": ws, "height": hs}
            )

    return df.select("media_id", "media").mapInPandas(run, schema=_RESIZE_SCHEMA)


def resize_one(blob: bytes, max_side: int = 32) -> tuple[bytes, int, int]:
    """(resized_bytes, width, height) for one blob — module-level so the
    golden-fixture generator replays the EXACT kernel outside Spark.

    Box filter uses INTEGER sums + floor division (not float mean ->
    uint8 cast): bit-identical on every platform/BLAS, which the
    golden-CRC oracle depends on."""
    b = np.frombuffer(bytes(blob), dtype=np.uint8)
    side = max(1, int(len(b) ** 0.5))
    raster = b[: side * side].reshape(side, side)
    if side > max_side:
        # box filter: average over ceil(side/max_side) blocks
        f = -(-side // max_side)
        pad = (-side) % f
        if pad:
            raster = np.pad(raster, ((0, pad), (0, pad)), mode="edge")
        s = raster.shape[0] // f
        sums = raster.reshape(s, f, s, f).astype(np.uint32).sum(axis=(1, 3))
        raster = (sums // (f * f)).astype(np.uint8)
    return raster.tobytes(), int(raster.shape[1]), int(raster.shape[0])


def synthetic_media_rows(n: int = 64) -> list[tuple[int, bytes, str]]:
    """Deterministic fake media rows (shared by the Spark table and the
    golden-fixture generator)."""
    rows = []
    magics = [b"\x89PNG\r\n", b"\xff\xd8\xff\xe0", b"RIFF....WAVE", b"\x00\x00\x00 ftypmp42"]
    types_ = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    for i in range(n):
        body = bytes((i * 7 + j) % 256 for j in range(512 + (i % 5) * 128))
        rows.append((i, magics[i % 4] + body, types_[i % 4]))
    return rows


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks (doc_id-keyed
    blobs with recognizable magic bytes)."""
    return spark.createDataFrame(synthetic_media_rows(n), schema=MEDIA_SCHEMA)
