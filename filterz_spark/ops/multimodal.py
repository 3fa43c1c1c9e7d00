"""Multimodal column plumbing — opaque binary payloads with typed metadata.

Images/audio/video are carried as ``binary`` columns next to a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
UDFs over ``mapInPandas``/``mapInArrow``. The actual codecs (PIL/ffmpeg) are
NOT in this container, so the decode step is STUBBED two ways:

- ``decode_image(..., fake=True)`` (default): a deterministic fake decoder —
  pixels derived from the payload bytes' hash — so the full Spark plumbing
  (schema, batching, partitioning, feature shape) is real and tested;
- ``fake=False``: raises NotImplementedError at the exact point a real codec
  would be called, with the dependency named.

Scale posture: binary payloads stay in Arrow buffers end-to-end (no base64,
no per-row Python on the bytes — numpy views); feature extraction is a
map-only pass, so it parallelizes with the scan and never shuffles.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

IMAGE_FEATURE_DIM = 16

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, width int, "
                "height int, duration_ms int")


def attach_media(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """Wrap a table into the multimodal shape: binary payload + typed
    metadata (here payload = utf-8 of a text column; stands in for real
    image/audio bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(payload_col), "UTF-8").alias("payload"),
        (F.pmod(F.xxhash64(payload_col), F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64(payload_col, F.lit(1)), F.lit(480)) + 32).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )


def _binary_views(arr: pa.Array):
    """(data uint8 view, offsets int64) for a non-null Binary/String array —
    zero-copy row slices straight off the Arrow values buffer (no per-row
    ``as_py()`` bytes materialization). Returns None when the layout isn't
    the plain offset/data form (caller falls back to the as_py loop)."""
    if arr.null_count or len(arr.buffers()) != 3 or arr.buffers()[2] is None:
        return None
    width = 8 if pa.types.is_large_binary(arr.type) or \
        pa.types.is_large_string(arr.type) else 4
    dtype = np.int64 if width == 8 else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=dtype)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, offsets


def _fake_decode(payload, out_dim: int) -> np.ndarray:
    """Deterministic fake decoder: feature vector from byte-content hashes.
    ``payload``: bytes or a uint8 numpy view."""
    arr = payload if isinstance(payload, np.ndarray) \
        else np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(out_dim, dtype=np.float32)
    pad = (-arr.size) % 8
    a64 = np.pad(arr, (0, pad)).view(np.uint64)
    z = a64 + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    buckets = np.zeros(out_dim, dtype=np.float64)
    np.add.at(buckets, (z % np.uint64(out_dim)).astype(np.int64), 1.0)
    return (buckets / max(a64.size, 1)).astype(np.float32)


def _decode_fn(fake: bool):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libjpeg, not present in "
                    "this container; run with fake=True for the deterministic "
                    "stub decoder"
                )
            ids = batch.column(0)
            payloads = batch.column(1)
            views = _binary_views(payloads)
            if views is not None:
                data, off = views
                feats = [_fake_decode(data[off[i]:off[i + 1]], IMAGE_FEATURE_DIM)
                         for i in range(len(payloads))]
            else:  # nulls / exotic layout: per-row fallback
                feats = [_fake_decode(p.as_py() or b"", IMAGE_FEATURE_DIM)
                         for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))],
                names=["media_id", "features"],
            )

    return fn


def decode_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, features array<float>) — Arrow-batched feature extraction."""
    return media.select("media_id", "payload").mapInArrow(
        _decode_fn(fake), "media_id long, features array<float>"
    )


RESIZE_SRC = 16  # fake-decoder source grid side (first SRC*SRC payload bytes)


def _resize_fn(out_h: int, out_w: int, fake: bool):
    if out_h <= 0 or out_w <= 0 or RESIZE_SRC % out_h or RESIZE_SRC % out_w:
        raise ValueError(f"out dims must divide {RESIZE_SRC}")
    bh, bw = RESIZE_SRC // out_h, RESIZE_SRC // out_w

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires decoding the payload first "
                    "(PIL/libjpeg, not present in this container); run with "
                    "fake=True to treat the payload bytes as the pixel grid"
                )
            ids = batch.column(0)
            payloads = batch.column(1)
            n = len(payloads)
            src = RESIZE_SRC * RESIZE_SRC
            views = _binary_views(payloads)
            if views is not None:
                # fully vectorized: gather the first src bytes of every
                # payload into one (n, src) matrix straight off the Arrow
                # values buffer (zero-padded via the validity mask)
                data, off = views
                lens = np.minimum(off[1:] - off[:-1], src)
                idx = off[:-1, None] + np.arange(src)[None, :]
                valid = np.arange(src)[None, :] < lens[:, None]
                safe = np.minimum(idx, max(data.size - 1, 0))
                grid = np.where(valid, data[safe] if data.size else 0,
                                0).astype(np.float64)
            else:  # nulls / exotic layout: per-row fallback
                grid = np.zeros((n, src), dtype=np.float64)
                for i, p in enumerate(payloads):
                    raw = np.frombuffer(p.as_py() or b"", dtype=np.uint8)[:src]
                    grid[i, : raw.size] = raw
            # area (box-filter) resample: each output pixel is the exact
            # mean of its bh x bw source block, so sum(out)*bh*bw ==
            # sum(source bytes) exactly — the oracle-checkable invariant
            small = (grid.reshape(n, out_h, bh, out_w, bw).mean(axis=(2, 4))
                     .astype(np.float32).reshape(n, out_h * out_w))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(small.tolist(), pa.list_(pa.float32()))],
                names=["media_id", "pixels"],
            )

    return fn


def resize_image(media: DataFrame, out_h: int = 8, out_w: int = 8,
                 fake: bool = True) -> DataFrame:
    """Area-resample the payload pixel grid to (out_h, out_w):
    (media_id, pixels array<float> of length out_h*out_w).

    Fake path treats the first ``RESIZE_SRC**2`` payload bytes as a
    zero-padded ``RESIZE_SRC x RESIZE_SRC`` grayscale grid (a real decoder
    would produce the grid from the codec instead — same downstream shape).
    Box averaging over integer-divisor blocks is EXACT in float (byte sums
    are < 2^24), so the resized sum reconstructs the source byte sum — a
    value-level oracle DuckDB can verify from the ascii codes of the text
    payload. Map-only Arrow pass: parallelizes with the scan, no shuffle.
    """
    return media.select("media_id", "payload").mapInArrow(
        _resize_fn(out_h, out_w, fake), "media_id long, pixels array<float>"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per sampled frame
    timestamp (plumbing real; frame decode stubbed like decode_image)."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
