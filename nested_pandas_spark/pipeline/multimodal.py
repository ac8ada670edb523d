"""Multimodal (image/audio/video) column handling.

Policy: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside. All Spark-side plumbing (schemas, batching, partitioning,
UDF signatures) is real and tested. Codecs come in two tiers:

* **Real decoders** for uncompressed formats parseable with stdlib
  ``struct`` + NumPy — 24-bit BMP and binary PPM (P6) images
  (:func:`decode_bmp` / :func:`decode_ppm`), and RIFF/WAVE PCM-16 audio
  (:func:`decode_wav`). ``decode_image`` / ``audio_features`` sniff the
  payload magic and use these automatically — a real end-to-end decode
  path, oracle-checkable with deterministic synthetic payloads.
* **Stubs** for the remaining compressed formats (WebP/MP4/...) whose codec
  libraries (PIL/ffmpeg) are not in this container: strict mode raises
  ``NotImplementedError``; non-strict produces a deterministic md5 fake,
  clearly marked.

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
    "decode_bmp",
    "decode_ppm",
    "decode_wav",
    "decode_y4m",
    "decode_image",
    "encode_image",
    "image_features",
    "resize_image",
    "sample_video_frames",
    "audio_features",
    "audio_spectrum",
    "audio_fingerprint",
    "encode_wav",
    "audio_near_pairs",
    "phash_df",
    "image_near_pairs",
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


def _widen(df: DataFrame) -> DataFrame:
    """Parallelism rescue before a CPU-bound Python codec boundary.

    Codec work (Huffman, DCT, zlib, FFT) costs milliseconds per row; a
    small parquet input arrives as ONE split, so the whole decode pass
    would run single-threaded. Delegates to the shared
    ``_ensure_parallelism`` heuristic: round-robin repartition only when
    the scan yields fewer splits than half the cores — at real scale the
    files split naturally and this is a no-op, preserving the module's
    payloads-never-shuffle property where it matters. Streaming frames
    and in-memory relations are left untouched."""
    from .dedup import _ensure_parallelism

    return _ensure_parallelism(df)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder: uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB.

    Pure stdlib ``struct`` + NumPy — no codec library. Handles the
    standard layout: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
    (>=40 bytes), bottom-up or top-down rows, 4-byte row padding, BGR
    channel order (converted to RGB). Raises ``ValueError`` for anything
    else (compressed/paletted BMPs need a real codec library).
    """
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP (header={hdr_size} bpp={bpp} compression={comp}); "
            "only uncompressed 24-bit BMP decodes without a codec library"
        )
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_size = (w * 3 + 3) // 4 * 4
    need = data_off + row_size * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")
    arr = np.frombuffer(payload, dtype=np.uint8, count=row_size * h,
                        offset=data_off)
    arr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        arr = arr[::-1]
    return arr[..., ::-1].copy()  # BGR -> RGB


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decoder: binary PPM (``P6``, maxval <= 255) -> (h, w, 3) uint8
    RGB. Pure parsing — header is ASCII tokens (with ``#`` comments),
    pixel data is raw interleaved RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        ch = payload[pos:pos + 1]
        if ch.isspace():
            pos += 1
        elif ch == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (maxval={maxval}, {w}x{h})")
    pos += 1  # single whitespace after maxval
    need = pos + w * h * 3
    if len(payload) < need:
        raise ValueError(f"truncated PPM: need {need} bytes, have {len(payload)}")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder: RIFF/WAVE -> (mono float64 samples in [-1, 1],
    sample_rate). Handles integer PCM at 8 (unsigned) / 16 / 24 / 32
    bits, IEEE float at 32 / 64 bits, and WAVE_FORMAT_EXTENSIBLE
    wrappers of either. Multi-channel input is mixed down by averaging.

    Pure stdlib ``struct`` + NumPy chunk walk (``fmt `` then ``data``);
    raises ``ValueError`` for compressed codecs (ADPCM/mp3/... need a
    codec library).
    """
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_channels, sample_rate, bits, fmt, data = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt, n_channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt == 0xFFFE and size >= 40:  # EXTENSIBLE: real fmt in GUID
                fmt = struct.unpack_from("<H", body, 24)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are 2-byte aligned
    if n_channels is None or data is None or fmt is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt == 1:  # integer PCM
        if bits == 8:  # 8-bit PCM is UNSIGNED with 128 midpoint
            samples = (
                np.frombuffer(data, np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 16:
            samples = np.frombuffer(
                data, "<i2", count=len(data) // 2
            ).astype(np.float64) / 32768.0
        elif bits == 24:
            n = len(data) // 3
            b = np.frombuffer(data, np.uint8, n * 3).reshape(n, 3)
            raw = (
                b[:, 0].astype(np.int64)
                | (b[:, 1].astype(np.int64) << 8)
                | (b[:, 2].astype(np.int64) << 16)
            )
            raw -= (raw >> 23) << 24  # sign-extend
            samples = raw.astype(np.float64) / 8388608.0
        elif bits == 32:
            samples = np.frombuffer(
                data, "<i4", count=len(data) // 4
            ).astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported WAV PCM bit width {bits}")
    elif fmt == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(
                data, "<f4", count=len(data) // 4
            ).astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(data, "<f8", count=len(data) // 8).copy()
        else:
            raise ValueError(f"unsupported WAV float bit width {bits}")
    else:
        raise ValueError(
            f"unsupported WAV (format={fmt} bits={bits}); compressed "
            "codecs need a codec library"
        )
    if n_channels > 1:
        n = len(samples) // n_channels * n_channels
        samples = samples[:n].reshape(-1, n_channels).mean(axis=1)
    return samples, sample_rate


def decode_y4m(payload: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """REAL decoder: YUV4MPEG2 (.y4m) uncompressed video -> (list of
    per-frame luma planes as (h, w) uint8 arrays, (width, height)).

    Y4M is the standard uncompressed interchange format (ffmpeg/mjpegtools)
    and is pure-parseable: an ASCII header line (``YUV4MPEG2 W.. H.. F..
    [C..]``), then per frame a ``FRAME`` line followed by raw planes.
    Supported colorspaces: ``Cmono`` (luma only), ``C420*`` (4:2:0),
    ``C422``, ``C444`` — chroma planes are skipped, the luma plane is the
    frame. Raises ``ValueError`` otherwise.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = None
    cspace = "420"
    for tok in payload[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            cspace = val.decode("ascii", "replace")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cspace.startswith("mono"):
        chroma = 0
    elif cspace.startswith("420"):
        chroma = 2 * ((w // 2) * (h // 2))
    elif cspace.startswith("422"):
        chroma = 2 * ((w // 2) * h)
    elif cspace.startswith("444"):
        chroma = 2 * (w * h)
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cspace}")
    frames, pos = [], nl + 1
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        pos = fnl + 1
        if pos + w * h > len(payload):
            raise ValueError("truncated Y4M frame data")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
            .reshape(h, w)
            .copy()
        )
        pos += w * h + chroma
    return frames, (w, h)


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

    REAL decode paths, sniffed by payload magic: 24-bit BMP (``BM``) and
    binary PPM (``P6``) via :func:`decode_bmp` / :func:`decode_ppm`;
    JPEG (``FF D8 FF``, baseline AND progressive) via the pure-NumPy
    codec in :mod:`~nested_pandas_spark.pipeline.jpeg` (Huffman + IDCT,
    ImageIO-cross-validated); PNG (``89 50 4E 47``, incl. Adam7 and
    1/2/4-bit depths) via the stdlib-zlib codec in
    :mod:`~nested_pandas_spark.pipeline.png`. Actual image dimensions
    are used — ``height``/``width``/``channels`` apply only to the stub
    path. Remaining formats (GIF, WebP, ...) need a codec library not
    in this container: ``strict=True`` raises ``NotImplementedError``
    for them, ``strict=False`` produces the deterministic md5 fake.

    Output schema: ``out_col: array<int>`` (h*w*c flattened, row-major
    RGB) plus pass-through columns minus the payload (dropped immediately
    after decode — payload bytes never travel further down the plan).
    """
    keep = [c for c in df.columns if c != payload_col]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.ArrayType(T.IntegerType()))])

    def _decode_one(p) -> list | None:
        if p is None:
            return None
        payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
        if payload[:2] == b"BM":
            return decode_bmp(payload).ravel().tolist()
        if payload[:2] == b"P6":
            return decode_ppm(payload).ravel().tolist()
        if payload[:3] == b"\xff\xd8\xff":
            from .jpeg import decode_jpeg

            return decode_jpeg(payload).ravel().tolist()
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            from .png import decode_png

            return decode_png(payload).ravel().tolist()
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import decode_gif

            return decode_gif(payload).ravel().tolist()
        if strict:
            raise NotImplementedError(
                "only BMP/PPM/JPEG/PNG/GIF decode without a codec "
                "library (PIL/cv2 not present); run with strict=False "
                "for the deterministic stub"
            )
        return _fake_pixels(payload, height, width, channels).ravel().tolist()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = [_decode_one(p) for p in pdf[payload_col]]
            yield out

    return _widen(df).mapInPandas(gen, schema=out_schema)


def encode_image(
    df: DataFrame,
    pixels_col: str = "pixels",
    out_col: str = "payload",
    height: int = 8,
    width: int = 8,
    channels: int = 3,
    format: str = "png",
    quality: int = 85,
    subsampling: str = "444",
    drop_pixels: bool = True,
) -> DataFrame:
    """Encode a decoded flat pixel array back into a REAL compressed
    payload — the sink half of the media loop (decode -> transform ->
    encode): thumbnail materialization, re-encoding after resize, or
    normalizing a mixed-format corpus to one codec.

    ``format``: ``'png'`` (lossless, stdlib zlib —
    :func:`~nested_pandas_spark.pipeline.png.encode_png`) or ``'jpeg'``
    (baseline, quality/subsampling apply —
    :func:`~nested_pandas_spark.pipeline.jpeg.encode_jpeg`). The pixel
    array must hold ``height*width*channels`` values (row-major RGB /
    grayscale, the :func:`decode_image` layout). NULL pixels -> NULL
    payload. Arrow-batched ``mapInPandas``, same scale shape as decode:
    payloads are produced at the very end, never shuffled."""
    if format not in ("png", "jpeg"):
        raise ValueError(f"format must be 'png' or 'jpeg', got {format!r}")
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    from .jpeg import encode_jpeg
    from .png import encode_png

    keep = [c for c in df.columns if c != pixels_col or not drop_pixels]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.BinaryType())])
    n = height * width * channels

    def _encode_one(px) -> bytes | None:
        if px is None:
            return None
        arr = np.asarray(px, dtype=np.int64)
        if arr.size != n:
            raise ValueError(
                f"pixel array has {arr.size} values, expected "
                f"{height}x{width}x{channels} = {n}"
            )
        img = np.clip(arr, 0, 255).astype(np.uint8).reshape(height, width, channels)
        if format == "png":
            return encode_png(img)
        return encode_jpeg(img, quality=quality, subsampling=subsampling)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = [_encode_one(p) for p in pdf[pixels_col]]
            yield out

    return _widen(df).mapInPandas(gen, schema=out_schema)


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

    REAL for YUV4MPEG2 (``.y4m``) payloads: frames decode genuinely via
    :func:`decode_y4m`, ``n_frames`` are sampled evenly across the clip
    (``frame_idx j*total//n_frames``, fewer when the clip is shorter),
    and each sampled frame's luma plane is the pixel array. Compressed
    formats (MP4/WebM/...) need ffmpeg: ``strict=True`` raises,
    ``strict=False`` produces the deterministic md5 fake. Either way the
    output shape — a nested column of per-frame structs — flows into
    every nested operator in this engine (query/explode/map_rows).
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

    def _luma_planes(payload: bytes) -> list[np.ndarray] | None:
        if payload.startswith(b"YUV4MPEG2"):
            planes, _wh = decode_y4m(payload)
            return planes
        if payload[:6] in (b"GIF87a", b"GIF89a"):  # animated GIF as video
            from .gif import decode_gif_frames

            out = []
            for rgba, _delay in decode_gif_frames(payload):
                rgb = rgba[..., :3].astype(np.float64)
                luma = (
                    0.299 * rgb[..., 0]
                    + 0.587 * rgb[..., 1]
                    + 0.114 * rgb[..., 2]
                )
                out.append(np.clip(np.round(luma), 0, 255).astype(np.uint8))
            return out
        return None

    def _frames_of(p) -> list | None:
        if p is None:
            return None
        payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
        planes = _luma_planes(payload)
        if planes is not None:
            total = len(planes)
            idxs = sorted({j * total // n_frames for j in range(n_frames)
                           if total > 0})
            return [
                {"frame_idx": i, "pixels": planes[i].ravel().tolist()}
                for i in idxs
            ]
        if strict:
            raise NotImplementedError(
                "only YUV4MPEG2 (.y4m) and animated GIF decode without "
                "ffmpeg; run with strict=False for the deterministic stub"
            )
        return [
            {
                "frame_idx": i,
                "pixels": _fake_pixels(payload + bytes([i]), 4, 4, 1)
                .ravel()
                .tolist(),
            }
            for i in range(n_frames)
        ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out["frames"] = [_frames_of(p) for p in pdf[payload_col]]
            yield out

    return _widen(df).mapInPandas(gen, schema=out_schema)


def audio_features(
    df: DataFrame, payload_col: str = "payload", strict: bool = False
) -> DataFrame:
    """Audio features (rms, zero-crossing rate) per payload.

    REAL for RIFF/WAVE PCM-16 payloads: samples decode genuinely via
    :func:`decode_wav` (normalized to [-1, 1), multi-channel mixed down).
    Other formats need an audio codec library: ``strict=True`` raises for
    them, ``strict=False`` treats the raw bytes as crude uint8 samples
    (the deterministic stub the q104 gate exercises).
    """
    keep = [c for c in df.columns if c != payload_col]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(
        fields
        + [T.StructField("rms", T.DoubleType()), T.StructField("zcr", T.DoubleType())]
    )

    def _features(p) -> tuple[float | None, float | None]:
        if p is None:
            return None, None
        payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            x, _rate = decode_wav(payload)
        elif strict:
            raise NotImplementedError(
                "only RIFF/WAVE PCM-16 decodes without a codec library; "
                "run with strict=False for the raw-bytes stub"
            )
        else:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 127.5
        rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
        zcr = float(np.mean(np.diff(np.sign(x)) != 0)) if len(x) > 1 else 0.0
        return rms, zcr

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_features(p) for p in pdf[payload_col]]
            out = pdf[keep].copy()
            out["rms"] = [f[0] for f in feats]
            out["zcr"] = [f[1] for f in feats]
            yield out

    return _widen(df).mapInPandas(gen, schema=out_schema)


def audio_spectrum(
    df: DataFrame,
    payload_col: str = "payload",
    strict: bool = False,
    n_fft: int | None = None,
) -> DataFrame:
    """Frequency-domain audio features per payload via a real rFFT.

    Decodes like :func:`audio_features` (REAL for RIFF/WAVE PCM;
    ``strict=True`` raises on other formats, ``strict=False`` falls back
    to the raw-uint8 stub with an assumed 8 kHz rate), then NumPy
    ``rfft`` over the first ``n_fft`` samples (zero-padded; default the
    whole clip):

    * ``dominant_bin`` — argmax of the magnitude spectrum excluding DC,
    * ``dominant_hz``  — that bin scaled to Hz (``bin * rate / N``),
    * ``centroid_hz``  — magnitude-weighted mean frequency.

    Arrow-batched ``mapInPandas``; payloads never shuffle — the
    embarrassing-parallel shape of every decode stage here. Empty/NULL
    payloads yield NULL features.
    """
    keep = [c for c in df.columns if c != payload_col]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("dominant_bin", T.LongType()),
            T.StructField("dominant_hz", T.DoubleType()),
            T.StructField("centroid_hz", T.DoubleType()),
        ]
    )

    def _spectrum(p):
        if p is None:
            return None, None, None
        payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            x, rate = decode_wav(payload)
        elif strict:
            raise NotImplementedError(
                "only RIFF/WAVE PCM decodes without a codec library; "
                "run with strict=False for the raw-bytes stub"
            )
        else:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 127.5
            rate = 8000
        n = n_fft or len(x)
        if n < 2 or len(x) == 0:
            return None, None, None
        if len(x) < n:
            x = np.pad(x, (0, n - len(x)))
        mag = np.abs(np.fft.rfft(x[:n]))
        k = int(np.argmax(mag[1:])) + 1  # skip DC
        freqs = np.arange(len(mag)) * (rate / n)
        total = float(mag.sum())
        centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
        return k, float(k * rate / n), centroid

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_spectrum(p) for p in pdf[payload_col]]
            out = pdf[keep].copy()
            out["dominant_bin"] = pd.array(
                [f[0] for f in feats], dtype="Int64"
            )
            out["dominant_hz"] = [f[1] for f in feats]
            out["centroid_hz"] = [f[2] for f in feats]
            yield out

    return _widen(df).mapInPandas(gen, schema=out_schema)


def _grid_gray_sql(
    pixels_col: str, j: str, in_h: int, in_w: int, channels: int,
    grid_h: int, grid_w: int,
) -> str:
    """SQL for the integer grayscale value of grid sample ``j`` (row-major
    over a ``grid_h x grid_w`` nearest-neighbor sampling of the source):
    gray = SUM of the channel bytes (monotone-equivalent to the mean, so
    thresholds/comparisons are unchanged and everything stays integer)."""
    sy = f"(({j}) DIV {grid_w}) * {in_h} DIV {grid_h}"
    sx = f"(({j}) % {grid_w}) * {in_w} DIV {grid_w}"
    idx = f"((({sy}) * {in_w} + ({sx})) * {channels})"
    return " + ".join(
        f"element_at({pixels_col}, CAST({idx} + {c + 1} AS INT))"
        for c in range(channels)
    )


def phash_df(
    df: DataFrame,
    pixels_col: str = "pixels",
    in_height: int = 8,
    in_width: int = 8,
    channels: int = 3,
    method: str = "ahash",
    hash_h: int = 8,
    hash_w: int = 8,
    out: str = "phash",
) -> DataFrame:
    """Perceptual image hash (64-bit aHash or dHash) from a decoded flat
    pixel array — pure integer JVM HOFs: no Python, no floats.

    * ``ahash`` (average hash): sample an ``hash_h x hash_w`` grid
      (nearest-neighbor, the :func:`resize_image` convention), bit ``j`` =
      1 iff sample ``j`` is brighter than the grid mean. The threshold is
      evaluated as ``sample * n_bits > total`` — exact integer arithmetic,
      so any SQL engine replays the hash bit-for-bit.
    * ``dhash`` (difference hash): sample ``hash_h x (hash_w+1)``, bit
      ``(y, x)`` = 1 iff ``g(y, x) > g(y, x+1)`` — the gradient-direction
      variant, robust to global brightness shifts.

    Grayscale is the channel SUM (monotone-equivalent to the mean for
    both comparisons). Bits OR-accumulate into one BIGINT (never an
    additive overflow at bit 63). NULL pixels -> NULL hash. The staged
    sample array is let-bound so a caller filtering on the hash can't
    trigger the per-position re-evaluation blow-up.
    """
    from ..operators.timeseries import _let_sql

    n_bits = hash_h * hash_w
    if n_bits > 64:
        raise ValueError(f"hash_h*hash_w must be <= 64, got {n_bits}")
    if method not in ("ahash", "dhash"):
        raise ValueError(f"method must be 'ahash' or 'dhash', got {method!r}")
    grid_w = hash_w + 1 if method == "dhash" else hash_w
    n_samples = hash_h * grid_w
    sampled = (
        f"transform(sequence(0, {n_samples - 1}), __j -> "
        + _grid_gray_sql(pixels_col, "__j", in_height, in_width, channels,
                         hash_h, grid_w)
        + ")"
    )
    bit = "shiftleft(CAST(1 AS BIGINT), __b)"
    zero = "CAST(0 AS BIGINT)"
    if method == "ahash":
        pred = f"element_at(__s, CAST(__b + 1 AS INT)) * {n_bits} > __tot"
        body = _let_sql(
            f"aggregate(__s, {zero}, (__a, __v) -> __a + __v)",
            "__tot",
            f"aggregate(sequence(0, {n_bits - 1}), {zero}, (__a, __b) -> "
            f"__a | (CASE WHEN {pred} THEN {bit} ELSE {zero} END))",
        )
    else:
        left = f"element_at(__s, CAST(__b DIV {hash_w} * {grid_w} + __b % {hash_w} + 1 AS INT))"
        right = f"element_at(__s, CAST(__b DIV {hash_w} * {grid_w} + __b % {hash_w} + 2 AS INT))"
        body = (
            f"aggregate(sequence(0, {n_bits - 1}), {zero}, (__a, __b) -> "
            f"__a | (CASE WHEN {left} > {right} THEN {bit} ELSE {zero} END))"
        )
    sql = _let_sql(sampled, "__s", body)
    return df.withColumn(
        out,
        F.when(F.col(pixels_col).isNull(), F.lit(None).cast("long"))
        .otherwise(F.expr(sql)),
    )


def image_near_pairs(
    df: DataFrame,
    id_col: str,
    pixels_col: str = "pixels",
    in_height: int = 8,
    in_width: int = 8,
    channels: int = 3,
    method: str = "ahash",
    max_hamming: int = 3,
    block_bits: int = 16,
    hash_h: int = 8,
    hash_w: int = 8,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the multimodal twin of text SimHash dedup: :func:`phash_df` computes
    a 64-bit aHash/dHash per row (pure-JVM projection), then the shared
    pigeonhole block join
    (:func:`~nested_pandas_spark.pipeline.dedup.hamming_near_pairs`)
    pairs candidates on block equality — never all-pairs, and only
    (id, hash) ever shuffles; pixel arrays and payloads stay put.

    Output ``(id_a, id_b, hamming)`` with ``id_a < id_b``, exact within
    ``max_hamming`` (requires ``max_hamming < 64/block_bits`` blocks).
    """
    from .dedup import hamming_near_pairs

    hashed = phash_df(
        df, pixels_col, in_height, in_width, channels, method,
        hash_h, hash_w, out="__ph",
    ).select(F.col(id_col), F.col("__ph"))
    return hamming_near_pairs(
        hashed, id_col, "__ph", bits=hash_h * hash_w,
        max_hamming=max_hamming, block_bits=block_bits,
    )


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    frame: int = 512,
    n_frames: int = 33,
    strict: bool = False,
    out: str = "afp",
) -> DataFrame:
    """Energy-delta acoustic fingerprint: ``n_frames - 1`` bits, bit j
    set iff frame j+1 carries more energy than frame j (the classic
    Haitsma-Kalker 2002 shape reduced to one band — robust to gain
    because energy ORDER survives amplitude scaling). Defaults produce
    a 32-bit fingerprint ready for :func:`audio_near_pairs` /
    ``dedup.hamming_near_pairs``.

    Decodes like :func:`audio_features` (REAL RIFF/WAVE PCM;
    ``strict=True`` raises on other formats, ``strict=False`` uses the
    raw-uint8 stub). Clips shorter than ``frame * n_frames`` samples
    zero-pad (missing frames have zero energy). Arrow-batched
    ``mapInPandas``; payloads never shuffle. NULL payload -> NULL."""
    if frame < 1 or n_frames < 2:
        raise ValueError("need frame >= 1 and n_frames >= 2")
    keep = [c for c in df.columns if c != payload_col]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(fields + [T.StructField(out, T.LongType())])
    need = frame * n_frames

    def _fp(p):
        if p is None:
            return None
        payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            x, _rate = decode_wav(payload)
        elif strict:
            raise NotImplementedError(
                "only RIFF/WAVE PCM decodes without a codec library; "
                "run with strict=False for the raw-bytes stub"
            )
        else:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 127.5
        if len(x) < need:
            x = np.pad(x, (0, need - len(x)))
        e = (x[:need].reshape(n_frames, frame) ** 2).sum(axis=1)
        bits = e[1:] > e[:-1]
        return int(sum(1 << j for j, b in enumerate(bits) if b))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o = pdf[keep].copy()
            o[out] = pd.array(
                [_fp(p) for p in pdf[payload_col]], dtype="Int64"
            )
            yield o

    return _widen(df).mapInPandas(gen, schema=out_schema)


def audio_near_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    *,
    frame: int = 512,
    n_frames: int = 33,
    strict: bool = False,
    max_hamming: int = 3,
    block_bits: int = 8,
) -> DataFrame:
    """Acoustic near-duplicate pairs: :func:`audio_fingerprint` then the
    shared pigeonhole Hamming blocking (``dedup.hamming_near_pairs``) —
    the same compose as image ``phash_df`` + ``image_near_pairs``, so
    every modality's near-dup path ends in one bucket join, never
    all-pairs."""
    from .dedup import hamming_near_pairs

    fp = audio_fingerprint(
        df.select(id_col, payload_col), payload_col,
        frame=frame, n_frames=n_frames, strict=strict, out="__afp",
    )
    return hamming_near_pairs(
        fp, id_col, "__afp", bits=n_frames - 1,
        max_hamming=max_hamming, block_bits=block_bits,
    )


def encode_wav(
    df: DataFrame,
    samples_col: str = "samples",
    out_col: str = "payload",
    sample_rate: int = 8000,
    drop_samples: bool = True,
) -> DataFrame:
    """Encode float samples in [-1, 1] back into a REAL RIFF/WAVE PCM-16
    payload — the sink half of the audio loop, symmetric with
    :func:`decode_wav` (``decode_wav(encode_wav(x)) == x`` up to the
    int16 quantization step, round-trip-tested). Values are clipped to
    [-1, 1] and scaled by 32767 with round-half-away (matching the
    decode normalization direction). NULL samples -> NULL payload.
    Arrow-batched ``mapInPandas``; payloads are produced at the end,
    never shuffled."""
    import struct

    keep = [c for c in df.columns if c != samples_col or not drop_samples]
    fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.BinaryType())])

    def _enc(vals) -> bytes | None:
        if vals is None:
            return None
        x = np.clip(np.asarray(vals, dtype=np.float64), -1.0, 1.0)
        pcm = np.where(x >= 0, np.floor(x * 32767 + 0.5),
                       np.ceil(x * 32767 - 0.5)).astype(np.int16)
        data = pcm.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2,
                          2, 16)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o = pdf[keep].copy()
            o[out_col] = [_enc(v) for v in pdf[samples_col]]
            yield o

    return _widen(df).mapInPandas(gen, schema=out_schema)
