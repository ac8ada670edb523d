"""PNG codec in stdlib ``zlib`` + NumPy — no codec library.

Together with :mod:`~nested_pandas_spark.pipeline.jpeg` this closes the
compressed-image gap for the multimodal column policy: PNG and baseline
JPEG cover the overwhelming majority of crawl/web images.

* :func:`decode_png`: chunk walk (IHDR/PLTE/IDAT/IEND), zlib inflate,
  per-row unfilter (None/Sub/Up/Average/Paeth, RFC 2083 section 6),
  palette expansion. Supports bit depth 8, color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.
  16-bit depth and Adam7 interlacing raise ``ValueError`` (rare in
  crawl data; the strict-mode contract reports them honestly).
* :func:`encode_png`: the matching encoder (filter 0 rows, one zlib
  IDAT) for gray/RGB/RGBA — deterministic REAL fixtures for tests and
  correctness gates, and a lossless thumbnail sink.

Scale design: identical to the other decoders — a per-payload kernel
under Arrow-batched ``mapInPandas`` (``multimodal.decode_image``);
payload bytes never shuffle. PNG decode round-trips LOSSLESSLY, so
oracle engines can value-check decoded pixels end-to-end.

Reference context: nested-pandas has no media handling; this extends the
multimodal column policy (pipeline/multimodal.py) to compressed inputs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an ``(h, w, c)`` uint8 array (c = 1 gray,
    2 gray+alpha, 3 RGB — including palette expansion — or 4 RGBA)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    if w == 0 or h == 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    c = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data size {len(raw)} != expected {h * (stride + 1)}"
        )
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f, cur = int(ftypes[y]), data[y].astype(np.int64)
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            line = np.empty(stride, np.int64)
            for i in range(stride):
                a = line[i - c] if i >= c else 0
                if f == 1:
                    line[i] = (cur[i] + a) & 0xFF
                elif f == 3:
                    line[i] = (cur[i] + (a + prev[i]) // 2) & 0xFF
                else:
                    b = prev[i]
                    cc = prev[i - c] if i >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                    line[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = line.astype(np.uint8)
        prev = line
    img = out.reshape(h, w, c)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = img[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        img = plte[idx]
    return img.copy()


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode an ``(h, w)`` / ``(h, w, 1|3|4)`` uint8 array as PNG
    (bit depth 8; filter 0 rows; single zlib IDAT). Lossless."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected (h, w, 1|3|4) image, got shape {arr.shape}")
    h, w, c = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(rows.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
