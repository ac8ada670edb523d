"""PNG codec tests (pipeline/png.py).

PNG is lossless, so the bars are exact: encode->decode round trips
bit-identically for every channel count; per-filter unfiltering is
checked against hand-filtered streams; real container PNGs (other
encoders, mixed Sub/Up/Average/Paeth rows, palettes) must match the
independent JVM ImageIO decoder BIT-EXACTLY.
"""

import glob
import struct
import zlib

import numpy as np
import pytest

from nested_pandas_spark.pipeline.png import _chunk, _SIG, decode_png, encode_png


@pytest.mark.parametrize(
    "shape", [(17, 23), (17, 23, 1), (8, 8, 3), (31, 5, 4), (1, 1, 3), (2, 64, 3)]
)
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(sum(shape))
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(a))
    exp = a[..., None] if a.ndim == 2 else a
    assert np.array_equal(out, exp)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG applying the given filter type per row (forward
    filtering done here, independent of the encoder under test)."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        left = np.zeros(stride, np.int64)
        left[c:] = cur[:-c]
        ul = np.zeros(stride, np.int64)
        ul[c:] = prev[:-c]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        raw.append(f)
        raw += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("c", [1, 3, 4])
def test_every_filter_type_unfilters(c):
    rng = np.random.default_rng(c)
    img = rng.integers(0, 256, (5, 7, c), dtype=np.uint8)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), img)


def test_palette_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    raw = b"".join(bytes([0]) + row.tobytes() for row in idx)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    payload = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 1].tolist() == [9, 9, 9]


def test_rejections():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 2), np.uint8))
    # invalid depth rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    # 16-bit palette is not a legal PNG
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="palette"):
        decode_png(bad)
    # sub-byte depth on a multi-channel color type rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="gray/palette"):
        decode_png(bad)
    # unknown interlace method rejected (Adam7 itself is supported)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad)


def _adam7_png(img: np.ndarray) -> bytes:
    """Independent Adam7 writer (filter-0 rows) for decode validation."""
    from nested_pandas_spark.pipeline.png import _ADAM7

    h, w, c = img.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw += row.tobytes()
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(9, 13, 3), (8, 8, 1), (1, 5, 4), (11, 2, 3)])
def test_adam7_interlaced_decode(shape):
    """Adam7 de-interlacing reassembles exactly, including the edge
    cases (dims below a full 8x8 tile, empty passes)."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_png(_adam7_png(img)), img)


def _lowdepth_gray_png(samples: np.ndarray, depth: int) -> bytes:
    """Independent low-bit-depth grayscale writer (filter-0 rows)."""
    h, w = samples.shape
    raw = bytearray()
    for row in samples:
        bits = np.zeros(((w * depth + 7) // 8 * 8,), np.uint8)
        for i, v in enumerate(row):
            for b in range(depth):
                bits[i * depth + b] = (int(v) >> (depth - 1 - b)) & 1
        raw.append(0)
        raw += np.packbits(bits).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_low_bit_depth_gray(depth):
    """1/2/4-bit grayscale unpacks MSB-first and scales to the full
    8-bit range (v * 255/(2^d - 1)), including non-byte-aligned rows."""
    rng = np.random.default_rng(depth)
    samples = rng.integers(0, 1 << depth, (5, 7), dtype=np.uint8)
    out = decode_png(_lowdepth_gray_png(samples, depth))
    scale = 255 // ((1 << depth) - 1)
    assert np.array_equal(out[..., 0], samples * scale)


def test_low_bit_depth_palette():
    """2-bit palette indices stay RAW (not range-scaled) before lookup."""
    plte = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 50, 60])
    samples = np.array([[0, 1, 2, 3, 3]], np.uint8)
    payload = _lowdepth_gray_png(samples, 2)
    # rewrite color type to palette and inject PLTE
    ihdr = struct.pack(">IIBBBBB", 5, 1, 2, 3, 0, 0, 0)
    body = payload[8:]
    idat_start = body.index(b"IDAT") - 4
    rebuilt = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + body[idat_start:]
    )
    out = decode_png(rebuilt)
    assert out.shape == (1, 5, 3)
    assert out[0].tolist() == [
        [10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 50, 60], [40, 50, 60],
    ]


def test_real_container_pngs_match_imageio(spark, tmp_path):
    """Real PNGs from /usr/share (other encoders, real filter mixes)
    must decode BIT-EXACTLY equal to the JVM ImageIO reference."""
    import os
    import shutil

    files = sorted(glob.glob("/usr/share/**/*.png", recursive=True))[:40]
    if len(files) < 5:
        pytest.skip("no sample PNGs in container")
    d = tmp_path / "pngs"
    d.mkdir()
    for i, f in enumerate(files):
        shutil.copy(f, d / f"{i}_{os.path.basename(f)}")
    rows = (
        spark.read.format("image").load(str(d)).select("image.*").collect()
    )
    exact = 0
    for r in rows:
        path = r["origin"].replace("file:", "")
        try:
            mine = decode_png(open(path, "rb").read())
        except ValueError:
            continue  # interlaced / low bit depth — out of scope
        nc, mode = r["nChannels"], r["mode"]
        ref = np.frombuffer(bytes(r["data"]), np.uint8).reshape(
            r["height"], r["width"], nc
        )
        if mode == 16:
            ref = ref[..., ::-1]  # BGR -> RGB
        elif mode == 24:
            ref = ref[..., [2, 1, 0, 3]]  # BGRA -> RGBA
        if mine.shape[2] == 2 and nc == 4:  # gray+alpha vs RGBA expansion
            ref = np.stack([ref[..., 0], ref[..., 3]], -1)
        if mine.shape != ref.shape:
            continue  # tRNS palette alpha expansion — documented gap
        assert np.array_equal(mine, ref), path
        exact += 1
    assert exact >= 5


def test_decode_image_strict_png(spark):
    from nested_pandas_spark.pipeline.multimodal import decode_image

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)))], "id long, payload binary"
    )
    row = decode_image(df, "payload", strict=True).collect()[0]
    got = np.asarray(row["pixels"], dtype=np.uint8).reshape(6, 9, 3)
    assert np.array_equal(got, img)


def test_encode_image_sink_roundtrip(spark):
    """encode_image (PNG) is the sink half of the media loop: pixels ->
    payload -> strict decode must be the identity (PNG lossless)."""
    from nested_pandas_spark.pipeline.multimodal import decode_image, encode_image

    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(7, img.ravel().tolist())], "id long, pixels array<int>"
    )
    enc = encode_image(df, "pixels", height=5, width=4, channels=3, format="png")
    assert enc.columns == ["id", "payload"]
    back = decode_image(enc, "payload", strict=True).collect()[0]
    assert np.array_equal(
        np.asarray(back["pixels"]).reshape(5, 4, 3), img
    )
    # jpeg path: q100 constant image is exact too
    flat = np.full(5 * 4, 77, np.uint8)
    df2 = spark.createDataFrame(
        [(1, flat.tolist())], "id long, pixels array<int>"
    )
    enc2 = encode_image(
        df2, "pixels", height=5, width=4, channels=1, format="jpeg", quality=100
    )
    back2 = decode_image(enc2, "payload", strict=True).collect()[0]
    assert np.asarray(back2["pixels"]).tolist() == flat.tolist()
    # null pixels -> null payload
    df3 = spark.createDataFrame([(1, None)], "id long, pixels array<int>")
    assert encode_image(df3, "pixels").collect()[0]["payload"] is None


@pytest.mark.parametrize("color,c", [(0, 1), (2, 3), (6, 4)])
def test_16bit_high_byte_downconversion(color, c):
    """16-bit samples downconvert by taking the big-endian high byte
    (the PNG-recommended 8-bit approximation)."""
    rng = np.random.default_rng(c)
    hi = rng.integers(0, 256, (4, 5, c), dtype=np.uint8)
    lo = rng.integers(0, 256, (4, 5, c), dtype=np.uint8)
    samples = (hi.astype(np.uint16) << 8) | lo
    raw = bytearray()
    for row in samples:
        raw.append(0)
        raw += row.astype(">u2").tobytes()
    ihdr = struct.pack(">IIBBBBB", 5, 4, 16, color, 0, 0, 0)
    payload = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), hi)


def test_palette_trns_alpha():
    """tRNS palette alpha -> RGBA output; entries beyond the tRNS table
    are opaque. Validated bit-exact vs ImageIO on the real gvim icons in
    test_real_container_pngs_match_imageio."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    trns = bytes([0, 128])  # entry 0 transparent, 1 half, 2 -> opaque
    idx = np.array([[0, 1, 2]], np.uint8)
    raw = b"\x00" + idx.tobytes()
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0)
    payload = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"tRNS", trns)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert out.shape == (1, 3, 4)
    assert out[0].tolist() == [
        [255, 0, 0, 0], [0, 255, 0, 128], [0, 0, 255, 255],
    ]
