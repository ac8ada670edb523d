"""GIF decoder tests (pipeline/gif.py).

GIF is lossless palette data, so the bars are exact: hand-built files
(independent LZW encoder below) decode bit-identically, and real
container GIFs must match JVM ImageIO on every VISIBLE pixel (RGB under
alpha=0 is undefined — ImageIO keeps palette colors there, we keep the
composited screen).
"""

import glob
import struct

import numpy as np
import pytest

from nested_pandas_spark.pipeline.gif import decode_gif, decode_gif_frames


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Independent GIF-flavor LZW encoder for fixtures."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {(i,): i for i in range(clear)}
    next_code, width = end + 1, min_code_size + 1
    out = bytearray()
    cur, nbits = 0, 0

    def emit(code, w):
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear, width)
    seq = ()
    for v in indices:
        if seq + (v,) in table:
            seq = seq + (v,)
            continue
        emit(table[seq], width)
        table[seq + (v,)] = next_code
        next_code += 1
        # the DECODER's table lags one entry (it defines the entry for
        # code k while reading code k+1), so the encoder widens one step
        # later than its own table count suggests
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code, width = end + 1, min_code_size + 1
        seq = (v,)
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _gif(img_indices: np.ndarray, palette: list[tuple[int, int, int]],
         interlace: bool = False, transparent: int | None = None) -> bytes:
    h, w = img_indices.shape
    bits = max(2, (len(palette) - 1).bit_length())
    n = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    for i in range(n):
        out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    if transparent is not None:
        out += bytes((0x21, 0xF9, 4, 0x01)) + struct.pack("<H", 0)
        out += bytes((transparent, 0))
    flags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
    idx = img_indices
    if interlace:
        rows = (list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2)))
        idx = img_indices[rows]
    data = _lzw_encode(idx.ravel().tolist(), bits)
    out.append(bits)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


_PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]


def test_roundtrip_plain():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, (13, 9), dtype=np.uint8)
    img = decode_gif(_gif(idx, _PAL))
    exp = np.array(_PAL, np.uint8)[idx]
    assert np.array_equal(img, exp)


def test_roundtrip_interlaced():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 4, (17, 5), dtype=np.uint8)
    img = decode_gif(_gif(idx, _PAL, interlace=True))
    assert np.array_equal(img, np.array(_PAL, np.uint8)[idx])


def test_transparency_first_frame():
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    frames = decode_gif_frames(_gif(idx, _PAL, transparent=0))
    rgba = frames[0][0]
    assert rgba[0, 0, 3] == 0 and rgba[1, 1, 3] == 0  # index 0 transparent
    assert rgba[0, 1].tolist() == [0, 255, 0, 255]
    # decode_gif composites transparent over black
    img = decode_gif(_gif(idx, _PAL, transparent=0))
    assert img[0, 0].tolist() == [0, 0, 0]


def test_lzw_table_growth():
    # enough distinct structure to force code-width growth past 9 bits
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 4, (40, 40), dtype=np.uint8)
    assert np.array_equal(
        decode_gif(_gif(idx, _PAL)), np.array(_PAL, np.uint8)[idx]
    )


def test_rejections():
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    payload = _gif(np.zeros((2, 2), np.uint8), _PAL)
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])


def test_real_container_gifs_match_imageio(spark, tmp_path):
    """Real GIFs (other encoders) must match ImageIO on every visible
    pixel; alpha masks must match exactly."""
    import os
    import shutil

    files = sorted(glob.glob("/usr/share/**/*.gif", recursive=True))[:30]
    if len(files) < 3:
        pytest.skip("no sample GIFs in container")
    d = tmp_path / "gifs"
    d.mkdir()
    for i, f in enumerate(files):
        shutil.copy(f, d / f"{i}_{os.path.basename(f)}")
    rows = spark.read.format("image").load(str(d)).select("image.*").collect()
    checked = 0
    for r in rows:
        path = r["origin"].replace("file:", "")
        rgba = decode_gif_frames(open(path, "rb").read())[0][0]
        nc, mode = r["nChannels"], r["mode"]
        ref = np.frombuffer(bytes(r["data"]), np.uint8).reshape(
            r["height"], r["width"], nc
        )
        if mode == 16:
            ref = np.concatenate(
                [ref[..., ::-1], np.full(ref.shape[:2] + (1,), 255, np.uint8)],
                axis=-1,
            )
        elif mode == 24:
            ref = ref[..., [2, 1, 0, 3]]
        else:
            continue
        assert rgba.shape == ref.shape, path
        vis = ref[..., 3] > 0
        assert np.array_equal(rgba[..., 3] > 0, vis), path
        assert np.array_equal(rgba[..., :3][vis], ref[..., :3][vis]), path
        checked += 1
    assert checked >= 3


def test_decode_image_strict_gif(spark):
    from nested_pandas_spark.pipeline.multimodal import decode_image

    idx = np.array([[0, 1, 2]], np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_gif(idx, _PAL)))], "id long, payload binary"
    )
    row = decode_image(df, "payload", strict=True).collect()[0]
    assert np.asarray(row["pixels"]).reshape(1, 3, 3).tolist() == [
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    ]


def test_sample_video_frames_gif(spark):
    """Animated GIF payloads flow through sample_video_frames as REAL
    video: luma planes of evenly-sampled frames."""
    import struct as st

    from nested_pandas_spark.pipeline.multimodal import sample_video_frames

    # build a 3-frame 2x2 animation by concatenating image blocks
    pal = [(0, 0, 0), (255, 255, 255), (100, 100, 100), (9, 9, 9)]
    frames_idx = [np.full((2, 2), i, np.uint8) for i in range(3)]
    out = bytearray(b"GIF89a") + st.pack("<HHBBB", 2, 2, 0x81, 0, 0)
    for p in pal:
        out += bytes(p)
    for fi in frames_idx:
        out += b"\x2c" + st.pack("<HHHHB", 0, 0, 2, 2, 0)
        data = _lzw_encode(fi.ravel().tolist(), 2)
        out.append(2)
        out.append(len(data))
        out += data
        out += b"\x00"
    out += b"\x3b"
    df = spark.createDataFrame(
        [(1, bytearray(bytes(out)))], "id long, payload binary"
    )
    row = sample_video_frames(df, "payload", n_frames=3, strict=True).collect()[0]
    lumas = {
        f["frame_idx"]: f["pixels"][0] for f in row["frames"]
    }
    # luma of (0,0,0)=0, (255,255,255)=255, (100,100,100)=100
    assert lumas == {0: 0, 1: 255, 2: 100}
