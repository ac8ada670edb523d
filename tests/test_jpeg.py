"""Baseline JPEG codec tests (pipeline/jpeg.py).

Correctness strategy, strongest to weakest:

1. BIT-EXACT round trip: constant-per-block grayscale at quality 100
   (unit quant, DC-only blocks) must decode back identically — this is
   the invariant the q154 gate's DuckDB oracle replays.
2. CROSS-DECODER check: real libjpeg-produced files from the Spark
   distribution decode within inter-decoder tolerance of the JVM
   ImageIO reference (``spark.read.format("image")``) — catches
   mirrored encoder/decoder bugs a round trip can't see.
3. Bounded-error round trips for the lossy paths (4:4:4, 4:2:0,
   restarts, odd sizes).
"""

import glob
import os

import numpy as np
import pytest

from nested_pandas_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

_SPARK_IMAGES = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


def test_constant_block_gray_q100_bit_exact():
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (32, 32, 1)
    assert np.array_equal(out[..., 0], img)


def test_color_444_smooth_bounded():
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack(
        [(yy * 5) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], -1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_color_420_odd_dims_bounded():
    yy, xx = np.mgrid[0:23, 0:37]
    img = np.stack(
        [(yy * 7) % 256, (xx * 2) % 256, (yy * 3 + xx) % 256], -1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert out.shape == (23, 37, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma is half-resolution; luma-dominated error stays small
    assert err.mean() < 6.0


def test_restart_intervals_equal_no_restart():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=80))
    b = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=2))
    c = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=7))
    # restart markers change the byte stream, never the decoded pixels
    assert np.array_equal(a, b) and np.array_equal(a, c)


def test_grayscale_odd_size_roundtrip_bounded():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (19, 21), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (19, 21, 1)
    # random noise at q95: quantization error bounded but nonzero
    assert np.abs(out[..., 0].astype(int) - img.astype(int)).mean() < 12


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="422")


def test_decoder_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError):
        decode_jpeg(b"BM000000")
    payload = encode_jpeg(np.full((16, 16), 200, np.uint8), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_decoder_rejects_arithmetic_coding():
    # flip the SOF0 marker of a valid stream to SOF9 (arithmetic)
    payload = bytearray(encode_jpeg(np.full((8, 8), 90, np.uint8)))
    i = payload.find(b"\xff\xc0")
    assert i > 0
    payload[i + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF marker"):
        decode_jpeg(bytes(payload))


@pytest.mark.skipif(
    not os.path.exists("/usr/share/doc/nodejs/thin-white-stripe.jpg")
    and not os.path.isdir(_SPARK_IMAGES),
    reason="no progressive sample JPEGs present",
)
def test_progressive_files_match_imageio(spark):
    """Real libjpeg PROGRESSIVE files (SOF2: spectral selection +
    successive approximation + EOB runs) must match the independent JVM
    ImageIO decode almost exactly — same coefficients, so the only slack
    is IDCT rounding (max code-value diff 2 observed)."""
    import shutil
    import tempfile

    candidates = [
        f"{_SPARK_IMAGES}/multi-channel/grayscale.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    ]
    files = [f for f in candidates if os.path.exists(f)]
    if not files:
        pytest.skip("no progressive samples")
    # confirm they are actually SOF2 streams (guards fixture rot)
    assert all(b"\xff\xc2" in open(f, "rb").read() for f in files)
    d = tempfile.mkdtemp()
    for f in files:
        shutil.copy(f, d)
    rows = (
        spark.read.format("image").load(d).select("image.*").collect()
    )
    checked = 0
    for r in rows:
        path = r["origin"].replace("file:", "")
        mine = decode_jpeg(open(path, "rb").read())
        nc, mode = r["nChannels"], r["mode"]
        ref = np.frombuffer(bytes(r["data"]), np.uint8).reshape(
            r["height"], r["width"], nc
        )
        if mode == 16:
            ref = ref[..., ::-1]
        elif nc != mine.shape[2]:
            continue
        assert mine.shape == ref.shape, path
        diff = np.abs(mine.astype(int) - ref.astype(int))
        assert diff.max() <= 4, (path, diff.max())
        assert diff.mean() < 0.5, (path, diff.mean())
        checked += 1
    assert checked >= 1
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.skipif(
    not os.path.isdir(_SPARK_IMAGES), reason="Spark sample images not present"
)
def test_real_libjpeg_files_match_imageio(spark):
    """Decode real libjpeg files and compare against the independent JVM
    ImageIO decoder. Decoders legally differ in chroma UPSAMPLING
    (ImageIO interpolates, we replicate), which dominates RGB diffs on
    4:2:0 files — so the tight bar is on LUMA (no upsampling: decoders
    must agree to IDCT rounding), with a loose RGB envelope on top."""
    rows = (
        spark.read.format("image")
        .load(f"{_SPARK_IMAGES}/**")
        .select("image.*")
        .collect()
    )
    checked = 0
    for r in rows:
        if r["mode"] != 16:  # CV_8UC3 (BGR) only
            continue
        path = r["origin"].replace("file:", "")
        try:
            mine = decode_jpeg(open(path, "rb").read())
        except ValueError:
            continue  # progressive etc — out of scope
        ref = np.frombuffer(bytes(r["data"]), np.uint8).reshape(
            r["height"], r["width"], r["nChannels"]
        )[..., ::-1]
        assert mine.shape == ref.shape, path

        def luma(a):
            return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

        dl = np.abs(luma(mine.astype(float)) - luma(ref.astype(float)))
        assert dl.mean() < 1.0, (path, dl.mean())
        diff = np.abs(mine.astype(int) - ref.astype(int))
        assert diff.mean() < 3.0, (path, diff.mean())
        assert (diff > 8).mean() < 0.05, (path, (diff > 8).mean())
        checked += 1
    assert checked >= 3  # the distribution ships several baseline JPEGs


def test_decode_image_strict_jpeg(spark):
    """decode_image in STRICT mode must decode JPEG payloads for real."""
    from nested_pandas_spark.pipeline.multimodal import decode_image

    blocks = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16 + 7
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    payload = encode_jpeg(img, quality=100)
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    row = decode_image(df, "payload", strict=True).collect()[0]
    got = np.asarray(row["pixels"], dtype=np.uint8).reshape(32, 32)
    assert np.array_equal(got, img)
