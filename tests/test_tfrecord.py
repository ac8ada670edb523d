"""TFRecord source/sink: CRC32C vectors, Example wire-format parity,
Spark write/read round trips, corruption detection."""

import os
import struct
import tempfile

import numpy as np
import pytest

from nested_pandas_spark.sources.tfrecord import (
    _crc32c_bytewise,
    crc32c,
    decode_example,
    encode_example,
    iter_records,
    masked_crc32c,
    read_tfrecord,
    write_record,
    write_tfrecord,
)


# ------------------------------------------------------------ CRC32C


def test_crc32c_check_vector():
    # the standard CRC-32C check value (e.g. RFC 3720 appendix B.4)
    assert crc32c(b"123456789") == 0xE3069283


def test_crc32c_known_values():
    assert crc32c(b"") == 0
    # 32 zero bytes (iSCSI test vector)
    assert crc32c(bytes(32)) == 0x8A9136AA
    # 32 bytes of 0xFF
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_crc32c_slice_by_8_matches_bytewise():
    rng = np.random.default_rng(42)
    for ln in list(range(0, 24)) + [100, 1001, 4096]:
        data = rng.integers(0, 256, ln, dtype=np.uint8).tobytes()
        assert crc32c(data) == _crc32c_bytewise(data), ln


def test_masked_crc_matches_tf_formula():
    c = crc32c(b"payload")
    want = ((((c >> 15) | (c << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"payload") == want


# ---------------------------------------------------- Example codec


def test_example_roundtrip_all_kinds():
    ex = encode_example({
        "i": ("int64", [0, 1, -1, 2**62, -(2**62)]),
        "f": ("float", [0.0, 1.5, -2.25]),
        "b": ("bytes", [b"\x00\xff", "héllo"]),
    })
    dec = decode_example(ex)
    assert dec["i"] == ("int64", [0, 1, -1, 2**62, -(2**62)])
    assert dec["f"] == ("float", [0.0, 1.5, -2.25])
    assert dec["b"][1] == [b"\x00\xff", "héllo".encode("utf-8")]


def test_example_bytes_deterministic_sorted_keys():
    a = encode_example({"b": ("int64", [1]), "a": ("int64", [2])})
    b = encode_example({"a": ("int64", [2]), "b": ("int64", [1])})
    assert a == b


def test_example_golden_bytes():
    # hand-assembled minimal Example{features{feature{"x": int64_list[7]}}}
    # int64_list: Feature field 3 -> packed value field 1 -> varint 7
    feat = b"\x1a\x03\x0a\x01\x07"
    entry = b"\x0a\x01x" + b"\x12" + bytes([len(feat)]) + feat
    features = b"\x0a" + bytes([len(entry)]) + entry
    want = b"\x0a" + bytes([len(features)]) + features
    assert encode_example({"x": ("int64", [7])}) == want


def test_decode_accepts_unpacked_numeric_lists():
    # unpacked Int64List: repeated varint field 1 (wire 0) twice
    il = b"\x08\x05\x08\x09"
    feat = b"\x1a" + bytes([len(il)]) + il
    entry = b"\x0a\x01y" + b"\x12" + bytes([len(feat)]) + feat
    features = b"\x0a" + bytes([len(entry)]) + entry
    ex = b"\x0a" + bytes([len(features)]) + features
    assert decode_example(ex)["y"] == ("int64", [5, 9])
    # unpacked FloatList: fixed32 field 1 (wire 5)
    fl = b"\x0d" + struct.pack("<f", 1.5)
    feat = b"\x12" + bytes([len(fl)]) + fl
    entry = b"\x0a\x01z" + b"\x12" + bytes([len(feat)]) + feat
    features = b"\x0a" + bytes([len(entry)]) + entry
    ex = b"\x0a" + bytes([len(features)]) + features
    assert decode_example(ex)["z"] == ("float", [1.5])


# --------------------------------------------------- record framing


def test_record_framing_roundtrip_and_crc():
    import io

    buf = io.BytesIO()
    payloads = [b"", b"x", b"longer payload " * 100]
    for p in payloads:
        write_record(buf, p)
    assert list(iter_records(buf.getvalue())) == payloads


def test_corrupt_payload_raises():
    import io

    buf = io.BytesIO()
    write_record(buf, b"hello world")
    data = bytearray(buf.getvalue())
    data[14] ^= 0x01  # flip a payload byte
    with pytest.raises(ValueError, match="corrupt payload CRC"):
        list(iter_records(bytes(data)))
    # best-effort scan tolerates it
    assert list(iter_records(bytes(data), verify_crc=False)) != []


def test_truncated_record_raises():
    import io

    buf = io.BytesIO()
    write_record(buf, b"hello world")
    with pytest.raises(ValueError, match="truncated"):
        list(iter_records(buf.getvalue()[:-2]))


# ------------------------------------------------------ Spark layer


@pytest.fixture()
def tmpdir_path():
    with tempfile.TemporaryDirectory() as d:
        yield d


def test_spark_roundtrip_scalars_and_lists(spark, tmpdir_path):
    df = spark.createDataFrame(
        [
            (0, "alpha", 1.5, [1.0, 2.5], [1, 2], b"\x00\x01"),
            (1, None, None, None, [], None),
            (2, "béta", -0.25, [0.25], [7], b"\xff"),
        ],
        "doc_id long, text string, score float, emb array<float>, "
        "ks array<long>, blob binary",
    )
    man = write_tfrecord(df.repartition(2), tmpdir_path)
    assert man.agg({"n_records": "sum"}).collect()[0][0] == 3
    back = read_tfrecord(
        spark, tmpdir_path,
        {"doc_id": "int64", "text": "string", "score": "float",
         "emb": "float_list", "ks": "int64_list", "blob": "bytes"},
    )
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows[0]["text"] == "alpha" and rows[0]["score"] == 1.5
    assert rows[0]["emb"] == [1.0, 2.5] and rows[0]["ks"] == [1, 2]
    assert bytes(rows[0]["blob"]) == b"\x00\x01"
    assert rows[1]["text"] is None and rows[1]["score"] is None
    assert rows[1]["emb"] is None and rows[1]["ks"] == []
    assert rows[2]["text"] == "béta" and bytes(rows[2]["blob"]) == b"\xff"


def test_spark_float32_precision_contract(spark, tmpdir_path):
    # doubles pass through float32 (the Example wire type) — exactly
    # representable values survive, others round to nearest float32
    df = spark.createDataFrame(
        [(0, 0.1), (1, 0.5)], "id long, x double"
    )
    write_tfrecord(df, tmpdir_path)
    back = read_tfrecord(spark, tmpdir_path, {"id": "int64", "x": "float"})
    got = {r["id"]: r["x"] for r in back.collect()}
    assert got[1] == 0.5
    assert got[0] == np.float32(0.1)


def test_spark_shard_per_partition(spark, tmpdir_path):
    df = spark.range(100).withColumn("v", (2 * (
        __import__("pyspark.sql.functions", fromlist=["col"]).col("id"))))
    man = write_tfrecord(df.repartition(4), tmpdir_path)
    files = [r["file"] for r in man.collect()]
    assert len(files) == 4 and len(set(files)) == 4
    assert sorted(os.listdir(tmpdir_path)) == sorted(
        os.path.basename(f) for f in files
    )


def test_spark_overwrite_and_error_modes(spark, tmpdir_path):
    df = spark.range(5)
    write_tfrecord(df, tmpdir_path)
    first = set(os.listdir(tmpdir_path))
    write_tfrecord(df, tmpdir_path)  # overwrite clears old shards
    n = read_tfrecord(spark, tmpdir_path, {"id": "int64"}).count()
    assert n == 5
    with pytest.raises(FileExistsError):
        write_tfrecord(df, tmpdir_path, mode="error")
    assert first  # sanity


def test_spark_write_through_filesystem_uri(spark, tmpdir_path):
    """Cluster-safe sink contract: a filesystem URI (here ``file:``, the
    scheme this container can exercise; same pyarrow.fs resolution layer
    serves s3:// and hdfs://) is resolved INSIDE each task and shards
    stream through that filesystem — manifest paths keep the caller's
    scheme and read back through Spark's binaryFile reader."""
    df = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "doc_id long, text string")
    uri = "file://" + tmpdir_path
    man = write_tfrecord(df.repartition(2), uri)
    files = [r["file"] for r in man.collect()]
    assert files and all(f.startswith("file://") for f in files)
    assert sorted(os.listdir(tmpdir_path)) == sorted(
        os.path.basename(f) for f in files)
    back = read_tfrecord(spark, uri, {"doc_id": "int64", "text": "string"})
    assert {r["doc_id"]: r["text"] for r in back.collect()} == {
        0: "a", 1: "b", 2: "c"}
    # overwrite + error modes work through the URI path too
    write_tfrecord(df, uri)
    assert read_tfrecord(spark, uri, {"doc_id": "int64"}).count() == 3
    with pytest.raises(FileExistsError):
        write_tfrecord(df, uri, mode="error")


def test_spark_rejects_unsupported_types(spark, tmpdir_path):
    df = spark.createDataFrame(
        [(1, {"a": 1})], "id long, s struct<a: long>"
    )
    with pytest.raises(ValueError, match="no .*Example mapping"):
        write_tfrecord(df, tmpdir_path)


def test_spark_corruption_detected_on_read(spark, tmpdir_path):
    write_tfrecord(spark.range(10), tmpdir_path)
    fname = os.path.join(
        tmpdir_path,
        [f for f in os.listdir(tmpdir_path) if f.endswith(".tfrecord")][0],
    )
    data = bytearray(open(fname, "rb").read())
    data[13] ^= 0x01
    open(fname, "wb").write(bytes(data))
    with pytest.raises(Exception, match="corrupt"):
        read_tfrecord(spark, tmpdir_path, {"id": "int64"}).collect()
