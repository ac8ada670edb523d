"""Code-corpus quality rules (pipeline/code.py): signals, license
detection precedence, StarCoder-default filter."""

from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.code import (
    PERMISSIVE_LICENSES,
    code_quality_filter,
    detect_license,
    with_code_signals,
)


def _signals(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return with_code_signals(df, "text").collect()[0]


def test_line_stats(spark):
    row = _signals(spark, "ab\ncdef\n")
    assert row["n_lines"] == 3  # trailing newline -> empty last line
    assert row["max_line_len"] == 4
    assert abs(row["avg_line_len"] - 2.0) < 1e-12
    assert abs(row["alnum_frac"] - 6 / 8) < 1e-12


def test_blob_detection(spark):
    b64 = "QmFzZTY0" * 10  # 80 base64 chars
    hexrun = "deadbeef" * 5  # 40 hex chars
    row = _signals(spark, f"x = '{b64}'\nh = '{hexrun}'")
    assert row["base64_n"] == 1
    assert row["hex_n"] == 1
    # a 40-char hex run is NOT a base64 blob (needs 64+), and the base64
    # run is not pure hex, so neither double-counts
    short = _signals(spark, "k = 'deadbeef'")
    assert short["hex_n"] == 0 and short["base64_n"] == 0


def test_autogen_marker(spark):
    assert _signals(spark, "// AUTO-GENERATED, Do Not Edit")["autogen"]
    assert not _signals(spark, "handmade artisanal code")["autogen"]


def test_license_spdx_beats_phrase(spark):
    row = _signals(
        spark, "# SPDX-License-Identifier: BSD-3-Clause\n# MIT License text"
    )
    assert row["license_id"] == "BSD-3-Clause"
    assert row["permissive"] is True


def test_license_phrase_order_and_unknown(spark):
    row = _signals(spark, "Licensed under the Apache License, Version 2.0")
    assert row["license_id"] == "Apache-2.0" and row["permissive"] is True
    gpl = _signals(spark, "under the GNU General Public License v3")
    assert gpl["license_id"] == "GPL-3.0-only" and gpl["permissive"] is False
    none = _signals(spark, "no license here")
    assert none["license_id"] is None and none["permissive"] is None


def test_quality_filter_defaults(spark):
    rows = [
        (0, "def f():\n    return 1\n"),          # keeps
        (1, "x" * 1500),                            # max line
        (2, ("y" * 200 + "\n") * 3),               # avg line
        (3, "@@ ::: !!! ;;; ,,,"),                  # alnum_frac
        (4, "s = '" + "QmFzZTY0" * 10 + "'"),      # base64 blob
        (5, "// auto-generated stub"),               # autogen
        (6, None),                                   # NULL never passes
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = [r["doc_id"] for r in code_quality_filter(df, "text").collect()]
    assert kept == [0]


def test_permissive_only(spark):
    df = spark.createDataFrame(
        [
            (0, "# SPDX-License-Identifier: MIT\ncode"),
            (1, "# SPDX-License-Identifier: GPL-3.0-only\ncode"),
            (2, "plain code"),
        ],
        "doc_id long, text string",
    )
    kept = [
        r["doc_id"]
        for r in code_quality_filter(df, "text", permissive_only=True).collect()
    ]
    assert kept == [0]


def test_permissive_set_sane():
    assert "MIT" in PERMISSIVE_LICENSES and "GPL-3.0-only" not in PERMISSIVE_LICENSES
