"""Bloom-prefiltered incremental dedup (pipeline/dedup.py): identical
output to the exact anti-join, no false negatives by construction."""

import pytest

from nested_pandas_spark.pipeline.dedup import (
    bloom_dedup_against,
    build_fingerprint_bloom,
    dedup_against,
)


@pytest.fixture(scope="module")
def corpus(spark):
    ref = spark.createDataFrame(
        [(i, f"ref doc {i % 40}") for i in range(100)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1000 + i, f"ref doc {i}" if i < 60 else f"fresh doc {i}")
         for i in range(100)] + [(2000, None)],
        "doc_id long, text string",
    )
    return ref, new


def test_matches_exact_antijoin(spark, corpus):
    ref, new = corpus
    got = {
        r["doc_id"] for r in bloom_dedup_against(new, ref).collect()
    }
    expect = {
        r["doc_id"]
        for r in dedup_against(new, ref, within_batch=False).collect()
    }
    assert got == expect
    # rows 0..39 of new are true dups of ref, 40.. are fresh
    assert {1000 + i for i in range(40)} & got == set()
    assert {1000 + i for i in range(40, 100)} <= got


def test_null_text_survives(spark, corpus):
    ref, new = corpus
    assert 2000 in {r["doc_id"] for r in bloom_dedup_against(new, ref).collect()}


def test_prebuilt_bloom_reuse_and_tiny_bitmap(spark, corpus):
    ref, new = corpus
    # tiny bitmap -> many false positives; the anti-join must still
    # remove every one of them (output unchanged)
    bloom = build_fingerprint_bloom(ref, num_bits=64, num_hashes=2)
    assert any(w != 0 for w in bloom.words) and len(bloom.words) == 1
    got = {r["doc_id"] for r in bloom_dedup_against(new, ref, bloom=bloom).collect()}
    expect = {
        r["doc_id"]
        for r in dedup_against(new, ref, within_batch=False).collect()
    }
    assert got == expect


def test_normalization_matches_fingerprint(spark):
    ref = spark.createDataFrame([(1, "Hello   World")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "hello world")], "doc_id long, text string")
    assert bloom_dedup_against(new, ref).count() == 0


def test_bad_num_bits():
    from nested_pandas_spark.pipeline.dedup import BloomBitmap

    with pytest.raises(ValueError, match="multiple of 64"):
        BloomBitmap([0], 100, 3)


# ------------------------------------------------- LSH knob tuning


def test_lsh_tuning_picks_closest_inflection():
    from nested_pandas_spark.pipeline.dedup import (
        lsh_candidate_probability, lsh_tuning,
    )

    for thr, n in [(0.5, 16), (0.8, 16), (0.9, 64), (0.3, 32)]:
        t = lsh_tuning(thr, n)
        assert t["bands"] * t["rows"] == n
        # no other divisor banding sits closer to the threshold
        best = min(
            abs((1.0 / b) ** (b / n) - thr)
            for b in range(1, n + 1) if n % b == 0
        )
        assert abs(abs(t["inflection"] - thr) - best) < 1e-6
        # S-curve is monotone around the operating point
        assert t["p_below"] <= t["p_at_threshold"] <= t["p_above"]
    assert lsh_candidate_probability(1.0, 4, 4) == 1.0
    assert lsh_candidate_probability(0.0, 4, 4) == 0.0


def test_lsh_tuning_validates():
    import pytest as _pt

    from nested_pandas_spark.pipeline.dedup import (
        lsh_candidate_probability, lsh_tuning,
    )

    with _pt.raises(ValueError):
        lsh_tuning(0.0)
    with _pt.raises(ValueError):
        lsh_tuning(0.5, 1)
    with _pt.raises(ValueError):
        lsh_candidate_probability(1.5, 2, 2)
