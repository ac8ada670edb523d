"""PII redaction (pipeline/pii.py): typed placeholders, Luhn gating,
sequential-kind semantics, NULL passthrough."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.pii import PII_KINDS, pii_counts, redact_pii


def _luhn_py(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits), start=1):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _redact_one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = redact_pii(df, "text").collect()[0]
    return row


def test_email_phone_ip_ssn(spark):
    row = _redact_one(
        spark,
        "a.b+c@d-e.org called from (555) 867-5309, ssh to 10.0.255.3, ssn 078-05-1120",
    )
    assert row["text_redacted"] == (
        "[EMAIL] called from [PHONE], ssh to [IP], ssn [SSN]"
    )
    assert (row["email_n"], row["phone_n"], row["ip_n"], row["ssn_n"]) == (1, 1, 1, 1)


def test_luhn_valid_redacted_invalid_kept(spark):
    # 4111111111111111 is Luhn-valid; bumping the check digit breaks it
    row = _redact_one(spark, "good 4111111111111111 bad 4111111111111112")
    assert row["text_redacted"] == "good [CARD] bad 4111111111111112"
    assert row["credit_card_n"] == 1


def test_card_with_separators_and_amex(spark):
    # 15-digit Amex test number, space-separated Visa
    row = _redact_one(spark, "amex 378282246310005 visa 4111 1111 1111 1111")
    assert row["text_redacted"] == "amex [CARD] visa [CARD]"
    assert row["credit_card_n"] == 2


def test_card_digits_never_rematch_as_phone(spark):
    # sequential semantics: the dashed card is redacted before the phone
    # scan ever sees its 555-1111 tail
    row = _redact_one(spark, "pay 4111-1111-1111-1111 now")
    assert row["text_redacted"] == "pay [CARD] now"
    assert row["phone_n"] == 0


def test_card_inside_longer_run_untouched(spark):
    # the valid card appears verbatim INSIDE a 17-digit run that the
    # lookarounds excluded — the anchored replacement must leave the
    # long run intact and count exactly the one standalone span
    row = _redact_one(
        spark, "blob 94111111111111111 card 4111111111111111 end"
    )
    assert row["text_redacted"] == "blob 94111111111111111 card [CARD] end"
    assert row["credit_card_n"] == 1


def test_repeated_card_counts_each_span(spark):
    row = _redact_one(spark, "a 4111111111111111 b 4111111111111111")
    assert row["text_redacted"] == "a [CARD] b [CARD]"
    assert row["credit_card_n"] == 2


def test_long_digit_run_not_ip_not_card(spark):
    row = _redact_one(spark, "id 99999999999999999999999 v 999.1.2.3.4")
    assert row["text_redacted"] == "id 99999999999999999999999 v 999.1.2.3.4"


def test_null_text_stays_null(spark):
    row = _redact_one(spark, None)
    assert row["text_redacted"] is None
    assert row["email_n"] is None and row["credit_card_n"] is None


def test_kind_subset_and_unknown_kind(spark):
    df = spark.createDataFrame(
        [("x@y.io at 10.0.0.1",)], "text string"
    )
    row = redact_pii(df, "text", kinds=("email",)).collect()[0]
    assert row["text_redacted"] == "[EMAIL] at 10.0.0.1"
    assert "ip_n" not in row.asDict()
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(df, "text", kinds=("email", "passport"))


def test_pii_counts_matches_redact(spark):
    df = spark.createDataFrame(
        [("x@y.io 4111111111111111 10.0.0.1",)], "text string"
    )
    counts = pii_counts(F.col("text"))
    row = df.select(
        *[c.alias(k) for k, c in counts.items()]
    ).collect()[0]
    assert (row["email"], row["credit_card"], row["ip"]) == (1, 1, 1)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=13, max_size=19),
        min_size=1,
        max_size=8,
    )
)
def test_luhn_property_vs_python(spark_global, runs):
    """The HOF Luhn gate must agree with a direct Python reference on
    arbitrary 13-19 digit runs."""
    text = " ".join(f"w{i} {r}" for i, r in enumerate(runs))
    row = _redact_one(spark_global, text)
    expect = text
    for r in sorted(set(runs), key=len, reverse=True):
        if _luhn_py(r):
            expect = expect.replace(r, "[CARD]")
    # a shorter run can be a substring of a longer one post-replacement;
    # compare counts instead when runs collide
    if len(set(runs)) == len(runs) and not any(
        a != b and a in b for a in runs for b in runs
    ):
        assert row["text_redacted"] == expect


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_patterns_registry_complete():
    assert set(PII_KINDS) == {"email", "ssn", "credit_card", "phone", "ip"}
