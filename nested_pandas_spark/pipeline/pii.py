"""PII detection and redaction over document text.

Beyond-reference corpus curation (the reference,
``/root/reference/src/nested_pandas``, has no text pipeline): every
production training-data pipeline scrubs personally identifiable
information before tokenization — C4 (Raffel et al. 2020) drops pages
with blocklisted strings, The Pile and ROOTS redact emails/IPs, and the
BigCode/StarCoder pipeline (Kocetkov et al. 2022) replaces emails, IP
addresses and secret keys with typed placeholder tokens. This module
implements that placeholder-token scheme Spark-first.

Design
------
Everything is a chain of ``regexp_replace`` / ``regexp_extract_all`` /
HOF ``Column`` expressions — pure JVM, whole-stage-codegen'd, zero
Python in the hot path, embarrassingly parallel (no shuffle at all), so
it scales to 100 TB as a map-only stage fused into whatever scan or
filter surrounds it.

Relation to :func:`..text.redact_pii`: the text.py helper is the
RE2-safe single-pass Column variant (replayable verbatim in DuckDB, no
lookarounds, no checksum). This module is the full scrubber — Java
lookaround-anchored patterns, per-kind counts, and checksum-gated card
redaction — whose gate oracle is ground-truth-constructed instead of
regex-replayed. Both stay: RE2 portability and Luhn precision are
different contracts.

Credit-card candidates are validated with the Luhn checksum *inside the
expression layer*: candidates come from ``regexp_extract_all``, the
checksum is an ``aggregate`` HOF over the digit string, and only
validated runs are replaced (via a literal-``replace`` fold), so a
19-digit measurement blob that fails Luhn is left untouched. Kinds are
applied in a fixed order (email → ssn → card → phone → ip), each on the
output of the previous step, so e.g. the digits of an already-redacted
card can never re-match as a phone number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_KINDS", "pii_counts", "redact_pii"]


# Fixed application order — see module docstring. Each entry is
# (kind, java_regex, placeholder). Patterns are anchored with
# lookarounds so digit runs inside longer runs never match.
_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_SSN = r"(?<![0-9\-])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9\-])"
# Unseparated 13-19 digit runs, or the real card groupings 4-4-4-4
# (16, Visa/MC) and 4-6-5 (15, Amex). A free-form "digit [ -]?" repeat
# would greedily merge across word boundaries ("w0 0000000000000" or a
# card followed by " 10.0.0.1" absorbs the neighbour's digits and then
# fails Luhn) — grouping must be structural, not greedy.
_CARD = (
    r"(?<![0-9\-])(?:"
    r"[0-9]{4}[ \-][0-9]{4}[ \-][0-9]{4}[ \-][0-9]{4}"
    r"|[0-9]{4}[ \-][0-9]{6}[ \-][0-9]{5}"
    r"|[0-9]{13,19}"
    r")(?![0-9\-])"
)
_PHONE = (
    r"(?<![0-9])(?:\+[0-9]{1,3}[ \-])?"
    r"(?:\([0-9]{3}\)[ \-]?|[0-9]{3}[.\- ])[0-9]{3}[.\- ][0-9]{4}(?![0-9])"
)
_IP = r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])"

PII_KINDS: dict[str, tuple[str, str]] = {
    "email": (_EMAIL, "[EMAIL]"),
    "ssn": (_SSN, "[SSN]"),
    "credit_card": (_CARD, "[CARD]"),
    "phone": (_PHONE, "[PHONE]"),
    "ip": (_IP, "[IP]"),
}

_ORDER = ["email", "ssn", "credit_card", "phone", "ip"]


def _luhn_ok(candidate: Column) -> Column:
    """Luhn checksum over a matched candidate (separators allowed).

    Standard mod-10: reverse the digit string, double every 2nd digit
    (subtracting 9 when the double exceeds 9), valid iff the total is a
    multiple of 10. Pure ``aggregate`` HOF — evaluated JVM-side per
    candidate, no UDF.
    """
    digits = F.regexp_replace(candidate, r"[^0-9]", "")
    rev = F.reverse(digits)
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(rev)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(i % 2 == 0, _double_digit(rev, i)).otherwise(
            _digit_at(rev, i)
        ),
    )
    return (total % 10 == 0) & (F.length(digits) >= 13)


def _digit_at(rev: Column, i: Column) -> Column:
    return rev.substr(i, F.lit(1)).cast("int")


def _double_digit(rev: Column, i: Column) -> Column:
    doubled = _digit_at(rev, i) * 2
    return F.when(doubled > 9, doubled - 9).otherwise(doubled)


def _card_candidates(text: Column) -> Column:
    """Luhn-validated card candidates present in ``text`` (may repeat)."""
    return F.filter(
        F.regexp_extract_all(text, F.lit(_CARD), F.lit(0)), _luhn_ok
    )


def _redact_step(text: Column, kind: str) -> tuple[Column, Column]:
    """One (redacted_text, match_count) step applied to ``text``."""
    pattern, token = PII_KINDS[kind]
    if kind == "credit_card":
        valid = _card_candidates(text)
        # Replace only regex-anchored occurrences: a candidate matched
        # at one position must not rewrite the same digits where they
        # appear inside a longer run the lookarounds excluded (e.g. a
        # valid 16-digit card elsewhere must not rewrite the tail of
        # "94111111111111111"). Candidates contain only [0-9 -], all
        # regex-literal, so re-anchoring them is safe without escaping.
        anchored = lambda c: F.concat(  # noqa: E731
            F.lit(r"(?<![0-9\-])"), c, F.lit(r"(?![0-9\-])")
        )
        redacted = F.aggregate(
            F.array_distinct(valid),
            text,
            lambda acc, c: F.regexp_replace(acc, anchored(c), F.lit(token)),
        )
        return redacted, F.size(valid)
    count = F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
    return F.regexp_replace(text, pattern, token.replace("$", r"\$")), count


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts on the raw text (no redaction).

    Counts follow the same sequential semantics as :func:`redact_pii`:
    each kind is counted on the text with all earlier kinds already
    redacted, so a digit run never double-counts as both card and phone.
    """
    col = F.col(text) if isinstance(text, str) else text
    counts: dict[str, Column] = {}
    for kind in _ORDER:
        col, counts[kind] = _redact_step(col, kind)
    return counts


def redact_pii(
    df: DataFrame,
    text_col: str,
    kinds: tuple[str, ...] | list[str] = tuple(_ORDER),
    out: str | None = None,
    with_counts: bool = True,
) -> DataFrame:
    """Redact PII spans in ``df[text_col]`` with typed placeholders.

    Emails → ``[EMAIL]``, SSNs → ``[SSN]``, Luhn-valid card numbers →
    ``[CARD]`` (invalid digit runs untouched), phone numbers →
    ``[PHONE]``, IPv4 addresses → ``[IP]``. Adds ``{out}`` (redacted
    text; NULL text stays NULL) and, when ``with_counts``, one
    ``{kind}_n`` long column per requested kind.

    Scale: map-only ``regexp_replace``/HOF chain, no shuffle, no UDF —
    fuses into the enclosing stage at any corpus size.
    """
    unknown = [k for k in kinds if k not in PII_KINDS]
    if unknown:
        raise ValueError(f"unknown PII kinds: {unknown}; valid: {_ORDER}")
    out = out or f"{text_col}_redacted"
    col: Column = F.col(text_col)
    counts: dict[str, Column] = {}
    for kind in _ORDER:
        if kind not in kinds:
            continue
        col, counts[kind] = _redact_step(col, kind)
    result = df.withColumn(out, col)
    if with_counts:
        for kind, c in counts.items():
            result = result.withColumn(
                f"{kind}_n",
                F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                    c.cast("long")
                ),
            )
    return result
