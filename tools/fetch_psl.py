#!/usr/bin/env python
"""Fetch the full official Public Suffix List into the engine's data path.

One-command production upgrade for the shipped ~560-rule snapshot
(``nested_pandas_spark/data/public_suffix_snapshot.dat``): downloads the
authoritative ~10k-rule ``public_suffix_list.dat`` from publicsuffix.org
into the same file :func:`nested_pandas_spark.pipeline.web.load_psl_rules`
already parses, so ``PUBLIC_SUFFIXES`` — and every ``registrable_domain``
/ ``with_registrable_domain`` call that defaults to it — picks up full
coverage on the next import.

REQUIRES NETWORK — run manually when vendoring/refreshing; never run in
CI (this container has no egress; the committed snapshot keeps tests
hermetic). The download is validated before anything is overwritten:
official PSL syntax, plausible rule count, the canonical ``*.ck`` /
``!www.ck`` wildcard-exception pair present.

Usage::

    python tools/fetch_psl.py            # fetch into the default data path
    python tools/fetch_psl.py --out /tmp/psl.dat   # fetch elsewhere
    python tools/fetch_psl.py --check /tmp/psl.dat # validate a local file
"""

from __future__ import annotations

import argparse
import os
import sys

PSL_URL = "https://publicsuffix.org/list/public_suffix_list.dat"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "nested_pandas_spark", "data", "public_suffix_snapshot.dat",
)
# the authoritative list has held ~9-12k rules for years; anything far
# below that means a truncated/failed download, not the real file
MIN_RULES = 5000


def validate(text: str, min_rules: int = MIN_RULES) -> int:
    """Sanity-check PSL-syntax ``text``; return the rule count or raise."""
    rules = [
        ln.split()[0]
        for ln in (s.strip() for s in text.splitlines())
        if ln and not ln.startswith("//")
    ]
    if len(rules) < min_rules:
        raise ValueError(
            f"only {len(rules)} rules parsed (expected >= {min_rules}) — "
            "truncated or wrong file?"
        )
    if "*.ck" not in rules or "!www.ck" not in rules:
        raise ValueError(
            "canonical wildcard/exception pair (*.ck / !www.ck) missing — "
            "not the official PSL?"
        )
    bad = [r for r in rules if any(c.isspace() for c in r)]
    if bad:
        raise ValueError(f"malformed rules: {bad[:5]}")
    return len(rules)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=DEFAULT_OUT,
                    help=f"destination path (default: {DEFAULT_OUT})")
    ap.add_argument("--url", default=PSL_URL)
    ap.add_argument("--check", metavar="PATH",
                    help="validate an already-downloaded file and exit")
    ap.add_argument("--min-rules", type=int, default=MIN_RULES)
    args = ap.parse_args()

    if args.check:
        with open(args.check, encoding="utf-8") as f:
            n = validate(f.read(), args.min_rules)
        print(f"OK: {args.check} parses as PSL syntax with {n} rules")
        return 0

    from urllib.request import urlopen  # stdlib; network required here

    print(f"fetching {args.url} ...")
    with urlopen(args.url, timeout=60) as resp:
        text = resp.read().decode("utf-8")
    n = validate(text, args.min_rules)
    tmp = args.out + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, args.out)
    print(f"wrote {n} rules to {args.out}")
    print("verify: python -c \"from nested_pandas_spark.pipeline.web "
          "import PUBLIC_SUFFIXES; print(len(PUBLIC_SUFFIXES))\"")
    return 0


if __name__ == "__main__":
    sys.exit(main())
