"""PII detection and redaction over text columns.

A training-data pipeline scrubs emails / URLs / IP addresses / phoneish
numbers before anything ships; the reference has no such stage (its
`uid` column arrives pre-pseudonymized, crawler/spider_worker.py:46) —
this is a north-star text-cleaning op per BASELINE.json.

Everything is native `regexp_replace` / `regexp_count` — zero-shuffle
map passes that stay inside whole-stage codegen, the ideal 100 TB
shape (throughput scales with cores; no skew surface, no state). The
patterns deliberately use the Java-regex ∩ RE2 subset (character
classes, bounded repetition, word boundaries — no lookaround, no
backrefs) so the SAME pattern strings run in Spark and in a DuckDB
oracle, the repo's standard verification move (see BPEISH_PATTERN in
operators/textstats.py).

Redaction order is fixed URL → EMAIL → IPV4 → PHONE: URLs are
swallowed whole first so their userinfo/host pieces aren't partially
re-matched by the email/ip patterns, and the phone pattern (the
loosest) runs last.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dotted quad with per-octet 0-255 range check (shared by the ipv4
# pattern and the email pattern's IP-literal host alternative)
_IPV4 = (
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
)

# Ordered: applied top-to-bottom by redact_expr.
PII_PATTERNS: dict[str, str] = {
    # scheme://non-space — greedy, swallows query strings and userinfo
    "url": r"https?://[^\s]+",
    # host is a named domain with an alphabetic TLD OR a dotted-quad IP
    # literal (user@192.168.1.1) — without the alternative the later
    # ipv4 pass would redact only the host and leave 'user@' exposed.
    # The IP alternative keeps the standalone pattern's trailing \b so
    # an invalid quad (user@192.168.1.1234) is not partially redacted.
    "email": (
        r"[A-Za-z0-9._%+-]+@(?:[A-Za-z0-9.-]+\.[A-Za-z]{2,}|"
        + _IPV4
        + r"\b)"
    ),
    "ipv4": r"\b" + _IPV4 + r"\b",
    # international-ish: optional +, 9-15 digits with optional
    # space/dash/paren separators, ends on a digit. '.' is deliberately
    # NOT a separator: dotted digit runs are overwhelmingly IPs /
    # version strings (999.999.999.999 must survive the ipv4 range
    # check un-redacted), and RE2-compatibility rules out the
    # lookaround that could tell them apart — dot-separated phones are
    # the documented miss.
    "phone": r"(?:\+?[0-9][0-9()\- ]{7,20}[0-9])",
}


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def redact_expr(
    text: Column | str,
    kinds: tuple[str, ...] = ("url", "email", "ipv4", "phone"),
    token_fmt: str = "<{kind}>",
) -> Column:
    """Replace each PII match with its kind token (e.g. ``<email>``).

    One chained `regexp_replace` per kind in PII_PATTERNS order
    (subset-selectable via ``kinds``); the chain is a single codegen'd
    projection — no intermediate strings persist."""
    out = _col(text)
    for kind in PII_PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(
                out, F.lit(PII_PATTERNS[kind]), F.lit(token_fmt.format(kind=kind))
            )
    return out


def pii_counts(
    text: Column | str,
    kinds: tuple[str, ...] = ("url", "email", "ipv4", "phone"),
) -> dict[str, Column]:
    """Per-kind match counts (audit signal: rank documents/sources by
    PII density before deciding to redact vs drop).

    Counts are taken on the PROGRESSIVELY REDACTED text, mirroring
    redact_expr's order — so a URL containing an email counts once, as
    a URL, and the reported counts are exactly the number of tokens
    redact_expr would emit."""
    counts: dict[str, Column] = {}
    cur = _col(text)
    for kind in PII_PATTERNS:
        if kind in kinds:
            counts[f"n_{kind}"] = F.regexp_count(cur, F.lit(PII_PATTERNS[kind]))
            cur = F.regexp_replace(
                cur, F.lit(PII_PATTERNS[kind]), F.lit(f"<{kind}>")
            )
    return counts
