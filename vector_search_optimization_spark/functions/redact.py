"""PII detection / redaction — pure column expressions.

A training-data pipeline scrubs emails, URLs, IPv4 addresses, and phone
numbers before anything ships to a model. All four detectors are regex
``regexp_replace`` / ``regexp_extract_all`` expressions (JVM-side,
whole-stage codegen — no Python in the hot path), written in the common
Java-regex/RE2 subset so the DuckDB oracle runs the byte-identical
patterns.

Application order is part of the contract: URL first (so an email-shaped
userinfo inside a URL is consumed by <URL>), then email, IPv4, phone.
Both the Spark path and the oracle apply the same order.

Scale: pure projection — map-only at any corpus size; the counters and
the redacted text come from one scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Common Java-regex / RE2 subset: no lookbehind, no possessive
# quantifiers, \b ASCII word boundaries only.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{3,4}\b"

# (pattern, replacement) in application order — the contract.
REDACTIONS: list[tuple[str, str]] = [
    (URL_RE, "<URL>"),
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Match counts per PII class, measured on the raw text (before any
    replacement, so counts are independent of application order)."""
    t = _c(text)
    # idx=0 = the whole match (the patterns have no capture groups;
    # Spark's default idx is 1, which then errors)
    return {
        "n_url": F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)),
        "n_email": F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)),
        "n_ip": F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)),
        "n_phone": F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)),
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its class tag, in REDACTIONS order."""
    t = _c(text)
    for pattern, tag in REDACTIONS:
        t = F.regexp_replace(t, pattern, tag)
    return t
