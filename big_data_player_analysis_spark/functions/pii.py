"""PII detection/redaction for training-data curation — the standard
pre-release scrub pass: emails, IPv4 addresses, and phone-like digit runs
are detected and replaced with typed placeholder tokens before a corpus
ships to training.

Pure built-in expressions (regexp_count / regexp_replace, codegen'd — no
UDF), patterns written to the regex subset Java and RE2 (DuckDB) evaluate
identically: no lookaround, no backreferences, ASCII word boundaries only.
Redaction order is fixed (email -> ipv4 -> phone) and must match the SQL
oracle twin in registry/llm_ops.py (llm_pii_redact) clause for clause,
because each pass consumes characters the next pass can no longer match.

Scale shape: narrow per-row projection — no shuffle, no UDF; a 100 TB
corpus redacts at scan speed and the counts aggregate partial map-side.

The reference has no text operators (SURVEY.md §2.3); extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international-ish phone: +country then 7..14 digits with optional
# single spaces/dashes between them (two-digit minimum prefix avoids
# swallowing plain numbers)
PHONE_PATTERN = r"\+\d{1,3}[ -]?\d{2,4}([ -]?\d{2,4}){2,4}"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type PII match counts (emails / ipv4 / phones) for a text
    column. Counted on the RAW text, before any redaction pass."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_PATTERN)),
        "n_ipv4": F.regexp_count(text, F.lit(IPV4_PATTERN)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_PATTERN)),
    }


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder token, applied
    in the fixed order email -> ipv4 -> phone."""
    out = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PATTERN, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_PATTERN, PHONE_TOKEN)
