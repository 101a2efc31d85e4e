"""URL canonicalization for dedup — the first pass of web-corpus curation:
two crawls of the same page differ only in scheme/host case, default
ports, tracking parameters, parameter order, and fragments, so exact
dedup must run on a canonical form of the URL, not the raw string.

Pure built-in expressions (regexp + array functions, codegen'd — no UDF),
written to a regex/semantics subset that DuckDB reproduces exactly so the
registry entry has a full SQL oracle twin.

Canonical form:
  * drop the #fragment
  * lowercase scheme://host and strip default ports :80/:443
  * drop tracking query params (utm_*, ref, fbclid), sort the rest
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query params that never identify content: any utm_* (with or without a
# value), and valueless or valued ref/fbclid. Shared semantically with the
# SQL oracle twin in registry/llm_ops.py (llm_url_canonical_dedup).
TRACKING_PARAM_PATTERN = "^(utm_[^=]*|ref|fbclid)(=|$)"
# Default-port stripping is scheme-aware: :80 is only a default for http,
# :443 only for https — stripping cross-scheme would conflate distinct
# resources (http://h:443 is NOT http://h).
HTTP_PORT_PATTERN = "^(http://[^/]*):80$"
HTTPS_PORT_PATTERN = "^(https://[^/]*):443$"
URL_PREFIX_PATTERN = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]+)"


def canonicalize_url(url: Column) -> Column:
    """Canonical URL string per the module contract above."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    # split into base ? query; F.get returns NULL when there is no '?'
    parts = F.split(no_frag, "\\?", 2)
    base = F.get(parts, 0)
    qs = F.coalesce(F.get(parts, 1), F.lit(""))
    # scheme://host[:port] prefix is case-insensitive per RFC 3986; the
    # path after it is not and passes through untouched
    prefix = F.regexp_extract(base, URL_PREFIX_PATTERN, 1)
    prefix_lc = F.regexp_replace(
        F.regexp_replace(F.lower(prefix), HTTP_PORT_PATTERN, "$1"),
        HTTPS_PORT_PATTERN,
        "$1",
    )
    path = F.substring(base, F.length(prefix) + 1, F.length(base))
    params = F.filter(
        F.split(qs, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_PATTERN),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        prefix_lc,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )
