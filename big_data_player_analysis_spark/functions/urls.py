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

# Query params that never identify content. Anchored prefix regex shared
# (textually) with the SQL twin in registry/llm_ops.py.
TRACKING_PARAM_PATTERN = "^(utm_|ref=|fbclid=)"
DEFAULT_PORT_PATTERN = ":(443|80)$"
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
    prefix_lc = F.regexp_replace(F.lower(prefix), DEFAULT_PORT_PATTERN, "")
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
