"""URL canonicalization — the crawl-layer dedup key.

Web-scale corpora dedup by CANONICAL URL before (and after) fetch:
the same page arrives as `HTTPS://WWW.Site.com/a/?utm_source=feed&id=3`
and `https://site.com/a?id=3`, and byte-level text dedup only catches
it after paying the fetch + storage. Canonicalization rules here are
the standard conservative subset (RFC 3986 §6 + tracker stripping):

  - scheme and host lowercased (path stays case-sensitive per the RFC);
  - leading `www.` stripped;
  - fragment dropped;
  - trailing slashes on the path stripped;
  - tracking parameters removed (utm_*, ref, fbclid, gclid);
  - surviving query parameters SORTED (order-insensitive identity).

Everything is a chain of regexp/array expressions from the Java-regex /
RE2 common subset (textclean.py discipline), so the identical logic
embeds in the DuckDB oracle and the canonical key is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params dropped during canonicalization (anchored full-key
# match against the `key=` prefix of each query parameter)
TRACKER_RE = r"^(utm_[^=]*|ref|fbclid|gclid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    rest = F.regexp_replace(
        F.regexp_replace(url, r"^[A-Za-z]+://", ""), r"#.*$", ""
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1)), r"^www\.", ""
    )
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_replace(
        F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKER_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(
            F.lit("")
        ),
    )
