"""URL canonicalization — the crawl-dedup prerequisite (two crawls of the
same page differ only in scheme/host case, default ports, query-param
order, fragments). Pure native expressions (regexp + array_sort), no UDF,
so the normalization codegens and the downstream url-hash partitioning /
exact dedup sees one key per logical page.

Scope: scheme+host lowercasing, default-port stripping (http:80,
https:443), query-parameter sort, fragment removal, userinfo stripping
(credentials never distinguish pages and must not leak into dedup keys).
Empty-authority URLs (file:///p) keep their path. Dot-segment path
resolution is deliberately out of scope (needs a fold; rare in crawl
frontiers that already emit absolute URLs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: N812


def canonicalize_url(u: Column) -> Column:
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, "#.*$", "")  # fragment never reaches the server
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)  # may be empty (file:///)
    # userinfo ends at the LAST '@' of the authority (RFC 3986: host may
    # not contain '@'); credentials are stripped from the canonical key
    hostport = F.regexp_extract(authority, r"^(?:.*@)?([^@]*)$", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    keep_port = ~(
        (port == "")
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
        | ((scheme == F.lit("http")) & (port == F.lit("80")))
    )
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def host_suffix(u: Column, levels: int = 2) -> Column:
    """Last `levels` labels of the host (site-group key for per-domain
    quotas / skew stats): 'a.b.site.example.org' -> 'example.org'."""
    authority = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    host = F.lower(
        F.regexp_extract(authority, r"^(?:.*@)?([^:@]*)", 1)
    )
    parts = F.split(host, r"\.")
    return F.array_join(
        F.slice(parts, F.greatest(F.size(parts) - (levels - 1), F.lit(1)),
                levels),
        ".",
    )
