"""URL canonicalization — the crawl-dedup prerequisite (two crawls of the
same page differ only in scheme/host case, default ports, query-param
order, fragments). Pure native expressions (regexp + array_sort), no UDF,
so the normalization codegens and the downstream url-hash partitioning /
exact dedup sees one key per logical page.

Scope: scheme+host lowercasing, default-port stripping (http:80,
https:443), query-parameter sort, fragment removal, userinfo stripping
(credentials never distinguish pages and must not leak into dedup keys),
empty path -> '/' (RFC 3986 section 6.2.3: 'http://a.com' and
'http://a.com/' are the same resource), percent-escape hex uppercased
(section 6.2.2.1: %2f == %2F). Inputs with no '://' pass through
unchanged — a relative reference has no authority to normalize and a
'://'-prefixed key would collide distinct inputs. Empty-authority URLs
(file:///p) keep their path. Dot-segment path resolution is deliberately
out of scope (needs a fold; rare in crawl frontiers that already emit
absolute URLs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: N812


def _upper_escapes(c: Column) -> Column:
    """Uppercase the two hex digits of every %-escape (pure array exprs:
    split on '%', case up each piece's first two chars when they are hex,
    re-join) — '%2f' and '%2F' decode identically and must share a key."""
    parts = F.split(c, "%", -1)
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    fixed = F.transform(
        tail,
        lambda p: F.when(
            F.substring(p, 1, 2).rlike("^[0-9a-fA-F]{2}$"),
            F.concat(F.upper(F.substring(p, 1, 2)),
                     F.substring(p, 3, F.greatest(F.length(p) - 2, F.lit(0)))),
        ).otherwise(p),
    )
    return F.concat(
        F.element_at(parts, 1),
        F.aggregate(fixed, F.lit(""),
                    lambda acc, x: F.concat(acc, F.lit("%"), x)),
    )


def url_host(u: Column) -> Column:
    """Lowercased host[:port] of an absolute URL: authority up to /?#,
    userinfo stripped at the LAST '@' (RFC 3986: host may not contain
    '@'). The ONE host extractor shared by robots filtering and any
    host-keyed join — a second subtly-different regex is how mixed-case
    or userinfo'd urls silently miss their rules row."""
    authority = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    return F.lower(F.regexp_extract(authority, r"^(?:.*@)?([^@]*)$", 1))


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
    sorted_q = F.array_join(
        F.array_sort(F.split(_upper_escapes(query), "&")), "&"
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        # an empty path over a non-empty authority means '/', RFC 3986 6.2.3
        F.when((path == "") & (authority != ""), F.lit("/")).otherwise(
            _upper_escapes(path)
        ),
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )
    return F.when(u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), canon).otherwise(u)


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
