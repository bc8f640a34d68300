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


# --- public-suffix registered domain -------------------------------------
# `host_suffix(levels=2)` is the WRONG domain-quota key at web scale: it
# merges every *.co.uk site into one "co.uk" quota bucket and splits
# user-site platforms (github.io, blogspot.com) that the Public Suffix
# List treats as suffixes. The PSL algorithm (publicsuffix.org/list):
# exception rule (!x) wins and its public suffix is the rule minus its
# leading label; else the LONGEST matching rule wins, where `*` matches
# exactly one label; no rule matched -> the implicit `*` rule (TLD is
# public). Registered domain = public suffix + one more label; NULL when
# the host IS a public suffix.
#
# PSL_RULES below is a deliberately small embedded subset covering every
# rule KIND (exact multi-label, wildcard, exception, private-section
# platform suffixes) — at deployment the full list is a ~240 KB config
# swap, which changes only this tuple, not the algorithm. Spark side:
# static per-length candidate columns (the list's max rule length bounds
# the loop at plan-build time), pure codegen'd exprs, no UDF, no join —
# the rule set rides the serialized plan like a broadcast literal.
PSL_RULES = (
    "com", "org", "net", "io", "fr", "jp", "au", "uk", "ck", "example",
    "co.uk", "org.uk", "ac.uk", "co.jp", "com.au",
    "*.ck", "!www.ck",
    "github.io", "blogspot.com",
)

_PSL_EXACT = frozenset(r for r in PSL_RULES if not r.startswith(("*.", "!")))
_PSL_WILD = frozenset(r[2:] for r in PSL_RULES if r.startswith("*."))
_PSL_EXC = frozenset(r[1:] for r in PSL_RULES if r.startswith("!"))
_PSL_MAX_LEN = max(len(r.lstrip("!").split(".")) for r in PSL_RULES)


def public_suffix_len(host: Column) -> Column:
    """Label count of ``host``'s public suffix under PSL_RULES (0 when the
    exception rule shrinks the suffix past the root — impossible with a
    well-formed list, kept total anyway)."""
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    ps = F.lit(1)  # the PSL's implicit `*` rule: any TLD is public
    # Longer rules override shorter: ascending-i whens, later wins via
    # reassignment; exceptions override everything at their length.
    for i in range(1, _PSL_MAX_LEN + 1):
        cand = F.array_join(
            F.slice(labels, n - (i - 1), i), ".")
        if _PSL_EXACT:
            ps = F.when((n >= i) & cand.isin(*sorted(_PSL_EXACT)),
                        F.lit(i)).otherwise(ps)
        if _PSL_WILD and i >= 2:
            # `*.x` is an (len(x)+1)-label rule: one label, then x.
            tail = F.array_join(F.slice(labels, n - (i - 2), i - 1), ".")
            ps = F.when((n >= i) & tail.isin(*sorted(_PSL_WILD)),
                        F.lit(i)).otherwise(ps)
    for i in range(1, _PSL_MAX_LEN + 2):
        if _PSL_EXC:
            cand = F.array_join(F.slice(labels, n - (i - 1), i), ".")
            ps = F.when((n >= i) & cand.isin(*sorted(_PSL_EXC)),
                        F.lit(i - 1)).otherwise(ps)
    return ps


def registered_domain(u: Column) -> Column:
    """Registered (PSL-effective second-level) domain of an absolute URL's
    host: 'https://a.b.site.co.uk/x' -> 'site.co.uk';
    'https://u.github.io/p' -> 'u.github.io' (platform suffix);
    NULL when the host is itself a public suffix ('https://com/')."""
    host = F.lower(F.regexp_extract(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        r"^(?:.*@)?([^:@]*)", 1,
    ))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ps = public_suffix_len(host)
    return F.when(
        (host != "") & (n > ps),
        F.array_join(F.slice(labels, n - ps, ps + 1), "."),
    )


def psl_registered_domain_sql(host_expr: str) -> str:
    """DuckDB twin of registered_domain over a host expression, emitted
    from the SAME PSL_RULES tuple so the two engines cannot drift. Used
    by oracle SQL that needs PSL semantics inside DuckDB."""
    ls = f"string_split(lower({host_expr}), '.')"
    n = f"len({ls})"

    def _suffix(i: int) -> str:  # last i labels, joined
        return (f"array_to_string(array_slice({ls}, {n} - {i - 1}, {n}),"
                " '.')")

    def _in(vals: frozenset) -> str:
        return "(" + ", ".join(f"'{v}'" for v in sorted(vals)) + ")"

    ps = "1"
    for i in range(1, _PSL_MAX_LEN + 1):
        if _PSL_EXACT:
            ps = (f"CASE WHEN {n} >= {i} AND {_suffix(i)} IN "
                  f"{_in(_PSL_EXACT)} THEN {i} ELSE {ps} END")
        if _PSL_WILD and i >= 2:
            tail = (f"array_to_string(array_slice({ls}, {n} - {i - 2}, {n}),"
                    " '.')")
            ps = (f"CASE WHEN {n} >= {i} AND {tail} IN {_in(_PSL_WILD)} "
                  f"THEN {i} ELSE {ps} END")
    for i in range(1, _PSL_MAX_LEN + 2):
        if _PSL_EXC:
            ps = (f"CASE WHEN {n} >= {i} AND {_suffix(i)} IN "
                  f"{_in(_PSL_EXC)} THEN {i - 1} ELSE {ps} END")
    return (
        f"CASE WHEN lower({host_expr}) <> '' AND {n} > ({ps}) THEN "
        f"array_to_string(array_slice({ls}, {n} - ({ps}), {n}), '.') "
        "END"
    )
