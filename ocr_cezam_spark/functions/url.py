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
# PSL_RULES is the FULL published list (publicsuffix.org, MPL-2.0),
# packaged verbatim at data/public_suffix_list.dat (~240 KB, ICANN +
# private sections) and parsed once at import: comment/blank lines
# dropped, and every IDN rule additionally contributes its punycode
# (xn--) twin so hosts match whether they arrive unicode or ACE-encoded.
# Spark side: static per-length candidate columns (the list's max rule
# length — 5 labels — bounds the loop at plan-build time), pure
# codegen'd exprs, no UDF, no join — the rule set rides the serialized
# plan like a broadcast literal, and each per-length membership test
# carries ONLY the rules of that exact label count, so the plan embeds
# each rule once (~10k strings total; Catalyst folds isin lists this
# long into an InSet hash lookup, constant-time per row).


def _punycode_rule(rule: str) -> str | None:
    """ACE twin of an IDN rule, label by label ('*' and ASCII labels pass
    through); None when a label refuses stdlib IDNA encoding."""
    bare = rule.lstrip("!")
    prefix = rule[: len(rule) - len(bare)]
    try:
        ace = ".".join(
            lbl if lbl == "*" or lbl.isascii()
            else lbl.encode("idna").decode("ascii")
            for lbl in bare.split(".")
        )
    except UnicodeError:
        return None
    return prefix + ace


def _load_psl_rules() -> tuple[str, ...]:
    # importlib.resources, not open(__file__-relative): the package is
    # deployed via spark-submit --py-files as a ZIP (tools/package.py),
    # where a filesystem path into the package does not exist but the
    # resources API reads through the archive.
    from importlib.resources import files

    text = (
        files("ocr_cezam_spark")
        .joinpath("data/public_suffix_list.dat")
        .read_text(encoding="utf-8")
    )
    rules: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rules.append(line)
        if not line.isascii():
            ace = _punycode_rule(line)
            if ace is not None and ace != line:
                rules.append(ace)
    return tuple(rules)


PSL_RULES = _load_psl_rules()


def _by_len(rules) -> dict[int, frozenset]:
    out: dict[int, set] = {}
    for r in rules:
        out.setdefault(len(r.split(".")), set()).add(r)
    return {k: frozenset(v) for k, v in out.items()}


_PSL_EXACT = _by_len(r for r in PSL_RULES if not r.startswith(("*.", "!")))
# a `*.x` rule is a (len(x)+1)-label rule: keyed by FULL rule length,
# valued by the x tail the candidate's last len(x) labels must equal
_PSL_WILD = _by_len(r[2:] for r in PSL_RULES if r.startswith("*."))
_PSL_WILD = {k + 1: v for k, v in _PSL_WILD.items()}
_PSL_EXC = _by_len(r[1:] for r in PSL_RULES if r.startswith("!"))
_PSL_MAX_LEN = max(
    max(_PSL_EXACT, default=1),
    max(_PSL_WILD, default=1),
    max(_PSL_EXC, default=1),
)


# With ~10k rules, building the membership tests as Column objects costs
# ~10 s of py4j literal round-trips PER QUERY BUILD. Instead the whole
# algorithm is registered ONCE per session as Spark SQL scalar functions
# (CREATE TEMPORARY FUNCTION ... RETURN <expr>): one JVM-side parse
# (~0.5 s), macro-expanded into every using plan at analysis — the IN
# lists become InSet hash lookups, still pure codegen'd expressions, no
# UDF, no join. Call sites pay one F.call_function.

_PS_LEN_FN = "ocr_psl_suffix_len"
_RD_FN = "ocr_psl_registered_domain"


def _spark_psl_len_sql(h: str) -> str:
    """Spark-SQL expression for the public-suffix label count of host
    expression ``h`` — same by-length rule dicts as the DuckDB emitter
    below, Spark slice/array_join syntax. `h` must already be lowercase."""
    ls = f"split({h}, '\\\\.')"
    n = f"size({ls})"

    def _suffix(i: int) -> str:
        return f"array_join(slice({ls}, {n} - {i - 1}, {i}), '.')"

    def _in(vals: frozenset) -> str:
        return "(" + ", ".join(f"'{v}'" for v in sorted(vals)) + ")"

    ps = "1"
    for i in range(1, _PSL_MAX_LEN + 1):
        if _PSL_EXACT.get(i):
            ps = (f"CASE WHEN {n} >= {i} AND {_suffix(i)} IN "
                  f"{_in(_PSL_EXACT[i])} THEN {i} ELSE {ps} END")
        if _PSL_WILD.get(i) and i >= 2:
            tail = f"array_join(slice({ls}, {n} - {i - 2}, {i - 1}), '.')"
            ps = (f"CASE WHEN {n} >= {i} AND {tail} IN {_in(_PSL_WILD[i])} "
                  f"THEN {i} ELSE {ps} END")
    for i in range(1, _PSL_MAX_LEN + 2):
        if _PSL_EXC.get(i):
            ps = (f"CASE WHEN {n} >= {i} AND {_suffix(i)} IN "
                  f"{_in(_PSL_EXC[i])} THEN {i - 1} ELSE {ps} END")
    return ps


def register_psl_functions(s) -> None:
    """Idempotently register the PSL SQL functions on session ``s``
    (tagged on the session object so re-registration is skipped).

    Session-binding contract: TEMPORARY functions live on ONE session.
    `registered_domain`/`public_suffix_len` auto-register on whichever
    session is ACTIVE when the Column is built — correct whenever the
    Column is built and executed on the same session (every call path
    in this repo). A multi-session application that builds Columns
    under session A and executes them on session B must call this
    function on B explicitly, and Columns cannot be built before any
    session exists at all (the builders raise a clear RuntimeError)."""
    if getattr(s, "_ocr_psl_fns_ready", False):
        return
    s.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {_PS_LEN_FN}(h STRING) "
        f"RETURNS INT RETURN {_spark_psl_len_sql('lower(h)')}"
    )
    ls = "split(lower(h), '\\\\.')"
    n = f"size({ls})"
    ps = f"{_PS_LEN_FN}(h)"
    s.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {_RD_FN}(h STRING) "
        f"RETURNS STRING RETURN "
        f"CASE WHEN lower(h) <> '' AND {n} > {ps} THEN "
        f"array_join(slice({ls}, {n} - {ps}, {ps} + 1), '.') END"
    )
    s._ocr_psl_fns_ready = True


def _ensure_psl_fns() -> None:
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "registered_domain/public_suffix_len need an active "
            "SparkSession (or call register_psl_functions(session) "
            "explicitly — see its session-binding contract)"
        )
    register_psl_functions(s)


def public_suffix_len(host: Column) -> Column:
    """Label count of ``host``'s public suffix under PSL_RULES (0 when the
    exception rule shrinks the suffix past the root — impossible with a
    well-formed list, kept total anyway)."""
    _ensure_psl_fns()
    return F.call_function(_PS_LEN_FN, host)


def registered_domain(u: Column) -> Column:
    """Registered (PSL-effective second-level) domain of an absolute URL's
    host: 'https://a.b.site.co.uk/x' -> 'site.co.uk';
    'https://u.github.io/p' -> 'u.github.io' (platform suffix);
    NULL when the host is itself a public suffix ('https://com/')."""
    _ensure_psl_fns()
    host = F.lower(F.regexp_extract(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        r"^(?:.*@)?([^:@]*)", 1,
    ))
    return F.call_function(_RD_FN, host)


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
        if _PSL_EXACT.get(i):
            ps = (f"CASE WHEN {n} >= {i} AND {_suffix(i)} IN "
                  f"{_in(_PSL_EXACT[i])} THEN {i} ELSE {ps} END")
        if _PSL_WILD.get(i) and i >= 2:
            tail = (f"array_to_string(array_slice({ls}, {n} - {i - 2}, {n}),"
                    " '.')")
            ps = (f"CASE WHEN {n} >= {i} AND {tail} IN {_in(_PSL_WILD[i])} "
                  f"THEN {i} ELSE {ps} END")
    for i in range(1, _PSL_MAX_LEN + 2):
        if _PSL_EXC.get(i):
            ps = (f"CASE WHEN {n} >= {i} AND {_suffix(i)} IN "
                  f"{_in(_PSL_EXC[i])} THEN {i - 1} ELSE {ps} END")
    return (
        f"CASE WHEN lower({host_expr}) <> '' AND {n} > ({ps}) THEN "
        f"array_to_string(array_slice({ls}, {n} - ({ps}), {n}), '.') "
        "END"
    )
