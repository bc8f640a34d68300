"""Property-based kernel robustness: never raises, always deterministic,
fault-isolates pathological input (the try/except-continue contract of
ocr_cezam.py:67-83 re-expressed as error rows)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_cezam_spark import kernel
from ocr_cezam_spark.kernel import extract

html_fragments = st.lists(
    st.sampled_from(
        list("abc <>/=&;#!-\"'\n\t") + ["<div>", "</div>", "<p>", "<table>",
                                        "<tr>", "<td>", "&amp;", "&lt;", "<!--",
                                        "-->", "<script>", "</script>"]
    ),
    max_size=120,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(html_fragments)
def test_never_raises_and_deterministic(frag):
    a = extract("u", frag.encode(), "fra")
    b = extract("u", frag.encode(), "fra")
    assert a == b
    assert isinstance(a["text"], str)
    assert a["url"] == "u"


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=300))
def test_arbitrary_bytes(payload):
    r = extract("u", payload, "eng")
    assert r["error"] is None or isinstance(r["error"], str)


words = st.text(
    alphabet=st.sampled_from(list("abcxyz:°’'0123456789 ")), max_size=40
)
lines_of_words = st.lists(
    st.lists(st.sampled_from(
        ["Nom:", "nom:", "x", ":", "carte", "N°", "avis", "d'impôt",
         "Avis", "d’impôt", "12/03/2024", "123456789012", "", "a:b:c"]
    ), min_size=1, max_size=8),
    max_size=10,
)


@settings(max_examples=200, deadline=None)
@given(lines_of_words)
def test_field_parsers_never_raise(lines):
    for trigger, idx in (("nom:", 0), ("taille:", 1)):
        v = kernel.get_field_after_colon(lines, trigger, idx)
        assert v is None or (isinstance(v, str) and v)
    idn = kernel.get_id_number(lines)
    assert idn is None or len(idn) == 12
    td = kernel.get_tax_date(lines)
    assert td is None or isinstance(td, str)


@settings(max_examples=200, deadline=None)
@given(words)
def test_doc_kind_total_function(text):
    kind = kernel.detect_doc_kind(text)
    assert kind in ("statement", "id_card", "passport", "residence_permit",
                    "tax_notice", "fiscal", "web_page")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("0123456789/. ")), max_size=16),
       st.sampled_from([None, "fr", "slash", "dot"]))
def test_get_date_never_raises(cand, fmt):
    out = kernel.get_date([[cand]], fmt)
    if out is not None:
        day, month, year = out.split(" ")
        assert month in kernel.FR_MONTHS and 1 <= int(day) <= 31


def test_deep_nesting_fault_isolated():
    html = b"<body>" + b"<div>" * 20000 + b"x" + b"</div>" * 20000 + b"</body>"
    r = extract("u", html, "fra")
    # either parses (iterative tokenizer) or becomes an error row — never
    # an exception escaping the kernel
    assert isinstance(r["text"], str)


def test_huge_flat_page():
    html = b"<body><div>" + b"<p>word " * 50000 + b"</div></body>"
    r = extract("u", html, "fra")
    assert r["error"] is None and len(r["text"]) > 100000


# --- PDF path properties ---------------------------------------------------

_pdf_line = st.text(
    alphabet=st.characters(
        codec="cp1252", exclude_characters="\x00",
        exclude_categories=("Cc", "Cs"),
    ),
    min_size=1, max_size=40,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(_pdf_line, min_size=1, max_size=8), st.booleans())
def test_pdf_build_parse_roundtrip(lines, compress):
    from ocr_cezam_spark.corpus import build_pdf

    blob = build_pdf(lines, compress=compress)
    got = kernel.pdf_text(blob).split("\n")
    expect = [n for n in (kernel._norm(l) for l in lines) if n]
    assert got == (expect or [""])


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_pdf_extract_never_raises_on_garbage(blob):
    r = extract("u", b"%PDF-" + blob, "fra")
    s = extract("u", b"%PDF-" + blob, "fra")
    assert r == s and r["error"] is None


link_fragments = st.lists(
    st.sampled_from(
        list("ab /<>=&;#?'\"") + [
            "<a href=", "<a data-href=", "</a>", "\"/p?x=1&copy=2\"",
            "'rel'", "#frag", "javascript:x", "https://h.example/x",
            "//cdn.example/y", "&amp;", "<!--", "-->", "<script>",
            "</script>", "mailto:a@b.c",
            "&#xD800;", "&#xDFFF;", "&#x110000;", "&#0;", "&#x92;",
        ]
    ),
    max_size=60,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(link_fragments)
def test_extract_links_never_raises_and_only_http(frag):
    """Arbitrary anchor-shaped soup: extract_links must never raise, must
    be deterministic, and every emitted frontier url must be an absolute
    http(s) url (the urljoin+scheme-filter contract)."""
    a = kernel.extract_links("https://base.example/dir/page", frag)
    b = kernel.extract_links("https://base.example/dir/page", frag)
    assert a == b
    for u, t in a:
        assert u.startswith(("http://", "https://")), u
        # UTF-8 encodable — a lone surrogate here would escape extract()'s
        # per-row error guard and kill the whole Arrow batch downstream.
        u.encode("utf-8")
        t.encode("utf-8")
        assert len(t) <= kernel.ANCHOR_TEXT_MAX
    pa.array([u for u, _ in a], type=pa.string())
    pa.array([t for _, t in a], type=pa.string())


_HREF_CHARS = st.sampled_from(list("abcXYZ019/.:?#&%;=_- \t\n\x01é") + ["//", "../", "./"])


@given(st.lists(_HREF_CHARS, min_size=1, max_size=12).map("".join),
       st.sampled_from([
           "https://h.example/a/b.html", "https://h.example/",
           "https://h.example", "http://h.example:8080/x/y?q#f",
           "https://u:p@h.example/a/", "ftp://h.example/a/b",
       ]))
@settings(max_examples=400, deadline=None)
def test_make_resolver_matches_urljoin(raw, base):
    """The concat fast path in kernel._make_resolver must be
    OBSERVATIONALLY IDENTICAL to urllib.parse.urljoin for every href —
    the guards either route to the concat case (proven equal) or fall
    back to urljoin itself."""
    from urllib.parse import urljoin

    from ocr_cezam_spark.kernel import _make_resolver

    try:
        want = urljoin(base, raw)
    except ValueError:
        want = None
    assert _make_resolver(base)(raw) == want


def test_make_resolver_empty_query_before_fragment():
    """Regression (r6 ADVICE): 'page?#frag' — urljoin DROPS the lone '?'
    but the concat fast path used to keep it. The '?#' guard must route
    every such href to urljoin on both base shapes."""
    from urllib.parse import urljoin

    from ocr_cezam_spark.kernel import _make_resolver

    for base in ("https://h.example/a/b.html", "https://h.example/"):
        for raw in ("page?#frag", "/x?#f", "a/b?#", "?q?#f"):
            assert _make_resolver(base)(raw) == urljoin(base, raw)
