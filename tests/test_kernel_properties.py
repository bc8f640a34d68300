"""Property-based kernel robustness: never raises, always deterministic,
fault-isolates pathological input (the try/except-continue contract of
ocr_cezam.py:67-83 re-expressed as error rows)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

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
