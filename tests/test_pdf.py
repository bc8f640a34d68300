"""PDF layout-parse path: pure-python parser semantics, generator
round-trip, and the mixed HTML+PDF corpus through the Spark pipeline."""

from __future__ import annotations

from ocr_cezam_spark import kernel
from ocr_cezam_spark.corpus import build_pdf, make_page, make_pdf_page, pdf_corpus_df
from ocr_cezam_spark.operators import extract as X


def test_pdf_text_roundtrip_raw_and_flate():
    lines = ["Première ligne é à ç", "seconde (avec) \\ parens", "33 €"]
    for compress in (False, True):
        blob = build_pdf(lines, compress=compress)
        assert blob.startswith(b"%PDF-1.4")
        got = kernel.pdf_text(blob).split("\n")
        assert got == [kernel._norm(l) for l in lines], compress


def test_pdf_string_escapes():
    # octal escape \351 = é (latin-1), \n escape, nested parens
    body = (b"BT 0 0 Td (caf\\351 (nested) ok) Tj "
            b"0 -14 Td (tab\\there) Tj ET")
    blob = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF\n")
    got = kernel.pdf_text(blob)
    assert got.split("\n") == ["café (nested) ok", "tab here"]


def test_pdf_malformed_streams_are_skipped():
    # corrupt flate body: stream skipped, no exception; remaining raw
    # stream still parsed
    bad = (b"%PDF-1.4\n<< /Filter /FlateDecode /Length 4 >>\nstream\n"
           b"\xff\xff\xff\xff\nendstream\n"
           b"<< /Length 20 >>\nstream\nBT 0 0 Td (ok) Tj ET\nendstream\n")
    assert kernel.pdf_text(bad) == "ok"
    # non-PDF binary through extract() never raises
    r = kernel.extract("u", b"%PDF-corrupt garbage", "fra")
    assert r["error"] is None and r["text"] == ""


def test_pdf_statement_dispatch():
    """PDF statements run the SAME per-kind extractors as HTML ones: bank
    id, configured date format, name/phone/email fields."""
    p = make_pdf_page(0)  # kind 0 = statement
    r = kernel.extract(p["url"], p["html"], p["lang"])
    f = r["fields"]
    assert f["doc_kind"] == "statement"
    assert "bank_id" in f and "date" in f and "full_name" in f
    assert f["date"].split(" ")[1] in kernel.FR_MONTHS
    p1 = make_pdf_page(1)  # tax notice
    f1 = kernel.extract(p1["url"], p1["html"], p1["lang"])["fields"]
    assert f1["doc_kind"] == "tax_notice" and "tax_date" in f1


def test_mixed_html_pdf_corpus_through_spark(spark):
    """One DataFrame mixing HTML and PDF payloads: the sniff dispatches
    per row inside the Arrow kernel; outputs match per-doc kernel calls."""
    html_docs = [make_page(i) for i in range(6)]
    pdf_docs = [make_pdf_page(i) for i in range(6)]
    rows = [(p["url"], p["html"]) for p in html_docs + pdf_docs]
    df = spark.createDataFrame(rows, "url string, html binary").selectExpr(
        "url", "html", "'fra' AS lang"
    )
    got = {
        r["url"]: r["text"]
        for r in X.extracted_text(X.run_extract(df, 4)).collect()
    }
    for p in html_docs + pdf_docs:
        expect = kernel.extract(p["url"], p["html"], "fra")["text"]
        assert got[p["url"]] == expect, p["url"]


def test_pdf_corpus_df_deterministic(spark):
    a = {r["url"]: bytes(r["html"]) for r in pdf_corpus_df(spark, 10).collect()}
    for i in range(10):
        p = make_pdf_page(i)
        assert a[p["url"]] == p["html"]


def test_pdf_tj_arrays_and_hex_strings():
    # TJ kerning arrays concatenate their strings; hex strings decode as
    # byte pairs (odd digit zero-padded); '<<' dicts inside BT are not
    # strings (BDC marked-content properties)
    body = (b"BT /F1 12 Tf 0 0 Td [(Inter) -20 (ETS)] TJ "
            b"0 -14 Td <43616656> Tj "
            b"/Span <</ActualText (x)>> BDC 0 -14 Td (fin) Tj EMC ET")
    blob = (b"%PDF-1.4\n<< /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream\n%%EOF\n")
    got = kernel.pdf_text(blob).split("\n")
    # the (x) lives inside the BDC properties dict, not shown text
    assert got == ["InterETS", "CafV", "fin"], got


def test_pdf_tj_word_gap_kerning():
    # a kern <= -180/1000 em between TJ strings is an inter-word gap and
    # becomes a space; smaller (same-word) kerns still concatenate
    body = (b"BT 0 0 Td [(SOLDE) -250 (CREDITEUR) -20 (S)] TJ "
            b"0 -14 Td [(fin) -179.5 (al)] TJ ET")
    blob = (b"%PDF-1.4\n<< /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream\n%%EOF\n")
    got = kernel.pdf_text(blob).split("\n")
    assert got == ["SOLDE CREDITEURS", "final"], got


def test_pdf_length_bounds_body_containing_endstream():
    # a /Length-bounded body that CONTAINS the byte sequence 'endstream'
    # (e.g. inside a compressed blob) must not be truncated at it
    import zlib

    text = b"BT 0 0 Td (bounded) Tj ET"
    # craft a raw body embedding the literal: raw stream whose shown text
    # includes 'endstream' as data inside a literal string
    body = b"BT 0 0 Td (before endstream after) Tj ET"
    blob = (b"%PDF-1.4\n<< /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream\n")
    assert kernel.pdf_text(blob) == "before endstream after"
    # flate body that happens to contain b'endstream' mid-deflate
    comp = zlib.compress(text, 9)
    assert b"endstream" not in comp  # sanity of the synthetic case
    # force the scenario: append a second stream whose compressed body we
    # corrupt-check is still bounded correctly by /Length
    blob2 = (b"%PDF-1.4\n<< /Filter /FlateDecode /Length "
             + str(len(comp)).encode() + b" >>\nstream\n" + comp
             + b"\nendstream\n")
    assert kernel.pdf_text(blob2) == "bounded"


def test_pdf_indirect_length_falls_back_to_scan():
    body = b"BT 0 0 Td (via scan) Tj ET"
    blob = (b"%PDF-1.4\n<< /Length 5 0 R >>\nstream\n" + body
            + b"\nendstream\n")
    assert kernel.pdf_text(blob) == "via scan"


def test_pdf_magic_within_first_kilobyte():
    # junk/BOM before %PDF- within 1024 bytes still dispatches to the PDF
    # path; magic beyond 1024 does not
    body = b"BT 0 0 Td (late magic) Tj ET"
    pdf = (b"%PDF-1.4\n<< /Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\n%%EOF\n")
    r = kernel.extract("u", b"\xef\xbb\xbfjunk-prefix\n" + pdf, "fra")
    assert r["text"] == "late magic"
    r2 = kernel.extract("u", b" " * 1100 + pdf, "fra")
    assert r2["text"] != "late magic"  # HTML path: payload treated as text


def test_pdf_word_boundary_operators():
    # 'ET' / 'Td' as substrings of shown text must never act as operators
    p = build_pdf(["RELEVE ET SOLDE TdX", "PETIT"], compress=False)
    assert kernel.pdf_text(p).split("\n") == ["RELEVE ET SOLDE TdX", "PETIT"]
