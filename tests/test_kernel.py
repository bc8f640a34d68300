"""Pure-Python kernel tests: determinism, variant invariants, parsers.

The kernel is the reference implementation (SURVEY.md section 5) — these
tests freeze its semantics; test_extract_spark.py then requires the Spark
path to reproduce it byte-identically.
"""

from __future__ import annotations

from ocr_cezam_spark import kernel
from ocr_cezam_spark.corpus import corpus_rows, make_page


def _run(i: int) -> dict:
    p = make_page(i)
    return kernel.extract(p["url"], p["html"], p["lang"])


def test_deterministic_repeat():
    a = [_run(i) for i in range(32)]
    b = [_run(i) for i in range(32)]
    assert a == b


def test_no_errors_over_corpus():
    for i in range(160):
        assert _run(i)["error"] is None


def test_boilerplate_stripped():
    r = _run(0)
    # nav/footer/script/style text must not leak into the main text
    assert "copyright" not in r["text"]
    assert "breaking latest popular" not in r["text"]
    assert "var t=1" not in r["text"]
    assert "body{margin:0}" not in r["text"]


def test_statement_variants_statuses():
    # variants: 0/1 valid -> Success; 2 no solde -> Unknown; 3 corrupted ->
    # Error; 4 missing date column -> Unknown(columns missing)
    expected = {
        0: ("Success", "Table values match final solde value."),
        1: ("Success", "Table values match final solde value."),
        2: ("Unknown", "Not enough solde infos"),
        4: ("Unknown", "columns missing : date"),
    }
    for base in (0, 9, 18, 27):
        for v, (status, detail) in expected.items():
            got = _run(base + v)["statuses"]
            assert got and got[0][1] == status and got[0][2] == detail
        err = _run(base + 3)["statuses"]
        assert err[0][1] == "Error" and "don't match final solde value" in err[0][2]


def test_solde_arithmetic_matches_construction():
    """The reconciliation recomputes exactly the generator's invariant:
    closing = opening + sum(debit) - sum(credit)."""
    r = _run(0)
    cells = r["cells"]
    # reconstruct the table from long format
    by_row: dict[int, dict[int, str]] = {}
    for (t, row, col, val) in cells:
        by_row.setdefault(row, {})[col] = val
    rows = [
        [by_row[r_][c] for c in sorted(by_row[r_])] for r_ in sorted(by_row)
    ]
    status, detail = kernel.check_solde(rows)
    assert status == "Success"


def test_fields_present_on_statement_pages():
    for base in (0, 9, 45):
        f = _run(base)["fields"]
        assert f["doc_kind"] == "statement"
        for key in ("full_name", "address", "phone", "email", "date", "bank_id"):
            assert key in f, (base, key, f)


def test_doc_kind_dispatch_per_variant():
    """J2+J5+K8: every variant classifies to its kind and runs ONLY that
    kind's extractors — no cross-contamination fields. Variant 6 splits
    deterministically between passport and titre de séjour."""
    kinds = {0: ("statement",), 5: ("id_card",),
             6: ("passport", "residence_permit"), 7: ("fiscal",),
             8: ("tax_notice",)}
    for i, allowed in kinds.items():
        r = _run(i)
        kind = r["fields"]["doc_kind"]
        assert kind in allowed, i
        if kind != "statement":
            assert not r["statuses"] and "bank_id" not in r["fields"]
        if kind != "fiscal":
            assert not r["codes"]
        if kind not in ("id_card", "passport", "residence_permit"):
            assert "mrz_type" not in r["fields"]


def _first_variant6_of_kind(kind):
    for i in range(6, 6 + 9 * 40, 9):
        r = _run(i)
        if r["fields"]["doc_kind"] == kind:
            return r
    raise AssertionError(f"no variant-6 page of kind {kind} in 40 draws")


def test_key_value_and_id_number_fields():
    f = _run(5)["fields"]  # id card
    assert f["kv_nom"].isupper()
    assert f["kv_prenom"].isupper()
    assert f["kv_taille"].startswith("1,")
    # the corpus attaches the triggers as 'Carte,' and 'n°:' — only the
    # reference's substring-in-word match finds the 12-char number
    assert f["id_number"].isdigit() and len(f["id_number"]) == 12
    # passport / titre de séjour: MRZ only, never the key:value scan
    # (parse_passeport and parse_titre_sejour skip the field table)
    f6 = _first_variant6_of_kind("passport")["fields"]
    assert "kv_taille" not in f6 and "kv_nom" not in f6 and "id_number" not in f6


def test_residence_permit_mrz_only():
    r = _first_variant6_of_kind("residence_permit")
    f = r["fields"]
    assert f["mrz_type"] == "passport"  # 44-char passport-style decode
    assert f["mrz_nom"] and "kv_nom" not in f and "id_number" not in f


def test_tax_notice_date_last_token():
    f = _run(8)["fields"]
    assert f["doc_kind"] == "tax_notice"
    d, m, y = f["tax_date"].split("/")
    assert y == "2024" and 1 <= int(d) <= 28 and 1 <= int(m) <= 12


def test_bank_date_format_precedence():
    # the bank's configured format is tried first (process_fields.py:
    # 110-121 uses ONLY the configured format; the generic multi-try is
    # this repo's extension for bankless pages)
    assert kernel.get_date([["03/04/2024"]]) == "03 avril 2024"
    assert kernel.get_date([["03/04/2024"]], "slash") == "03 avril 2024"
    assert kernel.get_date([["01.02.2024"]], "dot") == "01 février 2024"
    # bank format misses -> generic fallback still applies
    assert kernel.get_date([["13/05/2024"]], "dot") == "13 mai 2024"
    # configured format wins across ALL candidates before any generic
    # fallback: an EARLIER line parseable only under a different format
    # must not short-circuit the configured-format scan (the reference
    # tries only the configured format)
    assert (kernel.get_date([["03/04/2024"], ["05.06.2024"]], "dot")
            == "05 juin 2024")
    assert (kernel.get_date([["05.06.2024"], ["03/04/2024"]], "slash")
            == "03 avril 2024")
    # every reference bank maps to a named format (bank_configs/*.json)
    assert set(kernel.BANK_DATE_FORMATS) == {b for b, _ in kernel.BANK_PATTERNS}
    assert set(kernel.BANK_DATE_FORMATS.values()) <= {"fr", "slash", "dot"}


def test_calendar_invalid_dates_rejected():
    # strptime and try_to_date both reject impossible dates; the kernel
    # must agree (30/02 used to pass the naive 1..31 day check)
    assert kernel.get_date([["30/02/2024"]], "slash") is None
    assert kernel.get_date([["31/04/2024"]]) is None
    assert kernel.get_date([["29/02/2024"]], "slash") == "29 février 2024"
    assert kernel.get_date([["29/02/2023"]], "slash") is None
    assert kernel.get_date([["31.11.2020"]], "dot") is None


def test_field_after_colon_and_id_number_units():
    lines = [["Titre"], ["Nom:", "DUPONT"], ["Prénom:", "ANNE", "MARIE"],
             ["N°", "de", "carte", "123456789012"]]
    assert kernel.get_field_after_colon(lines, "nom:", 0) == "DUPONT"
    assert kernel.get_field_after_colon(lines, "prénom:", 0) == "ANNE"
    assert kernel.get_field_after_colon(lines, "taille:", 0) is None
    assert kernel.get_id_number(lines) == "123456789012"
    assert kernel.get_id_number([["carte", "courte"]]) is None
    # substring-in-word trigger semantics (document_identite.py:203-209):
    # punctuation-attached tokens still fire
    assert kernel.get_id_number([["Carte,", "n°:", "123456789012"]]) == "123456789012"
    # pins the reference's known quirk: 'nom:' in 'prénom:' fires the
    # kv_nom trigger on a prénom row (see FIELD_SPECS comment) — this is
    # deliberate parity, not desired behavior in isolation
    assert kernel.get_field_after_colon([["Prénom:", "ANNE"]], "nom:", 0) == "ANNE"


def test_mrz_id_card_decode():
    f = _run(5)["fields"]
    assert f["mrz_type"] == "id_card"
    assert f["mrz_nom"] and "<" not in f["mrz_nom"]
    assert f["mrz_sexe"] in "MF"
    assert len(f["mrz_date_naissance"].split(".")) == 3


def test_mrz_passport_decode():
    f = _run(6)["fields"]
    assert f["mrz_type"] == "passport"
    assert f["mrz_numero"].isdigit() and len(f["mrz_numero"]) == 9
    assert len(f["mrz_date_validite"].split(".")) == 3


def test_fiscal_codes_extracted():
    r = _run(7)
    assert r["codes"], "variant 7 must yield fiscal codes"
    for (_t, code, pos, value) in r["codes"]:
        assert value.isdigit()
        in_numbers = any(code in v for v in kernel.FISCAL_NUMBER_CODES.values())
        in_letters = any(code in v for v in kernel.FISCAL_LETTER_CODES.values())
        assert in_numbers or in_letters


def test_date_parsing_formats():
    lines = [["12/05/2023"]]
    assert kernel.get_date(lines) == "12 mai 2023"
    assert kernel.get_date([["03.02.2021"]]) == "03 février 2021"
    assert kernel.get_date([["7", "août", "2020"]]) == "07 août 2020"
    assert kernel.get_date([["not", "a", "date"]]) is None


def test_check_solde_direct():
    rows = [
        ["Date", "Libellé", "Débit", "Crédit"],
        ["", "Solde précédent", "100,00", ""],
        ["01/03/2024", "achat", "25,50", ""],
        ["02/03/2024", "virement", "", "10,00"],
        ["", "Solde final", "115,50", ""],
    ]
    assert kernel.check_solde(rows) == (
        "Success",
        "Table values match final solde value.",
    )
    bad = [r[:] for r in rows]
    bad[-1][2] = "999,99"
    status, detail = kernel.check_solde(bad)
    assert status == "Error" and "115.5" in detail


def test_corrupt_page_yields_error_row_not_exception():
    r = kernel.extract("u", b"\xff\xfe garbage <div", "fra")
    assert r["url"] == "u" and isinstance(r["text"], str)


def test_corpus_schema_and_skew():
    rows = corpus_rows(400)
    hot = sum(
        1
        for r in rows
        if r["url"].split("/")[2].endswith(".example")
    )
    assert 0.2 < hot / len(rows) < 0.4  # ~30% on hot hosts
    langs = {r["lang"] for r in rows}
    assert langs == {"fra", "eng"}
    assert all(isinstance(r["html"], bytes) for r in rows[:10])


def test_charset_sniffing_decodes_declared_encodings():
    body = "<html><body><p>Café déjà vu et des mots qui suivent pour la longueur</p></body></html>"
    # windows-1252 declared via meta charset
    page = ('<html><head><meta charset="windows-1252"></head>'
            + body[6:]).encode("cp1252")
    out = kernel.extract("http://x/cp1252", page, "fr")
    assert "Café déjà" in out["text"]
    # iso-8859-1 declaration is decoded as its cp1252 superset (HTML5 rule)
    page2 = ('<html><head><meta http-equiv="Content-Type" '
             'content="text/html; charset=iso-8859-1"></head>'
             + body[6:]).encode("latin-1")
    out2 = kernel.extract("http://x/latin1", page2, "fr")
    assert "Café déjà" in out2["text"]
    # UTF-8 BOM wins over any declaration
    page3 = b"\xef\xbb\xbf" + body.encode("utf-8")
    assert "Café déjà" in kernel.extract("http://x/bom", page3, "fr")["text"]
    # UTF-16 LE BOM
    page4 = b"\xff\xfe" + body.encode("utf-16-le")
    assert "Café déjà" in kernel.extract("http://x/u16", page4, "fr")["text"]


def test_charset_sniffing_falls_back_to_utf8():
    body = "<html><body><p>Café simple page sans déclaration du tout ici</p></body></html>"
    # no declaration -> utf-8
    assert "Café" in kernel.extract("http://x/plain", body.encode(), "fr")["text"]
    # unknown charset name -> utf-8 fallback, never a raise
    page = body.replace("<body>", '<body><meta charset="x-klingon">').encode()
    assert "Café" in kernel.extract("http://x/bogus", page, "fr")["text"]


def test_robots_noindex_surfaced_as_field():
    body = ("<html><head><meta content=\"noindex, nofollow\" name='robots'>"
            "</head><body><p>page body words here for the scorer to keep"
            "</p></body></html>")
    out = kernel.extract("http://x/noidx", body.encode(), "fr")
    assert out["fields"].get("robots") == "noindex"
    # index,follow (or no robots meta) -> no field
    ok = body.replace("noindex, nofollow", "index, follow")
    assert "robots" not in kernel.extract("http://x/idx", ok.encode(), "fr")["fields"]
    plain = "<html><body><p>no robots meta at all on this page</p></body></html>"
    assert "robots" not in kernel.extract("http://x/none", plain.encode(), "fr")["fields"]


def test_robots_directive_after_colon_value_not_lost():
    page = ('<html><head><meta name="robots" '
            'content="max-snippet:-1, noindex"></head>'
            "<body><p>words for the content scorer here</p></body></html>")
    out = kernel.extract("http://x/colon", page.encode(), "fr")
    assert out["fields"].get("robots") == "noindex"


def test_meta_declared_utf16_is_treated_as_utf8():
    body = ('<html><head><meta charset="utf-16"></head>'
            "<body><p>Café words survive the lying charset tag</p>"
            "</body></html>")
    out = kernel.extract("http://x/lie16", body.encode("utf-8"), "fr")
    assert "Café words survive" in out["text"]


def test_html_mentioning_pdf_magic_stays_on_dom_path():
    page = ("<html><body><p>The file header %PDF-1.7 identifies portable "
            "documents and this page explains it at length</p></body></html>")
    out = kernel.extract("http://x/about-pdf", page.encode(), "fr")
    assert "identifies portable" in out["text"]


def test_pdf_magic_with_junk_prefix_still_parses():
    from ocr_cezam_spark.corpus import build_pdf

    blob = build_pdf(["Ligne de texte pour le test du prefixe"], compress=True)
    with_junk = b"\xef\xbb\xbf\x00junk" + blob
    out = kernel.extract("http://x/junkpdf", with_junk, "fr")
    assert "prefixe" in out["text"]


def test_pdf_length_regex_indirect_reference_not_truncated():
    from ocr_cezam_spark.kernel import _PDF_LENGTH_RX

    assert _PDF_LENGTH_RX.search(b"<</Length 123 0 R>>") is None
    assert _PDF_LENGTH_RX.search(b"<</Length 12 0 R>>") is None
    m = _PDF_LENGTH_RX.search(b"<</Length 123>>")
    assert m and m.group(1) == b"123"


def test_self_closing_script_keeps_following_text():
    page = ("<html><body><p><script/>Hello words kept</script>World after"
            "</p></body></html>")
    out = kernel.extract("http://x/selfclose", page.encode(), "fr")
    assert "Hello words kept" in out["text"]


def test_nested_table_text_goes_to_cells_not_main_text():
    page = ("<html><body><div><p>Intro paragraph words here today</p>"
            "<ul><li>item before <table><tr><td>cellvalue</td>"
            "<td>othercell</td></tr></table> item after</li></ul>"
            "</div></body></html>")
    out = kernel.extract("http://x/nested", page.encode(), "fr")
    assert "cellvalue" not in out["text"]
    assert "item before" in out["text"] and "item after" in out["text"]
    flat = [v for (_, _, _, v) in out["cells"]]
    assert "cellvalue" in flat and "othercell" in flat


def test_data_name_robots_attribute_is_not_a_directive():
    page = ('<html><head><meta data-name="robots" content="noindex">'
            "</head><body><p>visible words stay indexable here</p>"
            "</body></html>")
    out = kernel.extract("http://x/dataname", page.encode(), "fr")
    assert "robots" not in out["fields"]


def test_extract_links_resolution_and_filtering():
    page = (
        '<html><body>'
        '<a href="/rel/path">a</a>'
        '<a href="sibling">b</a>'
        '<a href="https://other.example/x">c</a>'
        '<a href="//cdn.example/lib.js">d</a>'
        '<a href="#frag">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<a href="mailto:x@y.z">skip</a>'
        "<a href='/quoted?a=1&amp;b=2'>e</a>"
        '<a href=bare>f</a>'
        '<a data-href="/template">skip</a>'
        '<a href="/dup">g</a><a href="/dup">g2</a>'
        '</body></html>'
    )
    got = kernel.extract_links("https://host.example/dir/page.html", page)
    assert [h for h, _ in got] == [
        "https://host.example/rel/path",
        "https://host.example/dir/sibling",
        "https://other.example/x",
        "https://cdn.example/lib.js",
        "https://host.example/quoted?a=1&b=2",
        "https://host.example/dir/bare",
        "https://host.example/dup",
        "https://host.example/dup",  # duplicates kept, positions matter
    ]
    assert [t for _, t in got] == ["a", "b", "c", "d", "e", "f", "g", "g2"]


def test_extract_links_skips_comments_scripts_and_keeps_literal_params():
    page = (
        '<html><body>'
        '<!-- <a href="/old-nav">commented out</a> -->'
        '<script>document.write(\'<a href="/tracked">x</a>\')</script>'
        '<style>a { color: red } /* <a href="/styled">y</a> */</style>'
        '<a href="/buy?item=1&copy=2">legit</a>'     # &copy not terminated
        '<a href="/q?a=1&amp;b=2">amp</a>'           # &amp; IS terminated
        '<a href="/n?x=&#47;slash">numeric</a>'
        '</body></html>'
    )
    got = kernel.extract_links("https://h.example/p", page)
    assert [h for h, _ in got] == [
        "https://h.example/buy?item=1&copy=2",  # browser-verbatim, not ©=2
        "https://h.example/q?a=1&b=2",
        "https://h.example/n?x=/slash",
    ]
    assert [t for _, t in got] == ["legit", "amp", "numeric"]


def test_extract_links_numeric_charref_end_state():
    """HTML5 numeric-charref end state (13.2.5.80), matching stdlib
    html.unescape: surrogates and >0x10FFFF become U+FFFD (chr() would
    yield a lone surrogate that pyarrow's UTF-8 encoder rejects — one
    hostile page would then kill the whole Arrow batch outside the
    per-row error guard), NUL/C1 remap via windows-1252, noncharacters
    drop."""
    import html as _html

    page = (
        '<a href="/s?a=&#xD800;b">lo-surrogate</a>'
        '<a href="/s?a=&#xDFFF;b">hi-surrogate</a>'
        '<a href="/s?a=&#x110000;b">overflow</a>'
        '<a href="/s?a=&#0;b">nul</a>'
        '<a href="/s?a=&#x92;b">c1-control</a>'
        '<a href="/s?a=&#xFDD0;b">nonchar</a>'
    )
    got = kernel.extract_links("https://h.example/p", page)
    assert [h for h, _ in got] == [
        "https://h.example/s?a=�b",
        "https://h.example/s?a=�b",
        "https://h.example/s?a=�b",
        "https://h.example/s?a=�b",
        "https://h.example/s?a=" + _html.unescape("&#x92;") + "b",
        "https://h.example/s?a=b",
    ]
    for u, t in got:
        u.encode("utf-8")  # Arrow-safe: no lone surrogates survive
        t.encode("utf-8")


def test_extract_surfaces_links_in_document_order():
    page = ('<html><body><a href="/one">1</a><p>text</p>'
            '<a href="/two">2</a></body></html>')
    out = kernel.extract("https://h.example/p", page.encode(), "fr")
    assert out["links"] == [("https://h.example/one", "1"),
                            ("https://h.example/two", "2")]
    # PDF payloads and error rows carry an empty frontier
    assert kernel.extract("http://x/e", b"\x00\xff" * 10, "fr")["links"] == []


def test_data_content_attribute_is_not_the_robots_content():
    # data-content precedes the real content attribute; the directive must
    # come from content=, never from data-content= (mirror of the
    # data-name guard above)
    assert kernel.robots_directives(
        b'<meta data-content="noindex" name="robots" content="index, follow">'
    ) == {"index", "follow"}
    # and with NO real content attribute, no directives at all
    assert kernel.robots_directives(
        b'<meta data-content="noindex" name="robots">'
    ) == set()


def test_robots_tag_straddling_head_budget_still_matches():
    # tag starts before byte 4096 but ends after it: the directive must
    # not be silently dropped
    pad = b"<html><head>" + b"<!-- x -->" * 408  # 12 + 4080 = 4092 bytes
    page = (pad + b'<meta name="robots" content="noindex, nofollow">'
            b"</head><body><p>hi</p></body></html>")
    assert len(pad) < 4096 < len(pad) + 48
    assert "noindex" in kernel.robots_directives(page)
    # but a tag STARTING past the head budget stays out of scope
    pad2 = b"<html><head>" + b"<!-- x -->" * 410
    page2 = (pad2 + b'<meta name="robots" content="noindex">'
             b"</head><body><p>hi</p></body></html>")
    assert len(pad2) >= 4096
    assert kernel.robots_directives(page2) == set()


def test_extract_links_anchor_text_rules():
    """Anchor text: inner markup stripped, TEXT entity rule (legacy
    non-';' named refs decode — unlike hrefs), whitespace collapsed,
    implicit close at the next <a> (anchors cannot nest), </aside> does
    not terminate, 200-char cap."""
    page = (
        '<a href="/a"><b>Bold</b> &amp; <i>ital</i></a>'
        '<a href="/b">first <a href="/c">second</a>'       # implicit close
        '<a href="/d">x &copy 2024</a>'                    # text rule: © decodes
        '<a href="/e">inside <aside>an aside</aside> tail</a>'
        '<a href="/f">  spaced \t\n out  </a>'
        '<a href="/g">' + "y" * 500 + "</a>"
    )
    got = kernel.extract_links("https://h.example/p", page)
    texts = {h.rsplit("/", 1)[1]: t for h, t in got}
    assert texts["a"] == "Bold & ital"
    assert texts["b"] == "first"          # closed by the next <a>
    assert texts["c"] == "second"
    assert texts["d"] == "x © 2024"  # legacy &copy decodes in TEXT
    assert texts["e"] == "inside an aside tail"
    assert texts["f"] == "spaced out"
    assert texts["g"] == "y" * kernel.ANCHOR_TEXT_MAX


def test_head_metadata_title_and_canonical_rules():
    """head_metadata: title under the TEXT entity rule with whitespace
    collapse + cap; rel is a token LIST; first VALID canonical wins;
    attribute-rule entity decode + urljoin on hrefs; og:url is only a
    fallback; declarations outside <head> (after <body) or inside
    comments are ignored; non-http(s) results dropped."""
    base = "https://h.example/dir/page"
    m = kernel.head_metadata(base, (
        "<head><title> A &amp;\n B </title>"
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="alternate canonical" href="../p?a=1&amp;b=2">'
        '<link rel="canonical" href="https://late.example/x">'
        "</head><body></body>"))
    assert m["title"] == "A & B"
    # token-list rel matched; relative href resolved; &amp; decoded;
    # the LATER plain canonical lost (first valid wins)
    assert m["canonical_url"] == "https://h.example/p?a=1&b=2"

    # og:url fallback — only when no valid <link rel=canonical>
    m = kernel.head_metadata(base, (
        '<link rel="canonical" href="javascript:x()">'
        '<meta property="og:url" content="//cdn.example/y">'))
    assert m["canonical_url"] == "https://cdn.example/y"

    # body-declared and commented declarations are not declarations
    m = kernel.head_metadata(base, (
        '<!-- <link rel="canonical" href="https://c.example/"> -->'
        "<title></title><body>"
        '<link rel="canonical" href="https://evil.example/">'))
    assert m == {}  # empty title dropped too

    # title cap and hostile content never raise
    m = kernel.head_metadata(base, "<title>" + "t" * 2000 + "</title>")
    assert len(m["title"]) == kernel.TITLE_MAX
    assert kernel.head_metadata(base, "<link rel=canonical href=" ) == {}


def test_head_metadata_boundary_after_strip():
    """The head boundary is located AFTER comment/CDATA/script stripping:
    a '<body' inside a head comment or a document.write("<body>") script
    must not truncate the head and drop later valid declarations. With
    no '<body' tag at all, '</head>' is the fallback boundary, so a
    body-embedded canonical still cannot steer dedup; only a page with
    NEITHER tag treats the whole fragment as head."""
    base = "https://h.example/dir/page"

    # '<body' hidden in a head comment — later canonical must survive
    m = kernel.head_metadata(base, (
        "<head><!-- <body> --><title>T</title>"
        '<link rel="canonical" href="/c"></head><body>x'))
    assert m == {"title": "T", "canonical_url": "https://h.example/c"}

    # '<body' emitted by a head script — same
    m = kernel.head_metadata(base, (
        '<head><script>document.write("<body>")</script><title>T2</title>'
        '<link rel=canonical href="/c2"></head><body>y'))
    assert m == {"title": "T2", "canonical_url": "https://h.example/c2"}

    # no <body> tag: '</head>' bounds the head — the body-embedded
    # canonical is NOT a declaration
    m = kernel.head_metadata(base, (
        "<head><title>T3</title></head>"
        '<p>tail <link rel="canonical" href="https://evil.example/">'))
    assert m == {"title": "T3"}


def test_head_metadata_rides_extract_fields():
    """The kernel surfaces title/canonical_url as fields rows, and the
    corpus's three declaration variants all resolve to the clean target."""
    from ocr_cezam_spark.corpus import make_page

    for doc_id, expect_canon in ((3, True), (4, True), (5, True), (0, False)):
        p = make_page(doc_id)
        r = kernel.extract(p["url"], p["html"], p["lang"])
        assert r["error"] is None
        assert "title" in r["fields"]
        if expect_canon:
            got = r["fields"]["canonical_url"]
            assert got.startswith("https://") and "?" not in got
        else:
            assert "canonical_url" not in r["fields"]
    # docs 3 and 4 form one variant group: same canonical target
    p3, p4 = make_page(3), make_page(4)
    c3 = kernel.extract(p3["url"], p3["html"], p3["lang"])["fields"]["canonical_url"]
    c4 = kernel.extract(p4["url"], p4["html"], p4["lang"])["fields"]["canonical_url"]
    assert c3 == c4 and p3["url"] != p4["url"]


def test_extract_headings_outline():
    """The outline output: document order, all six levels, dropped-tag
    and commented headings excluded, nested (invalid) headings keep the
    outermost, empty headings skipped."""
    from ocr_cezam_spark import kernel

    html = (
        "<html><body>"
        "<h1>Top</h1>"
        "<div><h2> Section  one </h2><p>x</p></div>"
        "<h3>Sub <a href='/l'>linked</a> part</h3>"
        "<script><h2>not real</h2></script>"
        "<!-- <h2>commented</h2> -->"
        "<h4></h4>"
        "<h5>Deep</h5><h6>Deepest</h6>"
        "<h2>Nested <h3>inner</h3></h2>"
        "</body></html>"
    ).encode()
    r = kernel.extract("https://x.example/p", html, "en")
    assert r["error"] is None
    assert r["headings"] == [
        (1, "Top"),
        (2, "Section one"),
        (3, "Sub linked part"),
        (5, "Deep"),
        (6, "Deepest"),
        (2, "Nested inner"),
    ]
