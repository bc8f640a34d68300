"""WARC source round-trip: corpus -> WARC bytes -> Spark explode ->
extraction must equal direct extraction."""

from __future__ import annotations

from ocr_cezam_spark import kernel
from ocr_cezam_spark.corpus import make_page
from ocr_cezam_spark.operators import extract as X
from ocr_cezam_spark.sources.warc import parse_warc, warc_to_documents, write_warc


def _chunks(n_docs: int, per_chunk: int):
    out = []
    for c in range(0, n_docs, per_chunk):
        pages = [make_page(i) for i in range(c, min(c + per_chunk, n_docs))]
        out.append(
            (c, write_warc([(p["url"], p["warc_ts"], p["html"]) for p in pages]))
        )
    return out


def test_parse_roundtrip_pure():
    pages = [make_page(i) for i in range(10)]
    blob = write_warc([(p["url"], p["warc_ts"], p["html"]) for p in pages])
    got = list(parse_warc(blob))
    assert len(got) == 10
    for p, (url, ts, html) in zip(pages, got):
        assert url == p["url"] and html == p["html"]
        assert ts == p["warc_ts"].replace(microsecond=0)


def test_parse_skips_garbage_and_non_response():
    good = write_warc([(make_page(0)["url"], make_page(0)["warc_ts"], b"<p>x</p>")])
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://a/\r\n"
        b"Content-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    blob = b"garbage" + req + good + b"\xff\xfe trailing junk"
    got = list(parse_warc(blob))
    assert len(got) == 1 and got[0][2] == b"<p>x</p>"


def test_bad_content_length_resyncs_on_record_boundary():
    # A record with an unparsable Content-Length whose PAYLOAD contains the
    # literal 'WARC/1.0' must not fabricate a record: recovery scans for the
    # \r\n\r\nWARC/1.0 boundary, never a bare marker inside payload bytes.
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://bad/\r\n"
        b"Content-Length: oops\r\n\r\n"
        b"<html>a page about WARC/1.0\r\nWARC-Target-URI: http://fake/\r\n"
        b"Content-Length: 4\r\n\r\nxxxx archives</html>\r\n\r\n"
    )
    good = write_warc([(make_page(0)["url"], make_page(0)["warc_ts"], b"<p>ok</p>")])
    got = list(parse_warc(bad + good))
    assert len(got) == 1
    assert got[0][0] == make_page(0)["url"] and got[0][2] == b"<p>ok</p>"


def test_bad_content_length_empty_payload_boundary_at_header_end():
    # malformed record with NO Content-Length and an empty payload: its
    # header-terminating CRLFCRLF is itself the record boundary — the next
    # valid record must not be skipped
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/\r\n"
    good = write_warc([(make_page(0)["url"], make_page(0)["warc_ts"], b"<p>ok</p>")])
    got = list(parse_warc(bad + b"\r\n" + good))  # header ends \r\n + \r\n of next
    assert len(got) == 1 and got[0][2] == b"<p>ok</p>"


def test_spark_explode_matches_direct_extraction(spark):
    n = 60
    chunks = spark.createDataFrame(_chunks(n, 20), "chunk_id int, data binary")
    docs = warc_to_documents(chunks).withColumn(
        "lang", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("fra")
    )
    assert docs.count() == n
    out = {
        r["url"]: r["text"]
        for r in X.run_extract(docs, 4).select("url", "text").collect()
    }
    for i in range(n):
        p = make_page(i)
        g = kernel.extract(p["url"], p["html"], "fra")
        assert out[p["url"]] == g["text"]


def test_resync_requires_warc_type_in_candidate_header():
    # A skipped payload embedding CRLFCRLF+'WARC/1.0' followed by a
    # header-looking block WITHOUT a WARC-Type header must not be chosen
    # as the resync point: its bogus Content-Length would swallow the
    # following genuine record.
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://bad/\r\n"
        b"Content-Length: oops\r\n\r\n"
        b"<html>raw excerpt:\r\n\r\nWARC/1.0\r\n"
        b"Content-Length: 99999\r\n\r\nnot a record</html>"
    )
    good = write_warc([(make_page(0)["url"], make_page(0)["warc_ts"], b"<p>ok</p>")])
    got = list(parse_warc(bad + b"\r\n\r\n" + good))
    assert len(got) == 1 and got[0][2] == b"<p>ok</p>"


def test_negative_content_length_does_not_hang():
    from ocr_cezam_spark.sources.warc import parse_warc

    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/neg\r\nContent-Length: -500\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/ok\r\nContent-Length: 11\r\n\r\n"
           b"hello world\r\n\r\n")
    out = list(parse_warc(bad))
    # the malformed record is skipped, the next record still parses
    assert [u for u, _, _ in out] == ["http://x/ok"]
