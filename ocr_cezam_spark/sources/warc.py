"""WARC container source.

Real Common-Crawl input arrives as WARC files; this module turns raw WARC
bytes into the engine's canonical ``documents`` rows
(url, warc_ts, html, lang) — the S2 "source explode" at the container
level (the reference's pdf_to_jpg page explode, utils/utils.py:15-29,
lifted to the archive grain).

Pure-python record parsing (no external deps); the Spark side is an
Arrow-batched ``mapInPandas`` over (chunk_id, data) rows, so one task
handles one WARC chunk and the explode happens executor-side. At 100 TB
the chunks are the unit of parallelism (CC WARCs are ~1 GB; list them into
a table of paths/byte-ranges and let maxPartitionBytes-sized tasks stream
them).
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

from pyspark.sql import DataFrame

_CRLF2 = b"\r\n\r\n"


def write_warc(records: list[tuple[str, dt.datetime, bytes]]) -> bytes:
    """Serialize (url, ts, html) triples as WARC/1.0 response records
    (http response payload)."""
    out = bytearray()
    for url, ts, html in records:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            + html
        )
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode()
        out += header + payload + b"\r\n\r\n"
    return bytes(out)


def parse_warc(data: bytes) -> Iterator[tuple[str, dt.datetime | None, bytes]]:
    """Yield (url, warc_date, html_bytes) from WARC bytes.

    Linear single-pass scan driven by Content-Length (never regex over the
    payload, which may contain record-like bytes). Non-response records
    and malformed tails are skipped — fault isolation, not failure."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/1.0", pos)
        if start < 0:
            return
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].decode("latin-1").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
            if length < 0:
                # a negative length would move `pos` BACKWARDS and re-find
                # this same record forever (executor hang) — treat it as
                # unparsable and resynchronize forward instead
                raise ValueError("negative Content-Length")
        except ValueError:
            # Missing/unparsable Content-Length: resynchronize on the next
            # plausible record start. Without a length any resync is a
            # heuristic; requiring BOTH the boundary delimiter
            # (\r\n\r\nWARC/1.0) and a WARC-Type: header inside the
            # candidate's own header block reduces false positives vs a
            # bare 'WARC/1.0' scan (a payload embedding a raw WARC excerpt
            # can still fool it, but then must embed a full header block).
            # Search FROM head_end: for an empty-payload malformed record
            # the header's own terminating CRLFCRLF is the boundary.
            search = head_end
            while True:
                nxt = data.find(_CRLF2 + b"WARC/1.0", search)
                if nxt < 0:
                    return
                cand = nxt + len(_CRLF2)
                cand_head_end = data.find(_CRLF2, cand)
                if cand_head_end >= 0 and (
                    b"\r\nwarc-type:" in data[cand:cand_head_end].lower()
                ):
                    pos = cand
                    break
                search = nxt + 1
            continue
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts: dt.datetime | None = None
        raw_date = headers.get("warc-date", "")
        try:
            ts = dt.datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            pass
        # strip the http response header from the payload
        http_split = body.find(_CRLF2)
        html = body[http_split + 4 :] if http_split >= 0 else body
        if url:
            yield (url, ts, html)


WARC_DOCS_SCHEMA = "url string, warc_ts timestamp, html binary"


def warc_to_documents(chunks: DataFrame, data_col: str = "data") -> DataFrame:
    """(chunk_id, data: binary) -> exploded documents(url, warc_ts, html)."""

    def explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                {"url": u, "warc_ts": ts, "html": html}
                for blob in pdf[data_col]
                for (u, ts, html) in parse_warc(blob or b"")
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html"]
            )

    return chunks.mapInPandas(explode, schema=WARC_DOCS_SCHEMA)
