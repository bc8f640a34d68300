"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Container-header metadata (PNG/GIF/JPEG dimensions) is parsed for REAL
with stdlib byte-slicing inside an Arrow-batched ``mapInPandas`` kernel:
binary column in, typed metadata out. Pixel decode and frame grabbing
would need image/codec libraries (absent in this container), so those
steps keep deterministic stand-ins behind the same plumbing — swapping in
a real decoder changes only ``_decode_payload`` / ``_grab_frames``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

META_SCHEMA = "doc_id long, n_bytes int, width int, height int"


# JPEG start-of-frame markers that carry dimensions (C0-CF minus the
# non-SOF C4/C8/CC: DHT, JPG extension, DAC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _decode_payload(payload: bytes) -> tuple[int, int, int]:
    """(n_bytes, width, height) from the real container header — pure
    stdlib byte-slicing, no PIL/cv2:

    - PNG: IHDR width/height, big-endian u32 at offsets 16/20 (the IHDR
      chunk is required to be first after the 8-byte signature).
    - GIF: logical-screen width/height, little-endian u16 at offsets 6/8.
    - JPEG: walk the segment chain from SOI to the first SOF marker;
      height/width are big-endian u16 at +5/+7 in the SOF payload. The
      signature check requires the third byte to be 0xFF (every segment
      marker starts with 0xFF in a real JPEG) so random binary payloads
      don't false-positive on the 2-byte SOI alone.

    Pixel decode would need an image library (absent in this container);
    unrecognized containers keep the deterministic byte-0/1 stand-in so
    synthetic payloads still exercise the plumbing."""
    if not payload:
        return (0, 0, 0)
    n = len(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and n >= 24:
        return (n, int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"))
    if payload[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
        return (n, int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"))
    if payload[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 4 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte: advance one, not a segment
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # bare markers
                i += 2
                continue
            if marker in _JPEG_SOF and i + 9 <= n:
                return (n, int.from_bytes(payload[i + 7:i + 9], "big"),
                        int.from_bytes(payload[i + 5:i + 7], "big"))
            i += 2 + int.from_bytes(payload[i + 2:i + 4], "big")
        return (n, 0, 0)
    return (n, payload[0], payload[1] if n > 1 else 0)


def attach_payload(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload column (16 md5 bytes of the
    text) — the stand-in for an image/audio blob column."""
    return docs.select(
        F.col(id_col), F.unhex(F.md5(F.col(text_col))).alias("payload")
    )


def decode_metadata(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: binary column -> typed metadata columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m[0] for m in meta],
                    "width": [m[1] for m in meta],
                    "height": [m[2] for m in meta],
                }
            )

    return with_payload.mapInPandas(run, schema=META_SCHEMA)


HIST_SCHEMA = "doc_id long, bin int, n int"


def byte_histogram(with_payload: DataFrame, id_col: str = "doc_id",
                   bins: int = 16) -> DataFrame:
    """Feature-extract step over the binary column: per-payload byte
    histogram (high-nibble bins by default — the classic cheap file-type
    feature), Arrow-batched mapInPandas, long format (doc_id, bin, n)
    with zero bins omitted. Real computation, no image libs needed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if not payload:
                    continue
                # vectorized: multi-KB/MB payloads must not pay an
                # interpreted per-byte loop in the feature-extract stage
                arr = np.frombuffer(payload, dtype=np.uint8)
                h = np.bincount(arr.astype(np.int32) * bins // 256,
                                minlength=bins)
                rows += [
                    {"doc_id": int(doc_id), "bin": i, "n": int(c)}
                    for i, c in enumerate(h)
                    if c
                ]
            yield pd.DataFrame(rows, columns=["doc_id", "bin", "n"])

    return with_payload.mapInPandas(run, schema=HIST_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_ts_ms int, frame_hex string, "
    "frame binary, width int, height int"
)


def _grab_frames(payload: bytes) -> list[tuple[int, int, str, bytes, int, int]]:
    """Deterministic fake frame grabber: a real one (av/opencv — absent in
    this container) would seek the container and decode n sampled frames;
    this derives 1-4 'frames' from the payload so the 1-row-in/N-rows-out
    plumbing (batch shape, schema, ordering) is fully real and testable."""
    import hashlib

    if not payload:
        return []
    ph = payload.hex()
    n_frames = 1 + (payload[0] % 4)
    out = []
    for i in range(n_frames):
        fh = hashlib.md5(f"{ph}#{i}".encode()).hexdigest()
        fb = bytes.fromhex(fh)
        out.append((i, i * 40, fh, fb, fb[0], fb[1]))
    return out


def frame_sample(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Video-style frame sampling plumbing: one payload row explodes into
    its sampled frames inside an Arrow-batched ``mapInPandas`` (the
    UDTF-shaped 1->N operator); frame bytes stay executor-side, never on
    the driver. Swap ``_grab_frames`` for a codec-backed grabber."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "doc_id": int(doc_id),
                    "frame_idx": fi,
                    "frame_ts_ms": ts,
                    "frame_hex": fh,
                    "frame": fb,
                    "width": w,
                    "height": h,
                }
                for doc_id, payload in zip(pdf[id_col], pdf["payload"])
                for (fi, ts, fh, fb, w, h) in _grab_frames(payload)
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_hex",
                         "frame", "width", "height"],
            )

    return with_payload.mapInPandas(run, schema=FRAME_SCHEMA)


def frame_sample_stub(*_args, **_kwargs):
    """Codec-backed frame sampling requires av/opencv, absent here; the
    tested plumbing (schema, batching, 1->N explode) is frame_sample."""
    raise NotImplementedError(
        "frame sampling requires av/opencv; swap _grab_frames inside "
        "frame_sample for a codec-backed grabber"
    )


def nfc_normalize(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Unicode NFC normalization — the canonical-composition pass a crawl
    pipeline runs before hashing/dedup (decomposed 'e'+U+0301 and composed
    U+00E9 must share a dedup key). No native Spark expression exists for
    Unicode normalization, so this is an honest Arrow-batched pandas UDF
    (stdlib unicodedata; same rationale as the binary-header decoders in
    this module). Returns (id, text_nfc, changed).

    Scale shape: one vectorized map stage, no shuffle; Arrow transfers the
    string column once in each direction.
    """
    import unicodedata

    from pyspark.sql import functions as F  # noqa: N812

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize("NFC", t)
                     if t is not None else None)

    return docs.select(
        F.col(id_col),
        _nfc(F.col(text_col)).alias("text_nfc"),
        (_nfc(F.col(text_col)) != F.col(text_col)).alias("changed"),
    )
