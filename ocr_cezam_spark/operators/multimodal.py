"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode step is a deterministic stand-in (first payload bytes interpreted as
dimensions) behind the same Spark-side plumbing a real decoder would use:
binary column in, Arrow-batched ``mapInPandas`` kernel, typed metadata out.
Swapping in a real decoder changes only ``_decode_payload``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

META_SCHEMA = "doc_id long, n_bytes int, width int, height int"


def _decode_payload(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (n_bytes, width, height).

    A real image decoder (PIL/cv2) would parse the container header here;
    byte 0/1 stand in for the header-read so the pipeline shape (batched
    bytes -> typed struct) is fully exercised and testable."""
    if not payload:
        return (0, 0, 0)
    return (len(payload), payload[0], payload[1] if len(payload) > 1 else 0)


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
