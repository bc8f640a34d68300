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


def frame_sample_stub(*_args, **_kwargs):
    """Video frame sampling requires codec libraries absent here."""
    raise NotImplementedError(
        "frame sampling requires av/opencv; plumbing pattern is "
        "decode_metadata — swap _decode_payload for a frame grabber"
    )
