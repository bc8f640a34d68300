"""Stream-stream join: crawl dispatches joined to fetch completions.

The crawl loop emits two unbounded streams — frontier DISPATCHES
(url, dispatch_ts) from the scheduler and fetch COMPLETIONS
(url, fetch_ts, http_status) from the fetcher fleet. Matching them
yields per-fetch latency and completion status, the signal the
politeness controller (pipeline.fetch_schedule) and the recrawl
scheduler feed on. Reference analog: the per-file success/error
bookkeeping of ocr_cezam.py's process loop (SURVEY §2 A6), lifted to
two live streams instead of one finished batch.

Mechanism: Structured Streaming's watermarked stream-stream INNER join.
Both sides carry a watermark and the join condition bounds the match
window (fetch_ts in [dispatch_ts, dispatch_ts + horizon]), which is
exactly what lets Spark EVICT buffered state — an unbounded-condition
stream-stream join would grow state forever. State per side is bounded
by (rate x horizon + watermark delay), independent of stream lifetime.

Scale shape: both streams shuffle once on the url key into the same
join state store; a hot url buffers only its own horizon window. The
output is append-mode (a match is immutable once emitted), so it feeds
an append-only file/Iceberg sink with exactly-once checkpointing.

Semantics note (vs operators.relational.asof_join): the stream-stream
join emits EVERY completion inside the horizon, not just the first —
duplicate fetch results for one dispatch (retries) each match. The
batch twin in fetch_join_batch uses the identical predicate, so
stream-final == batch holds row-for-row; consumers that want one row
per dispatch aggregate downstream (min fetch_ts), which stays
incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

DEFAULT_HORIZON = "10 minutes"
DEFAULT_DELAY = "5 minutes"


def fetch_join_stream(dispatches: DataFrame, completions: DataFrame,
                      horizon: str = DEFAULT_HORIZON,
                      delay: str = DEFAULT_DELAY) -> DataFrame:
    """(url, dispatch_ts, fetch_ts, latency_ms, http_status) for every
    completion landing within ``horizon`` of its dispatch. ``delay`` is
    the out-of-order tolerance (watermark) on both sides; events later
    than that are dropped by design, mirroring the fetcher fleet's own
    response deadline."""
    d = dispatches.withWatermark("dispatch_ts", delay)
    c = completions.withWatermark("fetch_ts", delay)
    joined = d.join(
        c,
        F.expr(
            "d_url = c_url AND "
            "fetch_ts >= dispatch_ts AND "
            f"fetch_ts <= dispatch_ts + interval {horizon}"
        ),
        "inner",
    )
    return joined.select(
        F.col("d_url").alias("url"),
        "dispatch_ts",
        "fetch_ts",
        ((F.unix_micros("fetch_ts") - F.unix_micros("dispatch_ts"))
         / F.lit(1000)).cast("long").alias("latency_ms"),
        "http_status",
    )


def fetch_join_batch(dispatches: DataFrame, completions: DataFrame,
                     horizon: str = DEFAULT_HORIZON) -> DataFrame:
    """Batch twin: the same predicate as a plain inner join — the parity
    target for stream-final == batch tests. (Batch mode has no watermark;
    late data is simply present in the input.)"""
    joined = dispatches.join(
        completions,
        F.expr(
            "d_url = c_url AND "
            "fetch_ts >= dispatch_ts AND "
            f"fetch_ts <= dispatch_ts + interval {horizon}"
        ),
        "inner",
    )
    return joined.select(
        F.col("d_url").alias("url"),
        "dispatch_ts",
        "fetch_ts",
        ((F.unix_micros("fetch_ts") - F.unix_micros("dispatch_ts"))
         / F.lit(1000)).cast("long").alias("latency_ms"),
        "http_status",
    )
