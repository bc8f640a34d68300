"""Streaming SCD-2 url version history: the incremental-ingest form of
``dedup.url_version_history`` — as fetch records land, maintain each
url's OPEN version in state and emit version rows as they close (plus
the current open row each time it changes), so the crawl store's
one-row-per-version table stays current without replaying the fetch
log.

Mechanism: ``applyInPandasWithState`` keyed on url; state =
(digest, version, valid_from, n_fetches, last_ts) — constant-size per
url. Within a micro-batch rows are processed in (ts) order; ACROSS
batches the stream assumes per-url event-time monotone arrival (a
crawl fetch log is an append log — the same contract latest_stream
documents; out-of-order deliveries ACROSS batches are counted into
the open version, stated limitation of the streaming form — the batch
operator is the replay-correct authority).

Emissions are a changelog: every batch that touches a url re-emits its
OPEN version row (valid_to NULL) and any rows CLOSED in that batch
(valid_to set). Consumers compact by (url, version) keeping max
n_fetches — after which the table is row-for-row the batch
url_version_history of the same fetch log (the test asserts exactly
that, plus a checkpointed restart).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("url string, version long, digest string, "
                 "valid_from long, valid_to long, n_fetches long")
STATE_SCHEMA = ("digest string, version long, valid_from long, "
                "n_fetches long, last_ts long")


def versions_stream(fetches: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    digest_col: str = "digest") -> DataFrame:

    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (url,) = key
        if state.exists:
            digest, version, valid_from, n_fetches, last_ts = state.get
        else:
            digest, version, valid_from, n_fetches, last_ts = (
                None, 0, 0, 0, -1)
        out = []
        changed = False
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["ts", "d"]])
        if rows:
            batch = pd.concat(rows).sort_values("ts")
            for ts, d in batch.itertuples(index=False):
                ts = int(ts)
                changed = True
                if digest is None or d != digest:
                    if digest is not None:
                        # close the running version at the new start
                        out.append((url, version, digest, valid_from,
                                    ts, n_fetches))
                    version += 1
                    digest, valid_from, n_fetches = d, ts, 1
                else:
                    n_fetches += 1
                last_ts = ts
        state.update((digest, version, valid_from, n_fetches, last_ts))
        if changed:
            out.append((url, version, digest, valid_from, None,
                        n_fetches))
            yield pd.DataFrame(
                out, columns=["url", "version", "digest", "valid_from",
                              "valid_to", "n_fetches"])

    cols = fetches.select(
        fetches[url_col].alias("url"),
        fetches[ts_col].cast("long").alias("ts"),
        fetches[digest_col].alias("d"),
    )
    return cols.groupBy("url").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
