"""Streaming recrawl dedup (last-writer-wins) must converge to the batch
latest_crawl_dedup answer across micro-batches, out-of-order delivery,
and a checkpointed restart."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators.dedup import latest_crawl_dedup
from ocr_cezam_spark.streaming.events import run_available_now
from ocr_cezam_spark.streaming.latest_stream import latest_stream

SCHEMA = "url string, warc_ts long, doc_id long"


def _pages_pdf() -> pd.DataFrame:
    rows = []
    # 30 urls x 3 crawls, DELIBERATELY replayed newest-crawl-first so
    # late (older) snapshots must not demote the stored winner
    for k in (2, 0, 1):
        for u in range(30):
            rows.append((f"u{u}", 1_000 + k * 100 + u, u * 10 + k))
    # ts tie on one url: max id must win
    rows.append(("u0", 1_200, 9_000))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "doc_id"])


def _final_state(spark, out: str) -> dict:
    # append-mode changelog: the url's latest emission = max n_crawls
    # (monotonic per url)
    latest = (
        spark.read.parquet(out)
        .groupBy("url")
        .agg(F.max(F.struct("n_crawls", "warc_ts", "doc_id")).alias("b"))
        .select("url", "b.doc_id", "b.warc_ts", "b.n_crawls")
    )
    return {r["url"]: (r["doc_id"], r["warc_ts"], r["n_crawls"])
            for r in latest.collect()}


def test_latest_stream_matches_batch_and_survives_restart(spark, tmp_path):
    pdf = _pages_pdf()
    src = tmp_path / "src"
    src.mkdir()
    # three files in shuffled-crawl order, distinct mtimes so the file
    # source replays them in this order
    step = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * step: (i + 1) * step].to_parquet(
            src / f"part-{i:02d}.parquet", index=False
        )
        time.sleep(1.1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(str(src))
        )
        run_available_now(latest_stream(stream), ckpt, out)

    run()
    got = _final_state(spark, out)
    batch = spark.createDataFrame(pdf, SCHEMA)
    want = {r["url"]: (r["doc_id"], r["warc_ts"], r["n_crawls"])
            for r in latest_crawl_dedup(batch).collect()}
    assert got == want
    assert want["u0"] == (9_000, 1_200, 4)  # ts tie -> max id, late-safe

    # restart from the checkpoint with one NEW file: only the new
    # snapshots process (state carries n_crawls), winners update
    extra = pd.DataFrame(
        [("u1", 2_000, 777), ("u2", 1, 888)],  # u2's is older: no demotion
        columns=["url", "warc_ts", "doc_id"],
    )
    extra.to_parquet(src / "part-99.parquet", index=False)
    run()
    got2 = _final_state(spark, out)
    assert got2["u1"] == (777, 2_000, 4)   # new winner
    assert got2["u2"] == (22, 1_202, 4)    # old winner kept, count bumped
    # every other url keeps its first-run answer (no reprocessing: its
    # n_crawls would have doubled if the old files replayed)
    for u, v in want.items():
        if u not in ("u1", "u2"):
            assert got2[u] == v
