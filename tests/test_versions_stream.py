"""Streaming SCD-2 must compact to the batch url_version_history rows
exactly, across micro-batches and a checkpointed restart."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators import dedup
from ocr_cezam_spark.streaming.events import run_available_now
from ocr_cezam_spark.streaming.versions_stream import versions_stream

SCHEMA = "url string, warc_ts long, digest string"


def _fetches() -> pd.DataFrame:
    rows = [
        # u1: d1 d1 d2 d1 -> 3 versions (revert opens a new one)
        ("u1", 10, "d1"), ("u1", 20, "d1"), ("u1", 30, "d2"),
        ("u1", 40, "d1"),
        # u2: stable across every batch
        ("u2", 10, "x"), ("u2", 25, "x"), ("u2", 45, "x"),
    ]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "digest"])


def _compacted(spark, out: str):
    latest = (
        spark.read.parquet(out)
        .groupBy("url", "version")
        .agg(F.max(F.struct("n_fetches", "digest", "valid_from",
                            "valid_to")).alias("b"))
        .select("url", "version", "b.digest", "b.valid_from",
                "b.valid_to", "b.n_fetches")
    )
    return sorted(
        (r["url"], r["version"], r["digest"], r["valid_from"],
         r["valid_to"], r["n_fetches"])
        for r in latest.collect()
    )


def _batch_rows(spark, pdf):
    df = spark.createDataFrame(pdf, SCHEMA)
    return sorted(
        (r["url"], r["version"], r["digest"], r["valid_from"],
         r["valid_to"], r["n_fetches"])
        for r in dedup.url_version_history(df).collect()
    )


def test_versions_stream_compacts_to_batch(spark, tmp_path):
    pdf = _fetches()
    src = tmp_path / "src"
    src.mkdir()
    # time-ordered landing files (the append-log contract)
    for i, (lo, hi) in enumerate([(0, 3), (3, 5), (5, 7)]):
        part = pdf.sort_values("warc_ts").iloc[lo:hi]
        part.to_parquet(src / f"part-{i:02d}.parquet", index=False)
        time.sleep(1.1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        run_available_now(versions_stream(stream), ckpt, out)

    run()
    # NOTE: compaction by max(n_fetches) keeps the CLOSED row over the
    # stale open row of the same version because closing always carries
    # >= the fetch count at any earlier open emission, and the final
    # open row is the last state of its version
    assert _compacted(spark, out) == _batch_rows(spark, pdf)

    # restart: one more landing file extends u2 and closes u1's v3
    extra = pd.DataFrame(
        [("u2", 60, "x"), ("u1", 70, "d9")],
        columns=["url", "warc_ts", "digest"],
    )
    extra.to_parquet(src / "part-99.parquet", index=False)
    run()
    both = pd.concat([pdf, extra])
    assert _compacted(spark, out) == _batch_rows(spark, both)
