"""Streaming ingest admission must equal the batch ingest_delta verdicts
micro-batch for micro-batch, and resume from its checkpoint."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators.pipeline import ingest_delta
from ocr_cezam_spark.streaming.ingest_stream import ingest_stream

SCHEMA = "doc_id long, url string, text string"


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "https://a.ex/p1", "alpha beta gamma delta"),
            (2, "https://a.ex/p2", "one two three four"),
        ],
        SCHEMA,
    )


_BATCHES = [
    [  # batch 0: an update and an exact dup
        (10, "https://a.ex/p2", "one two three four five"),
        (11, "https://a.ex/q", "alpha beta gamma delta"),
    ],
    [  # batch 1: a near dup and an insert
        (12, "https://a.ex/r", "one two three four znew"),
        (13, "https://a.ex/t", "completely different fresh words"),
    ],
]


def _verdicts(spark, out):
    rows = spark.read.parquet(out).collect()
    return {(r["batch_id"], r["id"]): (r["verdict"], r["corpus_id"])
            for r in rows}


def test_ingest_stream_equals_batch_and_resumes(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(_BATCHES):
        pd.DataFrame(rows, columns=["doc_id", "url", "text"]).to_parquet(
            src / f"part-{i:02d}.parquet", index=False
        )
        time.sleep(1.1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    corpus = _corpus(spark)

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        ingest_stream(stream, corpus, ckpt, out)

    run()
    got = _verdicts(spark, out)
    # per-batch equivalence with the batch operator
    want = {}
    for i, rows in enumerate(_BATCHES):
        bdf = spark.createDataFrame(rows, SCHEMA)
        for r in ingest_delta(bdf, corpus).collect():
            want[(i, r["id"])] = (r["verdict"], r["corpus_id"])
    assert got == want
    assert got[(0, 10)][0] == "update"
    assert got[(1, 12)][0] == "skip_near_dup"

    # restart: one more landing file is processed from the checkpoint
    # without replaying batches 0/1
    extra = [(14, "https://a.ex/p1", "alpha beta gamma delta")]
    pd.DataFrame(extra, columns=["doc_id", "url", "text"]).to_parquet(
        src / "part-99.parquet", index=False
    )
    run()
    got2 = _verdicts(spark, out)
    assert len(got2) == len(got) + 1
    new_key = next(k for k in got2 if k not in got)
    assert got2[new_key] == ("skip_unchanged", 1)
