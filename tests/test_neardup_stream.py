"""Streaming near-dup admission (streaming/neardup_stream.py): stream-final
== batch incremental_near_dup row-for-row, across micro-batches and a
checkpointed restart; the row-wise signature is bit-identical to the
aggregate form."""

from __future__ import annotations

import glob
import shutil
from datetime import datetime

from ocr_cezam_spark.operators import dedup
from ocr_cezam_spark.streaming.events import run_available_now
from ocr_cezam_spark.streaming.neardup_stream import (
    corpus_band_table,
    neardup_admission_stream,
)

BASE = ("the quick brown fox jumps over the lazy dog while the crawler "
        "fetches pages and extracts tokens for the corpus run number")


def test_rowwise_signature_bit_identical_to_aggregate(spark):
    docs = spark.createDataFrame(
        [(i, f"{BASE} {i} extra words here") for i in range(20)]
        + [(99, "x")],  # short doc: single-shingle path
        ["doc_id", "text"],
    )
    agg = {r["doc_id"]: r["sig"]
           for r in dedup.minhash_signature(docs).collect()}
    row = {r["doc_id"]: r["sig"]
           for r in dedup.minhash_signature_rowwise(docs).collect()}
    assert agg == row


def _corpus(spark):
    rows = [(i, f"{BASE} variant {i} " + " ".join(
        f"w{(i * 7 + j) % 23}" for j in range(12))) for i in range(8)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _new_rows(ids):
    # near clones of corpus doc (id % 8): one appended token
    return [
        (1000 + i,
         f"{BASE} variant {i % 8} " + " ".join(
             f"w{((i % 8) * 7 + j) % 23}" for j in range(12)) + " ztail",
         datetime(2026, 1, 1, 12, i % 60))
        for i in ids
    ]


def test_stream_admission_matches_batch_and_restarts(spark, tmp_path):
    corpus = _corpus(spark)
    bands = corpus_band_table(corpus)

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, text string, ts timestamp"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(tmp_path / "stage" / name))
        part = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    write_file("f1", _new_rows(range(0, 6)))
    write_file("f2", _new_rows(range(6, 12)))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(str(src))
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(neardup_admission_stream(stream, bands), ckpt, out)
    got = {(r["new_id"], r["corpus_id"]): r["sim_est"]
           for r in spark.read.parquet(out).collect()}

    new_batch = spark.createDataFrame(
        [(i, t) for i, t, _ in _new_rows(range(0, 12))],
        ["doc_id", "text"],
    )
    want = {(r["new_id"], r["corpus_id"]): r["sim_est"]
            for r in dedup.incremental_near_dup(new_batch, corpus).collect()}
    assert got == want and len(got) >= 12

    # restart on the same checkpoint: only file-3 admissions are appended
    write_file("f3", _new_rows(range(12, 15)))
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(str(src))
    )
    run_available_now(neardup_admission_stream(stream2, bands), ckpt, out)
    got2 = {(r["new_id"], r["corpus_id"]): r["sim_est"]
            for r in spark.read.parquet(out).collect()}
    new_batch_all = spark.createDataFrame(
        [(i, t) for i, t, _ in _new_rows(range(0, 15))],
        ["doc_id", "text"],
    )
    want_all = {(r["new_id"], r["corpus_id"]): r["sim_est"]
                for r in dedup.incremental_near_dup(
                    new_batch_all, corpus).collect()}
    assert got2 == want_all
    assert all(k[0] >= 1012 for k in set(got2) - set(got))
