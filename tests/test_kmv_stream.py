"""Streaming KMV must converge to the batch sketch.kmv_distinct answer
BIT-IDENTICALLY across micro-batches, duplicate delivery, and a
checkpointed restart (keep-k-smallest-distinct is commutative and
idempotent over deliveries)."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators import sketch
from ocr_cezam_spark.streaming.events import run_available_now
from ocr_cezam_spark.streaming.kmv_stream import kmv_stream

SCHEMA = "grp string, k string"
K = 32


def _events_pdf() -> pd.DataFrame:
    rows = []
    # group a sits in the ESTIMATOR regime (120 distinct > k=32), group
    # b in the exact regime (10 distinct < k); every key delivered twice
    # (sketch must track DISTINCT) and b's keys overlap a's (groups must
    # not bleed)
    for rep in range(2):
        for i in range(120):
            rows.append(("a", f"k{i}"))
        for i in range(10):
            rows.append(("b", f"k{i}"))
    return pd.DataFrame(rows, columns=["grp", "k"])


def _final_state(spark, out: str) -> dict:
    latest = (
        spark.read.parquet(out)
        .groupBy("grp")
        .agg(F.max(F.struct("n_rows", "n_hashes", "est_distinct"))
             .alias("b"))
        .select("grp", "b.n_hashes", "b.est_distinct", "b.n_rows")
    )
    return {r["grp"]: (r["n_hashes"], r["est_distinct"], r["n_rows"])
            for r in latest.collect()}


def test_kmv_stream_matches_batch_and_survives_restart(spark, tmp_path):
    pdf = _events_pdf()
    src = tmp_path / "src"
    src.mkdir()
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
            .parquet(str(src))
        )
        run_available_now(kmv_stream(stream, k=K), ckpt, out)

    run()
    got = _final_state(spark, out)
    batch = spark.createDataFrame(pdf, SCHEMA)
    want = {r["group"]: (r["n_hashes"], r["est_distinct"]) for r in
            sketch.kmv_distinct(batch, "k", "grp", k=K).collect()}
    assert {g: v[:2] for g, v in got.items()} == want
    assert got["a"][0] == K  # estimator regime: sketch is full
    assert got["b"][0] == 10 and got["b"][1] == 10.0  # exact regime
    assert got["a"][2] == 240 and got["b"][2] == 20

    # restart from the checkpoint with NEW low-hash candidates for b
    # only: its sketch absorbs them (still exact regime), a keeps its
    # answer without reprocessing (n_rows unchanged)
    extra = pd.DataFrame(
        [("b", f"fresh{i}") for i in range(5)], columns=["grp", "k"]
    )
    extra.to_parquet(src / "part-99.parquet", index=False)
    run()
    got2 = _final_state(spark, out)
    assert got2["a"] == got["a"]
    assert got2["b"][0] == 15 and got2["b"][1] == 15.0
    assert got2["b"][2] == 25

    # the stream-final sketch equals the batch sketch over the UNION of
    # deliveries — the no-replay property the sketch exists for
    full = pd.concat([pdf, extra])
    want2 = {r["group"]: (r["n_hashes"], r["est_distinct"]) for r in
             sketch.kmv_distinct(
                 spark.createDataFrame(full, SCHEMA), "k", "grp", k=K
             ).collect()}
    assert {g: v[:2] for g, v in got2.items()} == want2


def test_kmv_stream_ignores_null_keys(spark, tmp_path):
    pdf = pd.DataFrame(
        [("g", "x"), ("g", None), ("g", "y")], columns=["grp", "k"]
    )
    src = tmp_path / "src"
    src.mkdir()
    pdf.to_parquet(src / "part-00.parquet", index=False)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    run_available_now(kmv_stream(stream, k=8), ckpt, out)
    got = _final_state(spark, out)
    # nulls neither hash nor count: same convention as the batch sketch
    assert got["g"] == (2, 2.0, 2)
