"""Streaming HDR must converge to the batch sketch.hdr_quantiles answer
BIT-IDENTICALLY across micro-batches and a checkpointed restart
(counter addition is commutative over deliveries)."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators import sketch
from ocr_cezam_spark.streaming.events import run_available_now
from ocr_cezam_spark.streaming.hdr_stream import hdr_stream

SCHEMA = "grp string, v long"
QS = (0.5, 0.9, 0.99)


def _events_pdf() -> pd.DataFrame:
    rows = []
    # latencies spanning several octaves for group a; group b small
    # values plus zeros and NULLs (the underflow bucket)
    for i in range(300):
        rows.append(("a", (i * 37) % 4096 + 1))
    for i in range(40):
        rows.append(("b", i % 7))          # 0 -> underflow
    rows.append(("b", None))
    pdf = pd.DataFrame(rows, columns=["grp", "v"])
    pdf["v"] = pdf["v"].astype("Int64")  # keep parquet type bigint
    return pdf


def _final(spark, out: str) -> dict:
    latest = (
        spark.read.parquet(out)
        .groupBy("grp", "q")
        .agg(F.max(F.struct("n_rows", "est")).alias("b"))
        .select("grp", "q", "b.est", "b.n_rows")
    )
    return {(r["grp"], r["q"]): (r["est"], r["n_rows"])
            for r in latest.collect()}


def test_hdr_stream_matches_batch_and_survives_restart(spark, tmp_path):
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
        run_available_now(hdr_stream(stream, qs=QS), ckpt, out)

    run()
    got = _final(spark, out)
    batch = spark.createDataFrame(pdf, SCHEMA)
    want = {(r["grp"], r["q"]): r["est"] for r in
            sketch.hdr_quantiles(batch, "v", QS, group_col="grp").collect()}
    assert {k: v[0] for k, v in got.items()} == want
    assert got[("a", 0.5)][1] == 300 and got[("b", 0.5)][1] == 41

    # restart: one more file shifts a's distribution upward; b untouched
    extra = pd.DataFrame(
        [("a", 100000 + i) for i in range(200)], columns=["grp", "v"]
    )
    extra.to_parquet(src / "part-99.parquet", index=False)
    run()
    got2 = _final(spark, out)
    both = pd.concat([pdf, extra])
    batch2 = spark.createDataFrame(both, SCHEMA)
    want2 = {(r["grp"], r["q"]): r["est"] for r in
             sketch.hdr_quantiles(batch2, "v", QS,
                                  group_col="grp").collect()}
    assert {k: v[0] for k, v in got2.items()} == want2
    # the new octave is visible (est is the bucket LOWER bound:
    # within 2^-sub_bits relative error below the true quantile)
    assert got2[("a", 0.99)][0] >= 100000 * (1 - 2 ** -3)
    assert got2[("b", 0.5)] == got[("b", 0.5)]  # untouched group stable
