"""Streaming HLL must converge to the batch sketch.hll_cardinality
answer BIT-IDENTICALLY across micro-batches, duplicate delivery, and a
checkpointed restart (register max-merge is commutative/idempotent)."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators import sketch
from ocr_cezam_spark.streaming.events import run_available_now
from ocr_cezam_spark.streaming.hll_stream import hll_stream

SCHEMA = "grp string, k string"


def _events_pdf() -> pd.DataFrame:
    rows = []
    # two groups with different cardinalities; every key delivered twice
    # (sketch must track DISTINCT) and group b's keys overlap group a's
    # (groups must not bleed into each other's registers)
    for rep in range(2):
        for i in range(300):
            rows.append(("a", f"k{i}"))
        for i in range(40):
            rows.append(("b", f"k{i}"))
    return pd.DataFrame(rows, columns=["grp", "k"])


def _final_state(spark, out: str) -> dict:
    latest = (
        spark.read.parquet(out)
        .groupBy("grp")
        .agg(F.max(F.struct("n_rows", "hll_est", "n_regs")).alias("b"))
        .select("grp", "b.hll_est", "b.n_regs", "b.n_rows")
    )
    return {r["grp"]: (r["hll_est"], r["n_regs"], r["n_rows"])
            for r in latest.collect()}


def test_hll_stream_matches_batch_and_survives_restart(spark, tmp_path):
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
        run_available_now(hll_stream(stream), ckpt, out)

    run()
    got = _final_state(spark, out)
    batch = spark.createDataFrame(pdf, SCHEMA)
    want = {r["grp"]: (r["hll_est"], r["n_regs"]) for r in
            sketch.hll_cardinality(batch, "k", "grp").collect()}
    # stream-final == batch, bit-identical estimates
    assert {g: v[:2] for g, v in got.items()} == want
    assert got["a"][2] == 600 and got["b"][2] == 80

    # restart from the checkpoint with NEW keys for group b only: its
    # registers update (estimate can only grow or persist — max-merge),
    # group a keeps its answer without reprocessing (n_rows unchanged)
    extra = pd.DataFrame(
        [("b", f"fresh{i}") for i in range(60)], columns=["grp", "k"]
    )
    extra.to_parquet(src / "part-99.parquet", index=False)
    run()
    got2 = _final_state(spark, out)
    assert got2["a"] == got["a"]  # no reprocessing of old files
    assert got2["b"][2] == 140
    batch2 = pd.concat([pdf, extra], ignore_index=True)
    want2 = {r["grp"]: (r["hll_est"], r["n_regs"]) for r in
             sketch.hll_cardinality(
                 spark.createDataFrame(batch2, SCHEMA), "k", "grp"
             ).collect()}
    assert {g: v[:2] for g, v in got2.items()} == want2
