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


def test_hll_stream64_matches_batch64_bit_identically(spark, tmp_path):
    """The 64-bit streaming mode at non-default p=11 must equal
    sketch.hll_cardinality64's estimates bit for bit (the integer-scaled
    fold makes both sides divide identical doubles), across micro-batch
    splits and duplicate delivery."""
    from ocr_cezam_spark.streaming.hll_stream import hll_stream64

    pdf = _events_pdf()
    src = tmp_path / "src"
    src.mkdir()
    step = (len(pdf) + 1) // 2
    for i in range(2):
        pdf.iloc[i * step: (i + 1) * step].to_parquet(
            src / f"part-{i:02d}.parquet", index=False
        )
        time.sleep(1.1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    run_available_now(hll_stream64(stream, p=11), ckpt, out)
    got = _final_state(spark, out)
    batch = spark.createDataFrame(pdf, SCHEMA)
    want = {r["grp"]: (r["hll_est"], r["n_regs"]) for r in
            sketch.hll_cardinality64(batch, "k", "grp", p=11).collect()}
    assert {g: v[:2] for g, v in got.items()} == want
    assert got["a"][2] == 600 and got["b"][2] == 80


def test_hll_estimate64_synthetic_past_2_32():
    """The streaming fold, like the batch fold, keeps estimating past
    the 32-bit ceiling: constructed registers for n = 10^10 distinct."""
    import math as _math
    import random

    from ocr_cezam_spark.streaming.hll_stream import hll_estimate64

    n, p = 10_000_000_000, 10
    m, rest_bits = 1 << p, 54
    k = n / m
    rng = random.Random(20260818)
    regs = []
    for _ in range(m):
        x = 1.0 - rng.random() ** (1.0 / k)
        r = max(1, _math.ceil(-_math.log2(x))) if x > 0 else rest_bits + 1
        regs.append(min(r, rest_bits + 1))
    est, n_regs = hll_estimate64(regs, p)
    assert n_regs == m
    assert est > 1 << 32 and abs(est - n) / n < 0.10
