"""Streaming Bloom must converge to the batch sketch.bloom_bits bit set
BIT-IDENTICALLY across micro-batches, duplicate delivery, and a
checkpointed restart (set union is commutative and idempotent)."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators import sketch
from ocr_cezam_spark.streaming.bloom_stream import bloom_stream
from ocr_cezam_spark.streaming.events import run_available_now

SCHEMA = "grp string, k string"
M, K = 512, 4


def _events_pdf() -> pd.DataFrame:
    rows = []
    for rep in range(2):  # every key delivered twice: idempotent union
        for i in range(150):
            rows.append(("a", f"https://h{i % 9}.ex/p{i}"))
        for i in range(12):
            rows.append(("b", f"https://h{i % 9}.ex/p{i}"))
    rows.append(("b", None))  # null keys set no bits, count no rows
    return pd.DataFrame(rows, columns=["grp", "k"])


def _final(spark, out: str) -> dict:
    latest = (
        spark.read.parquet(out)
        .groupBy("grp")
        .agg(F.max(F.struct("n_rows", "n_bits_set", "fill_frac"))
             .alias("b"))
        .select("grp", "b.n_bits_set", "b.fill_frac", "b.n_rows")
    )
    return {r["grp"]: (r["n_bits_set"], r["fill_frac"], r["n_rows"])
            for r in latest.collect()}


def test_bloom_stream_matches_batch_and_survives_restart(spark, tmp_path):
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
        run_available_now(bloom_stream(stream, m_bits=M, k=K), ckpt, out)

    run()
    got = _final(spark, out)
    batch = spark.createDataFrame(pdf, SCHEMA)

    def batch_bits(grp: str) -> int:
        return sketch.bloom_bits(
            batch.filter(F.col("grp") == grp), "k", M, K
        ).count()

    assert got["a"][0] == batch_bits("a")
    assert got["b"][0] == batch_bits("b")
    assert got["a"][2] == 300 and got["b"][2] == 24  # null row ignored

    # restart with novel keys for b only
    extra = pd.DataFrame(
        [("b", f"https://new.ex/q{i}") for i in range(30)],
        columns=["grp", "k"],
    )
    extra.to_parquet(src / "part-99.parquet", index=False)
    run()
    got2 = _final(spark, out)
    both = spark.createDataFrame(pd.concat([pdf, extra]), SCHEMA)
    want_b = sketch.bloom_bits(
        both.filter(F.col("grp") == "b"), "k", M, K
    ).count()
    assert got2["b"][0] == want_b and got2["b"][2] == 54
    assert got2["a"] == got["a"]  # untouched group stable, no reprocess
