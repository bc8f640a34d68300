"""Streaming Count-Min + Misra-Gries must reconcile with the batch
sketch: stream-final counters BIT-IDENTICAL to batch cm_sketch, and the
containment chain true-heavy ⊆ stream-hitters ⊆ batch-hitters — across
micro-batches and a checkpointed restart."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators.sketch import _CM_D, _CM_W, cm_heavy_hitters, cm_sketch
from ocr_cezam_spark.streaming.cm_stream import MG_K, THRESHOLD_FRAC, cm_stream

SCHEMA = "grp string, k string"


def _events_pdf() -> pd.DataFrame:
    rows = []
    # group a: two clear heavy hitters (hot0 ~ 30%, hot1 ~ 15%, both far
    # above n/MG_K and the 2% threshold) over a 200-key tail; group b is
    # uniform (no hitter should survive in a group that has none beyond
    # collisions) and shares key strings with a (no state bleed).
    for i in range(120):
        rows.append(("a", "hot0"))
        if i % 2 == 0:
            rows.append(("a", "hot1"))
        rows.append(("a", f"t{i % 200}"))
        rows.append(("a", f"t{(i * 7) % 200}"))
    for i in range(150):
        rows.append(("b", f"t{i % 50}"))
    return pd.DataFrame(rows, columns=["grp", "k"])


def _final(spark, out: str) -> dict:
    latest = (
        spark.read.parquet(out)
        .groupBy("grp")
        .agg(F.max(F.struct("n_rows", "counters", "hitters")).alias("s"))
        .select("grp", "s.n_rows", "s.counters", "s.hitters")
    )
    return {r["grp"]: r for r in latest.collect()}


def test_cm_stream_matches_batch_and_survives_restart(spark, tmp_path):
    pdf = _events_pdf()
    src = tmp_path / "src"
    src.mkdir()
    step = (len(pdf) + 2) // 3
    # only the first two slices before the restart
    for i in range(2):
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
        q = (
            cm_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    run()
    pdf.iloc[2 * step:].to_parquet(src / "part-02.parquet", index=False)
    run()  # restart from the same checkpoint picks up the late file

    fin = _final(spark, out)
    batch_df = spark.createDataFrame(pdf, SCHEMA)
    for grp in ("a", "b"):
        g = batch_df.filter(F.col("grp") == grp)
        n = g.count()
        assert fin[grp]["n_rows"] == n
        # counters bit-identical to the batch aggregation
        want = [0] * (_CM_D * _CM_W)
        for r in cm_sketch(g, "k").collect():
            want[r["row"] * _CM_W + r["bucket"]] = r["cnt"]
        assert list(fin[grp]["counters"]) == want
        # containment: every true heavy hitter (> threshold AND > n/MG_K,
        # the regime MG guarantees) is present; everything emitted also
        # passes the batch arbitration (stream candidates ⊆ all keys)
        true_cnt = {r["k"]: r["cnt"] for r in
                    g.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
        floor_guarantee = max(int(n * THRESHOLD_FRAC), n // MG_K)
        true_heavy = {k for k, c in true_cnt.items() if c > floor_guarantee}
        got = {h["key"]: h["cm_est"] for h in fin[grp]["hitters"]}
        batch_hitters = {r["key"]: r["cm_est"] for r in
                         cm_heavy_hitters(g, "k", THRESHOLD_FRAC).collect()}
        assert true_heavy <= set(got), (grp, true_heavy, got)
        assert set(got) <= set(batch_hitters), (grp, got, batch_hitters)
        # identical point estimates for the shared keys (same counters)
        for k in got:
            assert got[k] == batch_hitters[k]
            assert got[k] >= true_cnt[k]  # CM one-sided error
    assert {h["key"] for h in fin["a"]["hitters"]} >= {"hot0", "hot1"}


def test_cm_stream_ignores_null_keys(spark, tmp_path):
    """Null keys are skipped (the batch cm_sketch convention) — never
    stringified into a real 'None' key, never counted in n_rows."""
    from ocr_cezam_spark.streaming.events import run_available_now

    pdf = pd.DataFrame(
        [("a", "x"), ("a", None), ("a", "x"), ("a", None), ("a", "y")],
        columns=["grp", "k"],
    )
    src = tmp_path / "src"
    src.mkdir()
    pdf.to_parquet(src / "p.parquet", index=False)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(cm_stream(stream), ckpt, out)
    row = _final(spark, out)["a"]
    assert row["n_rows"] == 3
    batch = spark.createDataFrame(
        pdf.dropna(), SCHEMA
    )
    want = {(r["row"], r["bucket"]): r["cnt"]
            for r in cm_sketch(batch, "k").collect()}
    got = {}
    for i, c in enumerate(row["counters"]):
        if c:
            got[(i // _CM_W, i % _CM_W)] = c
    assert got == want
