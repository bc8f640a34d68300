"""Watermarked stream-stream join (dispatch x completion) must emit
exactly the batch twin's rows — across micro-batches, duplicate
completions, out-of-horizon stragglers, and a checkpointed restart."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from ocr_cezam_spark.streaming.fetch_join_stream import (
    fetch_join_batch, fetch_join_stream)

D_SCHEMA = "d_url string, dispatch_ts timestamp"
C_SCHEMA = "c_url string, fetch_ts timestamp, http_status int"

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _fixture() -> tuple[pd.DataFrame, pd.DataFrame]:
    disp, comp = [], []
    for i in range(40):
        u = f"https://h{i % 7}.example/p{i}"
        ts = T0 + dt.timedelta(minutes=i)
        disp.append((u, ts))
        if i % 10 == 3:
            # straggler outside the 10-minute horizon: must NOT match
            comp.append((u, ts + dt.timedelta(minutes=11), 200))
        else:
            comp.append((u, ts + dt.timedelta(seconds=5 + i), 200))
        if i % 10 == 6:
            # retry: second completion inside the horizon -> TWO rows
            comp.append((u, ts + dt.timedelta(seconds=90), 503))
    # completion with no dispatch: must not match
    comp.append(("https://orphan.example/", T0, 200))
    dpdf = pd.DataFrame(disp, columns=["d_url", "dispatch_ts"])
    cpdf = pd.DataFrame(comp, columns=["c_url", "fetch_ts", "http_status"])
    # pandas defaults to ns-precision INT64 in parquet; Spark's schema
    # wants us-precision TIMESTAMP
    dpdf["dispatch_ts"] = dpdf["dispatch_ts"].astype("datetime64[us]")
    cpdf["fetch_ts"] = cpdf["fetch_ts"].astype("datetime64[us]")
    cpdf["http_status"] = cpdf["http_status"].astype("int32")
    return dpdf, cpdf


def _rows(df) -> set:
    return {(r["url"], r["dispatch_ts"], r["fetch_ts"], r["latency_ms"],
             r["http_status"]) for r in df.collect()}


def test_fetch_join_stream_matches_batch_and_survives_restart(spark, tmp_path):
    dpdf, cpdf = _fixture()
    dsrc, csrc = tmp_path / "d", tmp_path / "c"
    dsrc.mkdir(), csrc.mkdir()
    # first halves only — the rest lands after the restart
    dpdf.iloc[:20].to_parquet(dsrc / "part-00.parquet", index=False)
    cpdf.iloc[:20].to_parquet(csrc / "part-00.parquet", index=False)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        d = spark.readStream.schema(D_SCHEMA).parquet(str(dsrc))
        c = spark.readStream.schema(C_SCHEMA).parquet(str(csrc))
        q = (
            fetch_join_stream(d, c)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    run()
    first = _rows(spark.read.parquet(out))
    assert first == _rows(fetch_join_batch(
        spark.createDataFrame(dpdf.iloc[:20], D_SCHEMA),
        spark.createDataFrame(cpdf.iloc[:20], C_SCHEMA)))
    assert len(first) > 0

    # late files + RESTART from the same checkpoint: only the new
    # matches appear, and the final set equals the full batch answer
    dpdf.iloc[20:].to_parquet(dsrc / "part-01.parquet", index=False)
    cpdf.iloc[20:].to_parquet(csrc / "part-01.parquet", index=False)
    run()
    final = _rows(spark.read.parquet(out))
    batch = _rows(fetch_join_batch(
        spark.createDataFrame(dpdf, D_SCHEMA),
        spark.createDataFrame(cpdf, C_SCHEMA)))
    assert final == batch
    # fixture invariants actually exercised: retries doubled, stragglers
    # and orphans dropped
    urls = [u for (u, *_ ) in batch]
    assert any(s == 503 for (_, _, _, _, s) in batch)
    assert not any("orphan" in u for u in urls)
    n_dispatched = 40
    n_stragglers = sum(1 for i in range(40) if i % 10 == 3)
    n_retries = sum(1 for i in range(40) if i % 10 == 6)
    assert len(batch) == n_dispatched - n_stragglers + n_retries
