"""Stateful streaming sessionization must reproduce the batch operator's
session structure across micro-batch boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.operators.relational import sessionize
from ocr_cezam_spark.streaming.sessions import stateful_sessionize

SF = "/root/testdata/sf0.001"
SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def test_stateful_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")

    # stage as 4 strictly time-ordered files, written sequentially so the
    # file source (oldest-mtime-first) replays them in ts order and the
    # per-user state genuinely carries across micro-batches
    import time

    src = tmp_path / "src"
    src.mkdir()
    pdf = events.orderBy("ts", "event_id").toPandas()
    # pandas defaults to ns-precision timestamps, which parquet stores as
    # INT64(ns) — Spark's ntz reader wants micros
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    step = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * step: (i + 1) * step].to_parquet(
            src / f"part-{i:02d}.parquet", index=False
        )
        time.sleep(1.1)  # distinct mtimes (second granularity on some fs)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = str(tmp_path / "out")
    q = (
        stateful_sessionize(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # latest emission per (user, session) is the current aggregate
    latest = (
        spark.table("sess")
        .groupBy("user_id", "session_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("session_value").alias("session_value"),
        )
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_value"])
        for r in latest.collect()
    }

    want = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_value"])
        for r in sessionize(events).collect()
    }
    assert len(got) == len(want) and len(got) > 20
    mismatches = {k: (got[k], want.get(k)) for k in got if got[k] != want.get(k)}
    assert not mismatches, list(mismatches.items())[:5]
