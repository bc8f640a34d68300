"""Streaming extraction == batch extraction, and checkpoint resume:
re-running the drained stream writes nothing; new files append only the
new urls."""

from __future__ import annotations

import os

from ocr_cezam_spark.corpus import make_page
from ocr_cezam_spark.kernel import extract as kextract
from ocr_cezam_spark.streaming.extract_stream import run_extract_stream


def _write_batch(spark, tmp, lo, hi):
    import pandas as pd

    pdf = pd.DataFrame([make_page(i) for i in range(lo, hi)])
    spark.createDataFrame(pdf).write.mode("append").parquet(f"{tmp}/in")


def test_stream_equals_kernel_and_resumes(spark, tmp_path):
    tmp = str(tmp_path)
    _write_batch(spark, tmp, 0, 60)
    run_extract_stream(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    got = {
        r["url"]: r["text"]
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    assert len(got) == 60
    for i in range(60):
        p = make_page(i)
        assert got[p["url"]] == kextract(p["url"], p["html"], p["lang"])["text"]

    # drain again with no new input: checkpoint must prevent re-processing
    run_extract_stream(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    assert spark.read.parquet(f"{tmp}/out").count() == 60

    # a new file lands: only its urls are appended
    _write_batch(spark, tmp, 60, 80)
    run_extract_stream(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    final = spark.read.parquet(f"{tmp}/out")
    assert final.count() == 80
    assert final.select("url").distinct().count() == 80
    assert os.path.isdir(f"{tmp}/ckpt")
