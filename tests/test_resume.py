"""Checkpoint/resume: kill-and-rerun equals a single clean run
(SURVEY.md section 5, north_rule resumability)."""

from __future__ import annotations

from ocr_cezam_spark.corpus import corpus_df
from ocr_cezam_spark.job import run_job
from ocr_cezam_spark.sources import catalog


def _texts(spark, prefix):
    return {
        (r["url"], r["text"])
        for r in catalog.read(spark, f"{prefix}/extracted").collect()
    }


def test_resume_after_partial_run(spark, tmp_path):
    docs = corpus_df(spark, 120)

    clean = str(tmp_path / "clean")
    run_job(spark, docs, clean, num_partitions=4, resume=False)

    # partial run: only half the urls committed, then "executor loss"
    partial = str(tmp_path / "partial")
    half = docs.limit(60)
    run_job(spark, half, partial, num_partitions=4, resume=False)
    n_after_half = len(_texts(spark, partial))
    assert n_after_half == 60

    # resume: full source again; anti-join must skip committed urls
    counts = run_job(spark, docs, partial, num_partitions=4, resume=True)
    assert counts["extracted"] == 60  # only the missing urls were processed

    assert _texts(spark, partial) == _texts(spark, clean)


def test_resume_noop_when_complete(spark, tmp_path):
    docs = corpus_df(spark, 40)
    prefix = str(tmp_path / "full")
    run_job(spark, docs, prefix, num_partitions=2, resume=False)
    counts = run_job(spark, docs, prefix, num_partitions=2, resume=True)
    assert counts["extracted"] == 0
    assert len(_texts(spark, prefix)) == 40


def test_resume_mixed_html_pdf(spark, tmp_path):
    """The resume anti-join is payload-type agnostic: a partial run over a
    mixed HTML+PDF corpus resumes with exactly the missing urls."""
    from ocr_cezam_spark.corpus import pdf_corpus_df

    docs = corpus_df(spark, 40).unionByName(pdf_corpus_df(spark, 40))
    prefix = str(tmp_path / "mixed")
    run_job(spark, docs.limit(50), prefix, num_partitions=4, resume=False)
    counts = run_job(spark, docs, prefix, num_partitions=4, resume=True)
    assert counts["extracted"] == 30
    assert len(_texts(spark, prefix)) == 80
    rerun = run_job(spark, docs, prefix, num_partitions=4, resume=True)
    assert rerun["extracted"] == 0


def test_catalog_read_raises_on_non_missing_errors(spark, tmp_path):
    from ocr_cezam_spark.sources import catalog

    # missing path -> None (resume treats as nothing committed)
    assert catalog.read(spark, str(tmp_path / "nope")) is None
    # an existing path that is NOT parquet must raise, never None
    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-0000.parquet").write_bytes(b"not a parquet file")
    import pytest as _pytest

    with _pytest.raises(Exception):
        df = catalog.read(spark, str(bad))
        # parquet footer errors may surface at action time
        if df is not None:
            df.collect()
