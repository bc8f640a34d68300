"""Spark pipeline vs pure-Python kernel: byte-identical per url.

This is the north_rule gate: Arrow batching, partitioning, parallelism and
salting must introduce zero nondeterminism (SURVEY.md section 5).
"""

from __future__ import annotations

import pytest

from ocr_cezam_spark import kernel
from ocr_cezam_spark.corpus import corpus_df, make_page
from ocr_cezam_spark.operators import extract as X
from ocr_cezam_spark.skew import detect_hot_hosts, salted_repartition

N = 240


@pytest.fixture(scope="module")
def out(spark):
    df = X.run_extract(corpus_df(spark, N), num_partitions=8)
    return df.persist()


def _golden(i: int) -> dict:
    p = make_page(i)
    return kernel.extract(p["url"], p["html"], p["lang"])


def test_text_byte_identical(out):
    got = {r["url"]: r["text"] for r in out.select("url", "text").collect()}
    assert len(got) == N
    for i in range(N):
        g = _golden(i)
        assert got[g["url"]] == g["text"]


def test_fields_identical(out):
    rows = X.extracted_fields(out).collect()
    got: dict[str, dict] = {}
    for r in rows:
        got.setdefault(r["url"], {})[r["field"]] = r["value"]
    for i in range(N):
        g = _golden(i)
        assert got.get(g["url"], {}) == g["fields"]


def test_cells_and_statuses_identical(out):
    cells = X.extracted_cells(out).collect()
    by_url: dict[str, list] = {}
    for r in cells:
        by_url.setdefault(r["url"], []).append(
            (r["table_id"], r["row_id"], r["col_id"], r["value"])
        )
    statuses: dict[str, list] = {}
    for r in X.extracted_statuses(out).collect():
        statuses.setdefault(r["url"], []).append(
            (r["table_id"], r["status"], r["detail"])
        )
    for i in range(N):
        g = _golden(i)
        assert sorted(by_url.get(g["url"], [])) == sorted(g["cells"])
        assert statuses.get(g["url"], []) == g["statuses"]


def test_partitioning_invariance(spark):
    """Same bytes regardless of partition count (2 vs 16)."""
    a = {
        r["url"]: r["text"]
        for r in X.run_extract(corpus_df(spark, 64), 2).select("url", "text").collect()
    }
    b = {
        r["url"]: r["text"]
        for r in X.run_extract(corpus_df(spark, 64), 16).select("url", "text").collect()
    }
    assert a == b


def test_salted_run_identical_and_balanced(spark):
    docs = corpus_df(spark, 200)
    hot = detect_hot_hosts(docs)
    assert len(hot) >= 1  # corpus has ~3 hot hosts with ~10% each... >=5% hot
    salted = salted_repartition(docs, 8)
    out = X.run_extract(salted)
    got = {r["url"]: r["text"] for r in out.select("url", "text").collect()}
    for i in range(0, 200, 17):
        g = _golden(i)
        assert got[g["url"]] == g["text"]
    # no straggler partition > 2x median (SURVEY.md section 5 skew test)
    metrics = X.partition_metrics(out).collect()
    counts = sorted(m["n_docs"] for m in metrics)
    median = counts[len(counts) // 2]
    assert counts[-1] <= 2 * max(median, 1)


def test_error_isolation(spark):
    """A malformed row becomes an error/empty row, never a job failure."""
    pdf = corpus_df(spark, 4).toPandas()
    pdf.loc[1, "html"] = None
    docs = spark.createDataFrame(pdf)
    out = X.run_extract(docs, 2).collect()
    assert len(out) == 4


class _DeadSession:
    """Stub session whose JVM SparkContext reports stopped."""

    class _SC:
        applicationId = "app-from-a-stopped-session"

        class _JSC:
            class _S:
                @staticmethod
                def isStopped():
                    return True

            @classmethod
            def sc(cls):
                return cls._S

        _jsc = _JSC

    sparkContext = _SC


def test_kernel_cache_evicts_only_stopped_sessions(spark):
    """Dead sessions' entries are dropped; a LIVE coexisting session's
    entry survives (no cross-session cache thrash)."""
    from ocr_cezam_spark import queries as q

    q._KERNEL_CACHE.clear()
    dead_df = spark.range(10)
    q._KERNEL_CACHE[("app-from-a-stopped-session", "html")] = (
        _DeadSession, dead_df)
    live_df = spark.range(5).persist()
    live_df.count()
    # same live context under a different application id: must survive
    q._KERNEL_CACHE[("other-live-app", "html")] = (spark, live_df)

    out = q._kernel_out(spark)
    app = spark.sparkContext.applicationId
    assert set(q._KERNEL_CACHE) == {(app, "html"), ("other-live-app", "html")}
    assert live_df.storageLevel.useMemory  # live entry NOT unpersisted
    assert q._kernel_out(spark) is out  # current entry stays cached
    # a second per-session entry (the pdf corpus) coexists, same session
    pdf = q._pdf_out(spark)
    assert (app, "pdf") in q._KERNEL_CACHE
    assert q._pdf_out(spark) is pdf and q._kernel_out(spark) is out
    live_df.unpersist()
    q._KERNEL_CACHE.pop(("other-live-app", "html"))


def test_job_redact_pii_masks_extracted_table(spark, tmp_path):
    import re as _re

    from ocr_cezam_spark.job import run_job
    from ocr_cezam_spark.operators.scrub import PII_PATTERNS

    docs = corpus_df(spark, 120)
    counts = run_job(spark, docs, str(tmp_path / "red"), num_partitions=4,
                     redact_pii=True)
    assert counts["extracted"] == 120
    ext = spark.read.parquet(str(tmp_path / "red" / "extracted"))
    assert {"n_emails", "n_phones", "n_ips", "text", "url"} <= set(ext.columns)
    rows = ext.collect()
    # the synthetic statements carry real emails/phones -> counts observed
    assert sum(r["n_emails"] for r in rows) > 0
    for r in rows:
        for kind, pat, repl in PII_PATTERNS:
            assert not _re.search(pat, r["text"]), (r["url"], kind)
        if r["n_emails"]:
            assert "[EMAIL]" in r["text"]
    # digests keep RAW-text identity: same corpus without redaction
    # produces identical digests
    run_job(spark, docs, str(tmp_path / "raw"), num_partitions=4)
    dig_red = {(r["url"], r["digest"]) for r in
               spark.read.parquet(str(tmp_path / "red" / "digests")).collect()}
    dig_raw = {(r["url"], r["digest"]) for r in
               spark.read.parquet(str(tmp_path / "raw" / "digests")).collect()}
    assert dig_red == dig_raw


def test_job_refuses_resume_across_redaction_states(spark, tmp_path):
    import pytest as _pytest

    from ocr_cezam_spark.job import run_job

    docs = corpus_df(spark, 40)
    run_job(spark, docs, str(tmp_path / "mix"), num_partitions=2)
    with _pytest.raises(ValueError, match="redaction"):
        run_job(spark, docs, str(tmp_path / "mix"), num_partitions=2,
                redact_pii=True)
    # matching state on a fresh prefix works, and same-state resume is a no-op
    run_job(spark, docs, str(tmp_path / "mix2"), num_partitions=2,
            redact_pii=True)
    run_job(spark, docs, str(tmp_path / "mix2"), num_partitions=2,
            redact_pii=True)  # same state resumes fine (0 rows)


def test_headings_identical(out):
    rows = X.extracted_headings(out).collect()
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["url"], []).append((r["pos"], r["level"], r["heading"]))
    for i in range(N):
        g = _golden(i)
        want = [(p, lv, t) for p, (lv, t) in enumerate(g["headings"])]
        assert sorted(got.get(g["url"], [])) == want
