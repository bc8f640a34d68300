"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship main-content extraction over the synthetic
  Common-Crawl-style corpus (the BASELINE.json input shape), sized to the
  t1 smoke tier.
- ``queries()`` / ``oracle_sql()``: the operator registry from
  ``ocr_cezam_spark.queries`` — relational mappings of SURVEY.md section 2
  over the driver's sf tables, dedup/simsearch/textstats pipeline ops, and
  kernel-backed extraction queries (two of which are hash-checked against
  frozen pure-Python goldens; the rest rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocr_cezam_spark import queries as Q
from ocr_cezam_spark.corpus import corpus_df
from ocr_cezam_spark.operators import extract as X


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract main text + fields + reconciliation status for the
    t1 smoke corpus (1000 synthetic web pages, input_hint schema)."""
    out = X.run_extract(corpus_df(spark, 1000), num_partitions=8)
    from pyspark.sql import functions as F  # noqa: N812

    return X.extracted_text(out).select(
        "url", "text", F.length("text").alias("n_chars")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
