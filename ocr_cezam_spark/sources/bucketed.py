"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant recurring cost is the shuffle in joins between the
engine's big long-format tables (cells x fields on url, extracted x
embeddings on id). Writing both sides bucketed on the join key with the
same bucket count makes every such join a zero-Exchange sort-merge join —
each task reads matching buckets from both sides — so re-joining the same
artifacts N times pays the partitioning cost once at write time.

The Spark bucketing contract requires a table-catalog write
(`bucketBy(...).saveAsTable(...)`); an explicit `path` keeps data where
the caller wants it (the Iceberg analog is `bucket(N, key)` partition
transforms, the same seam as sources/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str | None = None) -> None:
    """Overwrite ``table`` bucketed+sorted by ``key`` into ``n_buckets``.

    The repartition aligns write tasks with buckets: without it every
    upstream task writes one file PER bucket (tasks x n_buckets small
    files at scale); with it each bucket is one task -> one file."""
    w = (
        df.repartition(n_buckets, key)
        .write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — the scan
    provides the hash distribution, so the physical plan contains NO
    Exchange (asserted in tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
