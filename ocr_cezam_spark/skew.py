"""Skew handling for the kernel stage.

AQE splits skewed partitions for joins, but cannot rebalance a
``mapInArrow`` stage after launch (SURVEY.md section 4, custom item b), so
balance must be created *before* the kernel runs. ``xxhash64(url)`` already
spreads urls uniformly — including urls of a hot host — so the default
repartition is skew-proof at the url grain. The salted variant below
additionally documents/handles the case where batching were keyed by host
(e.g. politeness grouping): hot hosts are split across ``salt_buckets``
sub-keys detected via a cheap pre-aggregation (the two-pass hot-key pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

HOT_HOST_THRESHOLD = 0.05  # a host owning >5% of rows is "hot"


def host_of(col: str = "url") -> F.Column:
    return F.regexp_extract(F.col(col), r"^https?://([^/]+)/", 1)


def detect_hot_hosts(docs: DataFrame, threshold: float = HOT_HOST_THRESHOLD):
    """Cheap pre-aggregation returning the list of hot host names.

    At 100 TB this runs on the url column only (column-pruned scan) and the
    result is tiny (a handful of hosts) — safe to collect and broadcast.
    """
    total = docs.count()
    rows = (
        docs.select(host_of().alias("host"))
        .groupBy("host")
        .count()
        .filter(F.col("count") > threshold * total)
        .collect()
    )
    return [r["host"] for r in rows]


def salted_repartition(
    docs: DataFrame, num_partitions: int, salt_buckets: int = 16
) -> DataFrame:
    """Repartition on (host, salt) where salt splits hot keys.

    salt = pmod(xxhash64(url), salt_buckets) — deterministic, so the output
    stays reproducible. Cold hosts keep salt=0 semantics implicitly since
    hashing (host, salt) still spreads them.
    """
    salted = docs.withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
    )
    out = salted.repartition(num_partitions, host_of(), F.col("_salt")).drop(
        "_salt"
    )
    return out
