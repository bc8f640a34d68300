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
    docs: DataFrame, num_partitions: int, salt_buckets: int = 16,
    hot_hosts: list[str] | None = None,
) -> DataFrame:
    """Repartition on (host, salt) where salt splits ONLY the hot hosts —
    the two-pass hot-key pattern: a cheap url-column pre-aggregation finds
    the hosts owning > threshold of rows (pass 1), then the repartition
    keys hot hosts by (host, pmod(xxhash64(url), salt_buckets)) and cold
    hosts by (host, 0) so cold hosts stay co-located while no single hot
    host can own a straggler partition (pass 2). Deterministic, so output
    bytes are reproducible.

    Pass ``hot_hosts`` explicitly to skip the detection scan (e.g. when the
    caller already knows the skew profile).
    """
    if hot_hosts is None:
        hot_hosts = detect_hot_hosts(docs)
    host = host_of()
    if hot_hosts:
        salt = F.when(
            host.isin(hot_hosts), F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    return docs.repartition(num_partitions, host, salt)
