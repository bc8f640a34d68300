"""Two-pass hot-host salting: detection, partition spread, and
byte-identity of the extraction output with and without salting."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.corpus import corpus_df
from ocr_cezam_spark.operators import extract as X
from ocr_cezam_spark.skew import detect_hot_hosts, host_of, salted_repartition

N = 300


def test_detect_hot_hosts_finds_the_skewed_hosts(spark):
    docs = corpus_df(spark, N)
    hot = set(detect_hot_hosts(docs))
    # corpus puts ~30% of rows on 3 designated hot hosts (~10% each,
    # > the 5% threshold); every site-NNN host is far below it
    assert hot == {
        "news.bigportal.example",
        "shop.megastore.example",
        "blog.contentfarm.example",
    }


def test_salting_spreads_hot_hosts_and_colocates_cold(spark):
    docs = corpus_df(spark, N)
    parted = salted_repartition(docs, 16).select(
        host_of().alias("host"), F.spark_partition_id().alias("pid")
    )
    spread = {
        r["host"]: r["n_parts"]
        for r in parted.groupBy("host")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .collect()
    }
    for hot in ("news.bigportal.example", "shop.megastore.example"):
        assert spread[hot] > 1, (hot, spread[hot])
    cold = [h for h in spread if h.endswith(".example.org")]
    assert cold and all(spread[h] == 1 for h in cold)


def test_no_straggler_partition_in_metrics(spark):
    """SURVEY section 5 scale/skew test: with ~30% of rows on 3 hot hosts,
    the salted kernel run must leave no straggler — no partition holding
    more than 2x the median document count (checked from the metrics
    table, not from driver-side resampling)."""
    docs = corpus_df(spark, 320)
    out = X.run_extract(salted_repartition(docs, 16), num_partitions=None)
    sizes = sorted(
        r["n_docs"] for r in X.partition_metrics(out).collect() if r["n_docs"] > 0
    )
    median = sizes[len(sizes) // 2]
    assert sizes[-1] <= 2 * median, (sizes, median)


def test_salted_output_byte_identical(spark):
    docs = corpus_df(spark, N)
    plain = {
        r["url"]: r["text"]
        for r in X.run_extract(docs, num_partitions=8).select("url", "text").collect()
    }
    salted = {
        r["url"]: r["text"]
        for r in X.run_extract(salted_repartition(docs, 16), num_partitions=None)
        .select("url", "text")
        .collect()
    }
    assert plain == salted


def test_host_of_handles_bare_and_query_urls(spark):
    from ocr_cezam_spark.skew import host_of

    df = spark.createDataFrame(
        [("https://a.com",), ("https://b.com?q=1",), ("http://c.com/x",),
         ("https://d.com#frag",)],
        ["url"],
    )
    got = [r[0] for r in df.select(host_of()).collect()]
    assert got == ["a.com", "b.com", "c.com", "d.com"]


def test_rendezvous_shard_is_map_only_and_stable(spark):
    """HRW assignment must stay a map-only plan (no Exchange) and keys
    that move under a grow-reshard may only move TO the new shards."""
    from ocr_cezam_spark import skew

    df = spark.createDataFrame(
        [(f"https://h{i % 9}.ex/p{i}",) for i in range(400)],
        "url string",
    )
    assigned = skew.rendezvous_shard(df, "url", 8)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    shards = {r["shard"] for r in assigned.collect()}
    assert shards <= set(range(8))

    # grow 8 -> 12: movers land only on shards 8..11, and the moved
    # fraction tracks (S'-S)/S' = 1/3 loosely
    a = skew.rendezvous_shard(df, "url", 8).withColumnRenamed(
        "shard", "s8")
    b = skew.rendezvous_shard(a, "url", 12)
    rows = b.collect()
    movers = [r for r in rows if r["shard"] != r["s8"]]
    assert movers and all(r["shard"] >= 8 for r in movers)
    frac = len(movers) / len(rows)
    assert 0.15 < frac < 0.55  # expected 1/3, generous band

    out = skew.reshard_movement(df, "url", 8, 12).collect()
    assert sum(r["n_arrived"] for r in out) == len(movers)
    assert all(r["expected_frac"] == 0.3333 for r in out)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        skew.reshard_movement(df, "url", 12, 8)
