"""Bucketed co-located joins: same-bucketed tables join with NO Exchange
in the physical plan (the write-once-join-many shuffle elimination), and
results equal the plain join."""

from __future__ import annotations

from ocr_cezam_spark.plans.audit import formatted_plan
from ocr_cezam_spark.sources.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.01"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "b_orders", "custkey", 8, path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "b_customer", "custkey", 8, path=str(tmp_path / "b_customer"),
    )
    try:
        # force the sort-merge path so the assertion is about bucketing,
        # not about broadcast thresholds
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_customer", "custkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # same rows as the plain (shuffled) join
        plain = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .withColumnRenamed("o_custkey", "custkey")
            .join(
                spark.read.parquet(f"{SF}/customer.parquet")
                .withColumnRenamed("c_custkey", "custkey"),
                "custkey",
            )
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
