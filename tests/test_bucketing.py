"""Bucketed tables: the shuffle-free co-located join strategy.

At 100 TB, repeatedly joining fact tables on the same key should not
re-shuffle per query — writing both sides bucketed on the join key
(``bucketBy`` + ``sortBy``) lets every SortMergeJoin read co-located
buckets with ZERO Exchange in the plan. This test proves the plan shape
on a real pair of bucketed tables.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_aqe_no_broadcast(spark):
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_bucketed_join_has_no_exchange(spark, no_aqe_no_broadcast):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
    )
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets are co-located: no shuffle
        # and the join is still correct
        expected = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert j.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
