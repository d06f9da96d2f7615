"""Bucketed co-located join: the plan must be Exchange-free and the
result identical to the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magicxml_spark.operators.bucketing import bucketed_join, write_bucketed
from magicxml_spark.tables import table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    write_bucketed(
        table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem",
        "l_orderkey",
        8,
    )
    write_bucketed(
        table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority"),
        "b_orders",
        "o_orderkey",
        8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # at test SF the planner would broadcast the small side (also
    # shuffle-free, but not the plan under test) — pin sort-merge so
    # the bucketed co-location is what avoids the Exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "Bucketed: true" in plan, plan[:2000]

        # and the result matches the plain (shuffling) join
        n_bucketed = joined.count()
        plain = table(spark, SF_SMOKE, "lineitem").join(
            table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert n_bucketed == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
