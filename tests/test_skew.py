"""Salt-invariance: the salted join returns exactly the plain join's rows
(same multiset), for inner and left joins, at any salt count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.joins import (
    salted_join,
)


@pytest.mark.parametrize("num_salts", [1, 4, 16])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, sf_dir, num_salts, how):
    orders = table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    plain = orders.join(customer, "c_custkey", how)
    salted = salted_join(orders, customer, "c_custkey", num_salts, how)
    assert salted.count() == plain.count()
    # multiset equality via per-row hash aggregation
    def digest(df):
        cols = sorted(df.columns)
        return (
            df.select(F.xxhash64(*cols).alias("h"))
            .agg(
                F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
                F.count("*").alias("n"),
                F.min("h").alias("lo"),
                F.max("h").alias("hi"),
            )
            .collect()[0]
        )
    assert digest(salted) == digest(plain)
