"""Pareto-frontier (skyline) operator.

The multi-criteria "best customers" question no single ORDER BY answers:
a point survives iff no other point is at least as good on every
criterion and strictly better on one. The naive formulation is an O(n²)
NOT EXISTS self-join; for the 2-D case the engine uses the classic
sort-scan decomposition — prefix maxima over the first criterion — which
is one aggregation plus one distinct-value-sized window, i.e. O(n log n)
work and zero self-joins. The DuckDB oracle runs the naive quadratic
form, so the hash match proves the decomposition exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import register


@register(
    "q_skyline_customers",
    tags=("frontier", "window", "scale"),
    oracle="""
        WITH base AS (
            SELECT c.c_custkey,
                   CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,10))),
                              2) AS DOUBLE) AS spent,
                   MAX(c.c_acctbal) AS acctbal
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        )
        SELECT p.c_custkey, p.spent, p.acctbal
        FROM base p
        WHERE NOT EXISTS (
            SELECT 1 FROM base q
            WHERE q.spent >= p.spent AND q.acctbal >= p.acctbal
              AND (q.spent > p.spent OR q.acctbal > p.acctbal)
        )
    """,
)
def q_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE of customers over (total spend, account balance):
    customers not dominated on both criteria.

    Plan — the sort-scan decomposition instead of the quadratic
    NOT-EXISTS self-join: a point (x, y) is dominated iff
    (a) the max y among strictly-greater x is >= y, or
    (b) some point with the SAME x has a strictly greater y.
    Both maxima come from one per-distinct-x aggregation plus one
    prefix-max window over the distinct-x rows (thousands of rows,
    not the data); the verdict joins back on x. max() is
    order-independent, so no decimal accumulation is needed and the
    booleans are hash-stable. At 100 TB: one fact aggregation
    (partial-combined on custkey), one distinct-value window, one
    broadcast-sized join back — the naive oracle form would be an
    all-pairs join."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    base = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,10)")), 2
            )
            .cast("double")
            .alias("spent"),
            F.max("c_acctbal").alias("acctbal"),
        )
    )
    # per-distinct-x maxima, then strict-prefix max over x descending
    per_x = base.groupBy("spent").agg(F.max("acctbal").alias("gy"))
    w = (
        Window.orderBy(F.desc("spent"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_x = per_x.withColumn("pm", F.max("gy").over(w))
    dominated = (
        (F.col("pm").isNotNull() & (F.col("pm") >= F.col("acctbal")))
        | (F.col("gy") > F.col("acctbal"))
    )
    return (
        base.join(per_x, "spent")
        .filter(~dominated)
        .select("c_custkey", "spent", "acctbal")
    )
