"""Set operations (SURVEY.md §2.7, Phase 3).

The reference's only set-shaped op is the dashboard's
``[...new Set(timestamps)]`` distinct (analytical_server.py:497-499);
the engine exposes the full surface: UNION ALL / unionByName, INTERSECT,
EXCEPT (distinct) and EXCEPT ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import register


@register(
    "q_union_all",
    tags=("setop",),
    oracle="""
        SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS role
        FROM customer
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS role
        FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two heterogeneous entity tables via unionByName —
    name-based, so column order can never silently mis-zip."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("role"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("role"),
    )
    return c.unionByName(s)


@register(
    "q_intersect_users",
    tags=("setop",),
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both clicked and purchased — INTERSECT (distinct)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "q_except_users",
    tags=("setop",),
    oracle="""
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events WHERE event_type = 'purchase'
    """,
)
def q_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-days with clicks but no purchase — EXCEPT (distinct). Keyed on
    (user, day) so the result is non-degenerate at every sf (every user
    eventually does everything in the synthetic data)."""
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", day)
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.subtract(buys)  # subtract == EXCEPT DISTINCT


@register(
    "q_except_all_minutes",
    tags=("setop",),
    oracle="""
        SELECT date_trunc('minute', ts) AS minute FROM events
        WHERE event_type = 'view'
        EXCEPT ALL
        SELECT date_trunc('minute', ts) AS minute FROM events
        WHERE event_type = 'click'
    """,
)
def q_except_all_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL) over minute buckets."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.date_trunc("minute", F.col("ts")).alias("minute")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.date_trunc("minute", F.col("ts")).alias("minute")
    )
    return views.exceptAll(clicks)
