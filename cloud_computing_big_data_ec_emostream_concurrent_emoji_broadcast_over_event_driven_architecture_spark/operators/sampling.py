"""Deterministic sampling + distribution statistics (training-data
pipeline north star; no reference counterpart).

A 100 TB corpus is never trained on whole: pipelines need reproducible
sampling (same subset on every run, on any cluster layout) and cheap
distribution summaries. Random ``sample()`` is not reproducible across
partitionings, so everything here keys on the same cross-engine md5 hash
the dedup tier uses (functions/hashing.py) — a pure projection, no
shuffle, and the DuckDB oracle reproduces the exact subset.

- ``q_sample_hash``        Bernoulli-by-hash 10% sample.
- ``q_train_test_split``   hash-mod 90/10 split with per-split stats.
- ``q_stratified_sample``  fixed-size per-stratum sample (hash-ranked
                           top-N per event type) — per-key skew-free.
- ``q_percentiles``        exact interpolated quantiles per group.
- ``q_histogram``          fixed-width binning via width_bucket.
- ``q_corr_stats``         corr/covariance/stddev per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashing import md5_long, md5_long_sql
from ..plans.registry import register

_EV_HASH = md5_long_sql("CAST(event_id AS VARCHAR)")


@register(
    "q_sample_hash",
    tags=("sampling", "hash", "scale"),
    oracle=f"""
        SELECT event_id, event_type
        FROM events
        WHERE {_EV_HASH} % 10 = 0
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% Bernoulli sample keyed on md5(event_id): a pure
    per-row filter — no shuffle, no RNG state, identical subset at any
    parallelism, and the predicate pushes into the scan's row filtering."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        md5_long(F.col("event_id").cast("string")) % 10 == 0
    ).select("event_id", "event_type")


@register(
    "q_train_test_split",
    tags=("sampling", "hash"),
    oracle=f"""
        SELECT CASE WHEN {_EV_HASH} % 10 < 9 THEN 'train' ELSE 'test' END
                   AS split,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by hash-mod, summarized per
    split. The split label is a projection — the full-table pass happens
    exactly once, and rows never move to be labeled."""
    ev = table(spark, sf_dir, "events")
    h = md5_long(F.col("event_id").cast("string"))
    return (
        ev.withColumn(
            "split", F.when(h % 10 < 9, F.lit("train")).otherwise(F.lit("test"))
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q_stratified_sample",
    tags=("sampling", "hash", "window"),
    oracle=f"""
        WITH ranked AS (
            SELECT event_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY {_EV_HASH}, event_id
                   ) AS rn
            FROM events
        )
        SELECT event_type, event_id FROM ranked WHERE rn <= 100
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size stratified sample: exactly 100 events per type, chosen
    by hash rank (reproducible, uniform-ish). One shuffle on the stratum
    key; rank truncation means each stratum contributes a bounded output
    regardless of its size — the skew-free form of per-stratum sampling."""
    ev = table(spark, sf_dir, "events")
    h = md5_long(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(h, F.col("event_id"))
    return (
        ev.select("event_type", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 100)
        .select("event_type", "event_id")
    )


@register(
    "q_percentiles",
    tags=("stats", "agg"),
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
               ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines implement
    the same linear-interpolation definition; rounding absorbs ulp-level
    arithmetic differences). At 100 TB the approximate twin is
    ``approx_percentile`` — same call shape, sketch-mergeable."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "q_histogram",
    tags=("stats", "agg"),
    oracle="""
        SELECT CASE WHEN l_extendedprice < 0 THEN 0
                    WHEN l_extendedprice >= 120000 THEN 25
                    ELSE CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) + 1
               END AS bucket,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1
    """,
    # DuckDB has no width_bucket scalar — the CASE/FLOOR form is the SQL-
    # standard definition for min=0, max=120000, 24 buckets (width 5000).
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of line-item price: width_bucket is a pure
    projection, so the histogram is one partial-aggregated groupBy over
    ≤ 26 keys — constant-size shuffle no matter the input size."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket(
                F.col("l_extendedprice"), F.lit(0), F.lit(120000), F.lit(24)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "q_corr_stats",
    tags=("stats", "agg"),
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov,
               ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance / stddev per group — single-pass co-moment
    aggregates (partial + final, shuffle carries one accumulator per
    group). Rounded in both engines to absorb summation-order float
    noise."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_cov"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
    )
