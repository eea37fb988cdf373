"""Data-layout operators: Z-ORDER clustering keys.

Write-side scale lever: sorting/range-partitioning a fact table by an
interleaved-bit (Morton) key keeps parquet row-group min/max statistics
tight on BOTH interleaved dimensions at once, so 2-D predicates skip
files that a 1-D sort could only skip on its leading column.  The
operator computes the key and PROVES the locality property: grouped by
key-range "file", both dimensions stay within a bounded sub-range
(pinned by tests/test_corpus.py's layout test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import register

Z_BITS = 8  # per-dimension bits -> 16-bit z-value
Z_FILES = 256  # z div 256 -> one "file" per 8-bit z prefix


def _z_expr(divop: str) -> str:
    """The Morton interleave as pure integer arithmetic (identical in
    Spark SQL with ``div`` and DuckDB with ``//``): bit i of ub lands at
    position 2i, bit i of mb at 2i+1."""
    terms = [
        f"{4 ** i} * ((ub {divop} {2 ** i}) % 2 + 2 * ((mb {divop} {2 ** i}) % 2))"
        for i in range(Z_BITS)
    ]
    return " + ".join(terms)


@register(
    "q_layout_zorder",
    tags=("layout", "scale", "pushdown"),
    oracle=f"""
        WITH dims AS (
            SELECT user_id % 256 AS ub,
                   ((CAST(floor(epoch(ts)) AS BIGINT) // 60) % 256) AS mb
            FROM events
        ), z AS (
            SELECT ub, mb, ({_z_expr('//')}) AS zv FROM dims
        )
        SELECT zv // {Z_FILES} AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(ub) AS BIGINT) AS min_ub,
               CAST(MAX(ub) AS BIGINT) AS max_ub,
               CAST(MIN(mb) AS BIGINT) AS min_mb,
               CAST(MAX(mb) AS BIGINT) AS max_mb
        FROM z
        GROUP BY 1
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) clustering key over (user bucket, minute bucket)
    with the per-"file" dimension ranges that make file-skipping work:
    with a {Z_BITS * 2}-bit z-value split into {Z_FILES} files, every
    file is one 8-bit z prefix = top-4 bits of EACH dimension, so both
    ub and mb span at most 16 consecutive values inside any file — a
    predicate ``user_bucket BETWEEN 0 AND 31`` prunes 7/8 of files on
    min/max stats alone, and so does a minute-range predicate; a 1-D
    sort gets one or the other.

    Plan: the key is pure per-row integer arithmetic (zero shuffle to
    compute); the rollup here is one aggregation standing in for the
    ``repartitionByRange(zv).sortWithinPartitions(zv)`` write a real
    pipeline ends with (see ``sources/writers.py``'s bucketed writer).
    The oracle recomputes the identical interleave with ``//``."""
    ev = table(spark, sf_dir, "events")
    dims = ev.select(
        (F.col("user_id") % 256).alias("ub"),
        (
            F.expr("unix_timestamp(cast(ts as timestamp)) div 60") % 256
        ).alias("mb"),
    )
    z = dims.withColumn("zv", F.expr(_z_expr("div")))
    return (
        z.withColumn("file_id", F.expr(f"zv div {Z_FILES}"))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ub").alias("min_ub"),
            F.max("ub").alias("max_ub"),
            F.min("mb").alias("min_mb"),
            F.max("mb").alias("max_mb"),
        )
    )
