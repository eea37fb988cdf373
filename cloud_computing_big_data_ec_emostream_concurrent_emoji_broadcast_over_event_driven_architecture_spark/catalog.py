"""Table access for a scale-factor directory of parquet tables.

All batch queries take ``(spark, sf_dir)`` and load via :func:`table` so the
parquet scan gets Catalyst's predicate pushdown + column pruning for free.

The reader *DataFrame* (the unresolved scan plan) is memoized per
(session, sf_dir, table) — round-10 optimization. ``spark.read.parquet``
re-lists the directory and re-reads footers for schema inference on
EVERY call (~90 ms of driver-side work, measured at sf0.1), and the
contract tables are immutable fixtures, so repeated inference is pure
waste — this is exactly the file-listing/metadata caching a catalog
table provides (optimization guide §6). Only the plan handle is reused:
no rows are persisted, every action still scans parquet, so bench/oracle
runs always compute from the inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (used in expr strings)
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns written as parquet TIMESTAMP(NANOS) — Spark's reader rejects the
# physical type, so we read them as raw nano longs (legacy conf) and rebuild
# a TIMESTAMP_NTZ arithmetically. NTZ keeps the value a pure UTC wall time:
# no session-timezone dependence, and micros truncation matches how DuckDB
# reads the same files (its timestamps are micros).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


# (applicationId, sf_dir, name) -> reader DataFrame. Keyed by
# applicationId so a memoized plan never outlives its SparkSession;
# entries from stopped sessions are dropped on the next miss (sessions
# are sequential in every harness, so the memo never holds more than
# one app's handles).
_READER_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_memo() -> None:
    """Drop every memoized reader plan (no persisted blocks to free —
    the memo holds unresolved scan plans, never rows)."""
    _READER_MEMO.clear()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    hit = _READER_MEMO.get(key)
    if hit is not None:
        return hit
    stale = [k for k in _READER_MEMO if k[0] != app_id]
    for k in stale:
        del _READER_MEMO[k]
    if name in _NANO_TS_COLS:
        # Scoped: the conf is consulted at schema-resolution (read) time
        # and captured into the relation, so restoring it immediately
        # afterwards keeps the session conf clean — an unrelated later
        # read of a TIMESTAMP(NANOS) file still fails loudly instead of
        # silently yielding raw nano longs (verified in round 1).
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set(
                    "spark.sql.legacy.parquet.nanosAsLong", prior
                )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(
                col,
                F.expr(
                    f"timestampadd(MICROSECOND, {col} div 1000, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    _READER_MEMO[key] = df
    return df


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("event_date",),
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as a hive-partitioned parquet dataset.

    Partition layout is the primary pruning lever at 100 TB: a
    date-partitioned fact table turns any time-range predicate into
    directory-level skipping (zero I/O for excluded days), and equi-joins
    against a filtered dim get dynamic partition pruning — the runtime
    subquery that shrinks the fact scan to the dim's surviving keys.
    Derived partition columns (e.g. ``event_date`` from ``ts``) should be
    low-cardinality: one directory per value."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def events_partitioned_by_day(
    spark: SparkSession, sf_dir: str, path: str
) -> DataFrame:
    """Materialize the events table date-partitioned (the layout the
    engine would use for the stream's archival sink), returning the
    partitioned reader."""
    ev = table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(ev, path, ("event_date",))
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 8,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as a bucketed (and sorted-within-bucket) table.

    Bucketing is the pre-partitioning lever for REPEATED joins and
    aggregations on the same key at 100 TB: both sides laid out with the
    same bucket count and key join with NO exchange (and no sort, when
    sorted), so the shuffle is paid once at write time instead of on
    every query. Spark buckets only via the table catalog
    (``saveAsTable``) — plain ``parquet(path)`` writes ignore bucket
    specs (tests/test_bucketing.py pins the no-Exchange plan)."""
    writer = (
        df.write.bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .mode(mode)
    )
    writer.saveAsTable(table_name)


def write_training_shards(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize a corpus as fixed-size TRAINING SHARDS: the
    deterministic global-shuffle rank (``operators/corpus.
    shard_assignments`` — two-phase bucket construction, no
    single-partition sort) assigns every doc a shard; the write is
    hive-partitioned by ``shard_id`` with rows sorted by the global rank
    within each shard, so a trainer streaming shard files in shard_id
    order replays the exact logical shuffle order, reproducibly, from
    any worker count."""
    from .operators.corpus import shard_assignments

    (
        shard_assignments(docs)
        .repartition("shard_id")
        .sortWithinPartitions("grn")
        .drop("hv", "b", "off", "bc")
        .write.partitionBy("shard_id")
        .mode(mode)
        .parquet(path)
    )
