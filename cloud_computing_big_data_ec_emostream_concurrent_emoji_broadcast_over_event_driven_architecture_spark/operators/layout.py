"""Data-layout operators: Z-ORDER clustering keys, zone-map skipping,
small-file compaction planning.

Write-side scale levers: sorting/range-partitioning a fact table by an
interleaved-bit (Morton) key keeps parquet row-group min/max statistics
tight on BOTH interleaved dimensions at once, so 2-D predicates skip
files that a 1-D sort could only skip on its leading column.  The
operator computes the key and PROVES the locality property: grouped by
key-range "file", both dimensions stay within a bounded sub-range
(pinned by tests/test_corpus.py's layout test).

``q_layout_zonemap_skip`` quantifies WHY layout matters: it simulates
parquet footer min/max pruning for two physical layouts of the same
fact table and reports the files/rows a date predicate skips in each.
``q_layout_compaction_bins`` is the maintenance side — the greedy
in-order bin-packing a table service runs to rewrite many small files
into target-sized compaction groups.
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


# --- zone-map (min/max footer-stats) skipping simulation --------------------
ZM_ORDERS_PER_FILE = 1024  # natural layout: one "file" per orderkey range
ZM_PRED_LO = "1996-01-01"
ZM_PRED_HI = "1996-12-31"


def _zm_rollup_sql(file_expr: str) -> str:
    """Per-file min/max stats -> skip verdict, as one aggregation."""
    return f"""
        SELECT {file_expr} AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               (MAX(l_shipdate) < TIMESTAMP '{ZM_PRED_LO} 00:00:00'
                OR MIN(l_shipdate) > TIMESTAMP '{ZM_PRED_HI} 00:00:00')
                   AS skipped
        FROM lineitem
        GROUP BY 1
    """


@register(
    "q_layout_zonemap_skip",
    tags=("layout", "scale", "pushdown"),
    oracle=f"""
        WITH nat AS ({_zm_rollup_sql('l_orderkey // ' + str(ZM_ORDERS_PER_FILE))}),
        dat AS ({_zm_rollup_sql(
            "(EXTRACT(year FROM l_shipdate) * 12 + EXTRACT(month FROM l_shipdate))"
        )}),
        u AS (
            SELECT 'natural' AS layout, * FROM nat
            UNION ALL
            SELECT 'date_clustered' AS layout, * FROM dat
        )
        SELECT layout,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN skipped THEN 1 ELSE 0 END) AS BIGINT)
                   AS files_skipped,
               CAST(SUM(CASE WHEN skipped THEN n_rows ELSE 0 END) AS BIGINT)
                   AS rows_skipped
        FROM u GROUP BY layout
    """,
)
def q_layout_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning simulation: per-"file" min/max(l_shipdate)
    footer stats for two layouts of lineitem — natural (files are
    orderkey ranges, {ZM_ORDERS_PER_FILE} orders each) and
    date-clustered (files are ship months) — then the count of files
    and rows a one-year ship-date predicate skips on stats alone.
    The date-clustered layout skips every out-of-range month file;
    the natural layout skips only files whose orderkey range happens
    to miss the year — exactly the asymmetry that makes
    repartitionByRange-on-date writes worth their shuffle at 100 TB.

    Plan: two aggregations over one scan + a union of tiny per-file
    stat relations (file-count-sized, not row-count-sized); the final
    rollup is over n_files rows. No joins, no windows."""
    li = table(spark, sf_dir, "lineitem")
    lo = F.to_timestamp(F.lit(f"{ZM_PRED_LO} 00:00:00"))
    hi = F.to_timestamp(F.lit(f"{ZM_PRED_HI} 00:00:00"))

    def rollup(file_col, layout: str) -> DataFrame:
        return (
            li.groupBy(file_col.alias("file_id"))
            .agg(
                F.count("*").alias("n_rows"),
                F.min("l_shipdate").alias("mn"),
                F.max("l_shipdate").alias("mx"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "n_rows",
                ((F.col("mx") < lo) | (F.col("mn") > hi)).alias("skipped"),
            )
        )

    nat = rollup(
        F.expr(f"l_orderkey div {ZM_ORDERS_PER_FILE}"), "natural"
    )
    dat = rollup(
        F.year("l_shipdate") * 12 + F.month("l_shipdate"), "date_clustered"
    )
    return (
        nat.unionAll(dat)
        .groupBy("layout")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.when(F.col("skipped"), 1).otherwise(0)).alias(
                "files_skipped"
            ),
            F.sum(F.when(F.col("skipped"), F.col("n_rows")).otherwise(0)).alias(
                "rows_skipped"
            ),
        )
    )


# --- small-file compaction planner ------------------------------------------
COMPACT_DOCS_PER_FILE = 5  # simulated small files: 5 docs each
COMPACT_TARGET_BYTES = 2000  # rewrite goal: ~2 KB compaction groups


@register(
    "q_layout_compaction_bins",
    tags=("layout", "scale"),
    oracle=f"""
        WITH files AS (
            SELECT source, doc_id // {COMPACT_DOCS_PER_FILE} AS file_id,
                   SUM(n_chars) AS file_bytes
            FROM documents GROUP BY 1, 2
        ),
        planned AS (
            SELECT source, file_id, file_bytes,
                   (SUM(file_bytes) OVER (PARTITION BY source ORDER BY file_id
                        ROWS UNBOUNDED PRECEDING) - file_bytes)
                       // {COMPACT_TARGET_BYTES} AS bin_id
            FROM files
        )
        SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(file_bytes) AS BIGINT) AS total_bytes,
               CAST(MIN(file_id) AS BIGINT) AS first_file,
               CAST(MAX(file_id) AS BIGINT) AS last_file
        FROM planned GROUP BY source, bin_id
    """,
)
def q_layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/rewrite step a table
    service schedules): simulated small files ({COMPACT_DOCS_PER_FILE}
    docs each, sized by total chars) are greedily packed IN FILE ORDER
    into ~{COMPACT_TARGET_BYTES}-byte rewrite groups per source —
    bin = floor(running_bytes_before_this_file / target), the
    prefix-sum form of first-fit-in-order. In-order packing preserves
    any existing sort/cluster key ordering across the rewrite, which
    is why real services (Delta OPTIMIZE, Iceberg binpack) use it over
    global best-fit.

    Plan: one agg builds the per-file size relation (file-count-sized),
    one source-partitioned running-sum window assigns bins, one final
    rollup. The window partitions by source, so planning parallelizes
    across sources; within a source the prefix sum is the inherent
    sequential dependency of ordered packing — over file stats, not
    data rows."""
    docs = table(spark, sf_dir, "documents")
    files = (
        docs.groupBy(
            "source",
            F.expr(f"doc_id div {COMPACT_DOCS_PER_FILE}").alias("file_id"),
        )
        .agg(F.sum("n_chars").alias("file_bytes"))
    )
    planned = files.withColumn(
        "bin_id",
        F.expr(
            f"(sum(file_bytes) over (partition by source order by file_id "
            f"rows between unbounded preceding and current row) - file_bytes) "
            f"div {COMPACT_TARGET_BYTES}"
        ),
    )
    return planned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_files"),
        F.sum("file_bytes").alias("total_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )


# fixed-width assumption per column for the RLE size model: DATE32 + the
# two CHAR(1) flags, each run costing (value bytes + 2-byte run length).
_RLE_WIDTH = {"l_shipdate": 4, "l_returnflag": 1, "l_linestatus": 1}
_RLE_LAYOUTS = {
    "shipdate_first": ("l_shipdate", "l_returnflag", "l_linestatus"),
    "flag_first": ("l_returnflag", "l_linestatus", "l_shipdate"),
}


def _rle_oracle() -> str:
    rows = []
    for layout, cols in _RLE_LAYOUTS.items():
        for i in range(3):
            prefix = ", ".join(cols[: i + 1])
            width = _RLE_WIDTH[cols[i]] + 2
            rows.append(
                f"""SELECT '{layout}' AS layout,
                       {i + 1} AS position,
                       '{cols[i]}' AS column_name,
                       (SELECT CAST(COUNT(*) AS BIGINT) FROM
                           (SELECT DISTINCT {prefix} FROM lineitem))
                           AS est_runs,
                       ROUND((SELECT COUNT(*) FROM lineitem)
                             / (SELECT COUNT(*) FROM
                                 (SELECT DISTINCT {prefix} FROM lineitem)),
                             2) AS avg_run_len,
                       (SELECT CAST(COUNT(*) * {width} AS BIGINT) FROM
                           (SELECT DISTINCT {prefix} FROM lineitem))
                           AS est_rle_bytes"""
            )
    return " UNION ALL ".join(rows)


@register(
    "q_layout_rle_estimate",
    tags=("layout", "scale", "stats"),
    oracle=_rle_oracle(),
)
def q_layout_rle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORT-ORDER COMPRESSION PLANNER: for two candidate sort orders of
    the fact table, estimate each leading column's run-length encoding
    cost the way a table-service optimizer does — when the table is
    sorted by (c1..ci..), column ci has (upper-bound) one run per
    distinct (c1..ci) prefix, so est_runs = NDV(prefix), and
    est_rle_bytes = runs x (value width + 2-byte run length). Sorting
    low-cardinality flags first costs ~6 runs total; date-first pays
    NDV(date) runs on every following column — the arithmetic that
    decides ZORDER-vs-linear rewrites before touching a byte.

    Plan: ONE data-sized distinct projects the fact table down to the
    triple-NDV table (thousands of rows); every prefix NDV is then an
    aggregate over that tiny table, the row count is a 1-row broadcast
    scalar, and the 6-row report is literal-mapped from the single
    stats row. At 100 TB: one shuffle total, everything downstream is
    KB-sized. NDV counts are exact integers, so the only double (the
    rounded avg run length) divides identical integers on both
    engines."""
    li = table(spark, sf_dir, "lineitem")
    triples = li.select(
        "l_shipdate", "l_returnflag", "l_linestatus"
    ).distinct()
    aggs = []
    nd_cols = {}
    for layout, cols in _RLE_LAYOUTS.items():
        for i in range(3):
            key = f"nd_{layout}_{i + 1}"
            nd_cols[(layout, i)] = key
            aggs.append(
                F.count_distinct(*[F.col(c) for c in cols[: i + 1]]).alias(
                    key
                )
            )
    stats = triples.agg(*aggs).crossJoin(
        F.broadcast(li.agg(F.count("*").alias("n_rows")))
    )
    # stack() unpivots the single stats row into the 6-row report in ONE
    # projection — a per-branch union would replan (and rescan) the
    # aggregation once per row.
    stack_args = []
    for layout, cols in _RLE_LAYOUTS.items():
        for i in range(3):
            key = nd_cols[(layout, i)]
            width = _RLE_WIDTH[cols[i]] + 2
            stack_args.append(
                f"'{layout}', {i + 1}, '{cols[i]}', {key}, {width}"
            )
    stacked = stats.select(
        F.expr(
            f"stack({len(stack_args)}, {', '.join(stack_args)}) AS "
            "(layout, position, column_name, nd, run_bytes)"
        ),
        "n_rows",
    )
    return stacked.select(
        "layout",
        "position",
        "column_name",
        F.col("nd").cast("bigint").alias("est_runs"),
        F.round(F.col("n_rows") / F.col("nd"), 2).alias("avg_run_len"),
        (F.col("nd") * F.col("run_bytes")).cast("bigint").alias(
            "est_rle_bytes"
        ),
    )
