"""Snapshot / CDC-style maintenance operators (north-star extension).

The reference keeps mutable per-key state in Python dicts (reference
analytical_server.py:15-18 — "current minute" counters overwritten in
place); a 100 TB lakehouse expresses the same mutation pattern as
declarative compaction over immutable event logs:

- latest-per-key compaction (the batch form of "the dict holds the newest
  value"),
- upsert merge of a change batch into a snapshot (MERGE semantics from
  full-outer join + coalesce — no table format required),
- schema-drift union (a new ingest batch gained a column; old batches
  align by name with null fill).

All three are single-shuffle plans keyed on the entity key — the shape
that survives a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import register

_SPLIT_TS = "2024-01-08 00:00:00"


@register(
    "q_latest_per_key",
    tags=("cdc", "window", "scale"),
    oracle="""
        SELECT user_id, event_id, ts, event_type, value
        FROM (
            SELECT user_id, event_id, ts, event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: the newest event per user (ties broken by
    event_id, so the answer is well-defined under redelivery). One
    shuffle on the key, then a per-partition sort — at 100 TB this is
    the standard snapshot-materialization pass over a change log, and
    row_number beats a groupBy+join because every payload column rides
    the same single exchange."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.select("user_id", "event_id", "ts", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q_merge_upsert",
    tags=("cdc", "join", "outer"),
    oracle=f"""
        WITH base AS (
            SELECT user_id, event_type, value FROM (
                SELECT user_id, event_type, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts < TIMESTAMP '{_SPLIT_TS}'
            ) WHERE rn = 1
        ),
        updates AS (
            SELECT user_id, event_type, value FROM (
                SELECT user_id, event_type, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts >= TIMESTAMP '{_SPLIT_TS}'
            ) WHERE rn = 1
        )
        SELECT COALESCE(u.user_id, b.user_id) AS user_id,
               COALESCE(u.event_type, b.event_type) AS event_type,
               COALESCE(u.value, b.value) AS value,
               CASE WHEN u.user_id IS NULL THEN 'kept'
                    WHEN b.user_id IS NULL THEN 'inserted'
                    ELSE 'updated' END AS merge_action
        FROM base b
        FULL JOIN updates u
          ON b.user_id = u.user_id AND b.event_type = u.event_type
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: compact the old log
    into a (user, event_type) snapshot, compact the new batch the same
    way, then full-outer join + coalesce — updates win, unmatched base
    rows survive, unmatched updates insert. Both compactions and the
    merge share one hash partitioning on the key, so Catalyst plans a
    single exchange per side and a co-partitioned join."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(_SPLIT_TS).cast("timestamp_ntz")

    def compact(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            df.select("user_id", "event_type", "value", "ts", "event_id")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "value")
        )

    base = compact(ev.filter(F.col("ts") < split)).alias("b")
    updates = compact(ev.filter(F.col("ts") >= split)).alias("u")
    return base.join(
        updates,
        (F.col("b.user_id") == F.col("u.user_id"))
        & (F.col("b.event_type") == F.col("u.event_type")),
        "full_outer",
    ).select(
        F.coalesce(F.col("u.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("u.event_type"), F.col("b.event_type")).alias(
            "event_type"
        ),
        F.coalesce(F.col("u.value"), F.col("b.value")).alias("value"),
        F.when(F.col("u.user_id").isNull(), "kept")
        .when(F.col("b.user_id").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "q_union_by_name",
    tags=("cdc", "setop", "schema-evolution"),
    oracle=f"""
        WITH legacy AS (
            SELECT user_id, event_type FROM events
            WHERE ts < TIMESTAMP '{_SPLIT_TS}'
        ),
        enriched AS (
            SELECT user_id, event_type, value FROM events
            WHERE ts >= TIMESTAMP '{_SPLIT_TS}'
        ),
        unified AS (
            SELECT user_id, event_type, NULL AS value FROM legacy
            UNION ALL
            SELECT user_id, event_type, value FROM enriched
        )
        SELECT event_type,
               COUNT(*) AS n_rows,
               COUNT(value) AS n_with_value,
               CAST(ROUND(SUM(CAST(COALESCE(value, 0) AS DECIMAL(28,10))), 4)
                    AS DOUBLE) AS sum_value
        FROM unified GROUP BY event_type
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: an old ingest batch lacks the ``value`` column
    a newer batch carries; ``unionByName(allowMissingColumns=True)``
    aligns by NAME and null-fills the gap — the positional-union
    mis-zip (silently pairing unrelated columns) cannot happen. The
    rollup then counts null-filled vs real values per type. At scale
    this is the pattern for reading months of parquet written under an
    evolving schema."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(_SPLIT_TS).cast("timestamp_ntz")
    legacy = ev.filter(F.col("ts") < split).select("user_id", "event_type")
    enriched = ev.filter(F.col("ts") >= split).select(
        "user_id", "event_type", "value"
    )
    unified = legacy.unionByName(enriched, allowMissingColumns=True)
    return unified.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count("value").alias("n_with_value"),
        F.round(
            F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(28,10)")),
            4,
        )
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "q_scd2_history",
    tags=("cdc", "window", "scale"),
    oracle="""
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
               value,
               ts AS effective_from,
               LEAD(ts) OVER w AS effective_to,
               (LEAD(ts) OVER w IS NULL) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLOWLY-CHANGING-DIMENSION type 2: turn a change log into a
    versioned history with [effective_from, effective_to) validity
    intervals and a current-row flag — the standard warehouse shape for
    'what did this row look like at time T' queries, and the batch twin
    of the ``q_latest_per_key`` compaction (which keeps only the last
    version; this keeps them all).

    Plan: one shuffle on the business key, then ``row_number`` +
    ``lead`` share a single window sort — Catalyst evaluates both in one
    Window operator, so the whole build is shuffle + per-partition sort,
    with no self-join (the naive SQL formulation joins the log to itself
    on version+1).  At 100 TB the key-partitioned window parallelizes
    per user; per-key history length, not table size, bounds a task."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    eff_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("long").alias("version"),
        "value",
        F.col("ts").alias("effective_from"),
        eff_to.alias("effective_to"),
        eff_to.isNull().alias("is_current"),
    )


_MV_SPLIT_TS = "2024-01-24 00:00:00"


@register(
    "q_incremental_mv",
    tags=("cdc", "agg", "scale"),
    oracle=f"""
        SELECT event_type,
               CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 4) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def q_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED-VIEW maintenance: the per-(type, minute)
    count/sum rollup computed as BASE PARTIALS (history, ts < {_MV_SPLIT_TS})
    merged with DELTA PARTIALS (the new ingest batch) — count and sum are
    re-aggregable, so merge = union the partial rows and re-sum, exactly
    the algebra a warehouse uses to refresh a stored MV from a nightly
    delta WITHOUT rescanning history.  The ORACLE is the full direct
    recompute over all events — the hash match proves
    incremental-refresh ≡ full-recompute.

    At 100 TB this is the difference between scanning one day and
    scanning three years per refresh: the stored MV is partition-pruned
    history partials, the delta aggregation touches only new files, and
    the merge shuffles rows proportional to |distinct keys in the
    delta|, not the fact table.  Decimal-exact sums so the merge order
    can't drift the result."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(_MV_SPLIT_TS).cast("timestamp_ntz")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("minute"),
        ).agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("sval"),
        )

    base = partial(ev.filter(F.col("ts") < split))
    delta = partial(ev.filter(F.col("ts") >= split))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "minute")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.round(F.sum("sval"), 4).cast("double").alias("sum_value"),
        )
    )


_DEDUP_TOLERANCE_SEC = 86_400  # fixture-scaled redelivery window (1 day)


@register(
    "q_event_dedup_tolerance",
    tags=("cdc", "window", "dedup"),
    oracle=f"""
        WITH gapped AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                       ))) AS BIGINT) AS gap_sec
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(*) FILTER (
                   WHERE gap_sec IS NULL
                      OR gap_sec > {_DEDUP_TOLERANCE_SEC}
               ) AS BIGINT) AS n_kept,
               CAST(COUNT(*) FILTER (
                   WHERE gap_sec <= {_DEDUP_TOLERANCE_SEC}
               ) AS BIGINT) AS n_dropped
        FROM gapped
        GROUP BY 1
    """,
)
def q_event_dedup_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TOLERANCE DEDUP audit: per (user, type), an event is a
    suspected redelivery if it lands within {_DEDUP_TOLERANCE_SEC} s of
    the PREVIOUS event of the same key (lag semantics — each row is
    judged against its immediate predecessor, the batch twin of
    ``dropDuplicatesWithinWatermark``'s per-key suppression window;
    unlike the greedy anchor formulation this is a pure window
    expression, and the divergence only matters for chains of
    sub-tolerance events, which redelivery storms are).

    Plan: one shuffle on (user_id, event_type) carries both the lag
    window and (after re-keying) the per-type rollup; the report is
    |types| rows. At 100 TB the suppression window is the standard
    at-least-once ingest cleaner — the same key partitioning the
    streaming twin's state store uses, so batch backfill and live
    stream agree by construction."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    prev = F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
    gapped = ev.select(
        "event_type", (sec - prev).alias("gap_sec")
    )
    kept = F.col("gap_sec").isNull() | (
        F.col("gap_sec") > _DEDUP_TOLERANCE_SEC
    )
    return gapped.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.count_if(kept).cast("bigint").alias("n_kept"),
        F.count_if(F.col("gap_sec") <= _DEDUP_TOLERANCE_SEC)
        .cast("bigint")
        .alias("n_dropped"),
    )


@register(
    "q_scd2_pit_join",
    tags=("cdc", "join", "asof", "scale"),
    oracle="""
        WITH dim AS (
            SELECT user_id, value,
                   ts AS eff_from,
                   LEAD(ts) OVER w AS eff_to,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
            FROM events
            WHERE event_type = 'purchase'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        facts AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click'
        )
        SELECT f.event_id, f.user_id, f.ts,
               COALESCE(d.value, -1.0) AS dim_value,
               COALESCE(d.version, 0) AS dim_version
        FROM facts f
        LEFT JOIN dim d
          ON d.user_id = f.user_id
         AND d.eff_from <= f.ts
         AND (d.eff_to IS NULL OR f.ts < d.eff_to)
    """,
)
def q_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME JOIN against an SCD2 dimension: enrich every click
    with the purchase-dimension version in effect at click time — the
    'what did the row look like when the fact happened' query every
    versioned warehouse dimension exists for.

    Plan — the union as-of mechanism, NOT a range join: dimension
    changes and facts union into one stream, a single user-keyed window
    (ts, dim-rows-first, event_id) computes last-non-null dim value and
    a running dim-row count (= version), and facts are filtered back
    out. One shuffle, no join node; the DuckDB oracle runs the naive
    validity-interval LEFT JOIN, so the hash match proves the window
    decomposition implements interval semantics exactly (including
    zero-width versions: two same-timestamp changes collapse to the
    later one). At 100 TB a range join explodes on hot users; this
    stays |events| rows through one exchange. Nullable-free contract:
    pre-dimension facts carry (-1.0, 0)."""
    ev = table(spark, sf_dir, "events")
    dim = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value", F.lit(1).alias("is_dim")
    )
    fact = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_dim"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_dim"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        dim.unionByName(fact)
        .withColumn(
            "dim_value",
            F.last(
                F.when(F.col("is_dim") == 1, F.col("value")), True
            ).over(w),
        )
        .withColumn("dim_version", F.sum("is_dim").over(w))
    )
    return merged.filter(F.col("is_dim") == 0).select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("dim_value"), F.lit(-1.0)).alias("dim_value"),
        F.col("dim_version").cast("bigint").alias("dim_version"),
    )


_DIFF_CUTOFF_A = "2024-01-03 00:00:00"  # snapshot A: first two days
_DIFF_CUTOFF_B = "2024-01-06 00:00:00"  # snapshot B: first five days


@register(
    "q_snapshot_diff",
    tags=("cdc", "diff", "audit", "scale"),
    oracle=f"""
        WITH a AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   MAX(ts) AS last_ts
            FROM events WHERE ts < TIMESTAMP '{_DIFF_CUTOFF_A}'
            GROUP BY 1, 2
        ),
        b AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   MAX(ts) AS last_ts
            FROM events WHERE ts < TIMESTAMP '{_DIFF_CUTOFF_B}'
            GROUP BY 1, 2
        ),
        joined AS (
            SELECT b.event_type,
                   CASE WHEN a.user_id IS NULL THEN 'added'
                        WHEN a.n <> b.n OR a.last_ts <> b.last_ts
                            THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   b.n - COALESCE(a.n, 0) AS delta_events
            FROM b LEFT JOIN a USING (user_id, event_type)
        )
        SELECT event_type, status,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(delta_events) AS BIGINT) AS delta_events
        FROM joined
        GROUP BY 1, 2
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF REPORT (the data-diff / reconciliation tool
    shape): compare per-(user, type) state between an early snapshot A
    and a later snapshot B and classify every key as ADDED (absent in
    A), CHANGED (state advanced), or UNCHANGED — with the event-count
    delta each class carries, per event type. The audit a pipeline runs
    after a backfill or incremental load: "how much of the keyspace did
    this load actually touch, and where". REMOVED is structurally
    impossible on an append-only log (stated contract; the
    ``q_merge_upsert`` family handles deleting sources).

    Plan: both snapshot states are the SAME keyed aggregation with
    different time predicates — each filter prunes at the scan (and on
    a date-partitioned 100 TB layout, prunes PARTITIONS) — and the diff
    is a co-partitioned left join on the aggregation key both sides
    already hashed by, so Catalyst reuses the partitioning. The report
    is |types|×3 rows; nothing after the two aggregates is
    data-sized."""
    ev = table(spark, sf_dir, "events")

    def snap(cutoff: str) -> DataFrame:
        return (
            ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp_ntz"))
            .groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
        )

    a = snap(_DIFF_CUTOFF_A).select(
        "user_id",
        "event_type",
        F.col("n").alias("a_n"),
        F.col("last_ts").alias("a_ts"),
    )
    b = snap(_DIFF_CUTOFF_B)
    status = (
        F.when(F.col("a_n").isNull(), F.lit("added"))
        .when(
            (F.col("a_n") != F.col("n"))
            | (F.col("a_ts") != F.col("last_ts")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        b.join(a, ["user_id", "event_type"], "left")
        .select(
            "event_type",
            status.alias("status"),
            (F.col("n") - F.coalesce(F.col("a_n"), F.lit(0))).alias(
                "delta_events"
            ),
        )
        .groupBy("event_type", "status")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("delta_events").cast("bigint").alias("delta_events"),
        )
    )
