"""Structured Streaming re-bindings of the batch queries (SURVEY.md §7
Phase 4).

The reference's streaming job (reference spark_consumer.py:19-53) is:
Kafka → CAST value → json_tuple → to_timestamp → withWatermark(1 min) →
groupBy(type, window 1 min).count() → scaled_count → console/complete/2 s.

The engine keeps that lifecycle but fixes the semantic wart the reference
ships (SURVEY.md §2.9 ST1): complete output mode makes the declared
watermark inert — state grows without bound and every window ever seen is
re-emitted each trigger. Default here is **update** mode (append where the
sink needs finals); the watermark then actually evicts state.

Every function below is a pure logical transformation on an (unbounded)
DataFrame — the same code binds to a Kafka source in production, a file
source in tests, or a batch frame for equivalence checks; Catalyst's
incremental planner does the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import EMOJI_EVENT_WIRE_SCHEMA, ISO_MICROS_FMT

DEFAULT_WATERMARK = "1 minute"  # reference spark_consumer.py:38


def _event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TimestampType (TIMESTAMP_NTZ is rejected as an
    event-time column), so normalize — value-preserving under the engine's
    pinned UTC session."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def decode_wire_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka binary value → typed event columns.

    Engine standardizes on schema-checked ``from_json`` (the reference
    declares a schema then uses untyped ``json_tuple`` instead —
    spark_consumer.py:13-17 vs 28-30) and parses the ISO-8601-micros
    timestamp WITHOUT the LEGACY parser policy (spark_consumer.py:10,
    SURVEY.md §7 hard-part 3)."""
    parsed = raw.select(
        F.from_json(
            F.col(value_col).cast("string"), EMOJI_EVENT_WIRE_SCHEMA
        ).alias("e")
    ).select("e.*")
    # Accept the wire variants the reference actually produces: 6-digit
    # micros (client.py:111 isoformat()), millis+Z (emojitest.py:15,
    # browser toISOString) — try_to_timestamp because ANSI to_timestamp
    # throws on the first non-matching row.
    ts = F.coalesce(
        F.try_to_timestamp(F.col("timestamp"), F.lit(ISO_MICROS_FMT)),
        F.try_to_timestamp(
            F.col("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        ),
        F.try_to_timestamp(
            F.col("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        ),
        F.try_to_timestamp(F.col("timestamp")),
    )
    return parsed.withColumn("ts", ts)


def with_processing_time_fallback(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Opt-in twin of the Python service's silent parse-failure fallback
    (reference analytical_server.py:24-27 substitutes now()): explicit
    ``coalesce(event_time, current_timestamp())`` plus a flag column so
    downstream can quarantine processing-time rows instead of silently
    mixing time domains."""
    return df.withColumn(
        "ts_is_fallback", F.col(ts_col).isNull()
    ).withColumn(ts_col, F.coalesce(F.col(ts_col), F.current_timestamp()))


def windowed_counts_scaled(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_dur: str = "1 minute",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """The reference's core aggregation (spark_consumer.py:37-47):
    per-(key, tumbling window) count with the conditional scaling
    expression. Works unchanged on a streaming or batch frame."""
    events = _event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(ts_col), window_dur))
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "scaled_count",
            F.when(F.col("cnt") <= 1000, F.lit(1)).otherwise(
                F.col("cnt") / F.lit(1000.0)
            ),
        )
        .select(key_col, "window", "cnt", "scaled_count")
    )


def sliding_rolling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_dur: str = "3 minutes",
    slide: str = "1 minute",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """The Python analytics service's 3-minute rolling window (reference
    analytical_server.py:42-61) in its Spark-native form: a sliding
    event-time window. Unlike the deque version, late-but-within-watermark
    events land in their own minute, and state is evicted by the watermark
    (SURVEY.md §2.9 ST4)."""
    events = _event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(ts_col), window_dur, slide))
        .agg(F.count("*").alias("cnt"))
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (gap-based) — absent from the reference, stock in
    Spark; the streaming twin of the batch ``q_sessionize``."""
    events = _event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
    )


def ohlc_candles(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_dur: str = "1 minute",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-window OHLC candles (streaming twin of the batch
    ``q_minute_ohlc``): open/close via min_by/max_by keyed on
    (event time, event_id) — ordered aggregation with NO window sort, so
    the streaming state per candle is five scalars, not a buffer of
    events. Works unchanged on a streaming or batch frame."""
    events = _event_time(events, ts_col)
    ord_key = F.struct(F.col(ts_col), F.col("event_id"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur))
        .agg(
            F.min_by(value_col, ord_key).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, ord_key).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


def enrich_stream_static(
    events: DataFrame, dim: DataFrame, on: Column, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: the dim is re-read per micro-batch
    (no state); broadcast keeps the stream side shuffle-free — the
    streaming twin of the batch star join."""
    return events.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 minutes",
    max_skew: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with dual watermarks + a time-range
    condition — the Spark-native form of the dashboard's timestamp
    matching (reference analytical_server.py:451-459, SURVEY.md §2.5 X1).
    Both watermarks plus the range bound make join state evictable."""
    lw = _event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = _event_time(right, right_ts).withWatermark(right_ts, watermark)
    l_ts, r_ts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (r_ts >= l_ts - F.expr(f"INTERVAL {max_skew}"))
        & (r_ts <= l_ts + F.expr(f"INTERVAL {max_skew}"))
    )
    # outer variants emit the null-padded side once the watermark proves
    # no match can still arrive — state-bounded like the inner form
    return lw.alias("l").join(rw.alias("r"), cond, how)


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same event within
    the watermark horizon — the streaming twin of the batch dedup tier
    (operators/dedup.py) and the engine's answer to at-least-once sources
    (the reference's gateway can re-send on retry; its consumers would
    double-count). ``dropDuplicatesWithinWatermark`` keys the state store
    on the dedup keys and evicts each key once the watermark passes it,
    so state is bounded by (arrival rate × watermark), not the stream's
    lifetime."""
    keys = keys or ["event_id"]
    events = _event_time(events, ts_col)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def split_quarantine(
    decoded: DataFrame,
    required: tuple[str, ...] = ("user_id", "emoji_type"),
    ts_col: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """Valid/quarantine split after wire decode — the engine's form of the
    gateway's presence validation (reference api_server.py:55-56 returns
    400; the engine keeps the rejects as data). ``from_json`` yields null
    fields for corrupt or incomplete payloads and ``decode_wire_events``
    yields a null ``ts`` for unparseable timestamps, so the predicate is a
    null check — no second parse. Both halves share one scan; routing
    them to different sinks is `fanout_foreach_batch` with a filter per
    sink (or two queries on the source)."""
    ok = F.lit(True)
    for c in required:
        ok = ok & F.col(c).isNotNull()
    ok = ok & F.col(ts_col).isNotNull()
    return decoded.filter(ok), decoded.filter(~ok)


def with_wire_metrics(decoded: DataFrame, name: str = "wire_metrics") -> DataFrame:
    """Attach per-micro-batch observability to the decode stage: row
    count, decode failures (null required fields), and timestamp-parse
    failures, surfaced through ``StreamingQueryProgress.observedMetrics``
    — production monitoring without a second pass or a side query (the
    metrics ride the existing plan as accumulators)."""
    return decoded.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                F.col("user_id").isNull() | F.col("emoji_type").isNull(), 1
            ).otherwise(0)
        ).alias("n_decode_failures"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias(
            "n_ts_failures"
        ),
    )


def decayed_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_dur: str = "1 minute",
    watermark: str = DEFAULT_WATERMARK,
    tau_sec: float = 3600.0,
) -> DataFrame:
    """Streaming twin of the batch q_decayed_counts: per (key, tumbling
    window) event count plus the exponentially decayed mass anchored at
    the WINDOW CLOSE (each event contributes exp(-(window_end - ts)/τ)).
    The decay weight is a pure per-row expression — the anchor is the
    row's own window end, not a global max — so it rides the ordinary
    windowed aggregation with watermark-bounded state; downstream
    consumers combine window scores with a constant inter-window decay
    factor exp(-Δ/τ) to maintain a running recency score incrementally.
    Works unchanged on a batch frame (tests pin stream == batch)."""
    events = _event_time(events, ts_col)
    window_end = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 60) + 1) * 60
    )
    weight = F.exp(
        -(
            F.unix_timestamp(window_end) - F.unix_timestamp(F.col(ts_col))
        )
        / F.lit(tau_sec)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(ts_col), window_dur))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(weight), 6).alias("decayed"),
        )
    )


def windowed_distinct_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_dur: str = "1 minute",
    watermark: str = DEFAULT_WATERMARK,
    rsd: float = 0.01,
) -> DataFrame:
    """Streaming DISTINCT-user estimates per tumbling window — the
    streaming twin of the batch ``q_approx_unique_users``: exact
    count-distinct on an unbounded stream needs an unbounded per-window
    value set, so the state carried per window is an HLL++ sketch
    (``approx_count_distinct``) — fixed-size, mergeable across
    micro-batches, and register-max merging is ORDER-INSENSITIVE, so the
    streamed result is bit-equal to running the same aggregate in batch
    (pinned by tests/test_streaming.py).  Watermark bounds which windows
    stay open; closed windows free their sketch."""
    events = _event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur))
        .agg(
            F.approx_count_distinct(user_col, rsd).alias("approx_users"),
            F.count("*").alias("cnt"),
        )
    )


def bloom_probe_stream(
    docs_stream: DataFrame,
    seen_bits: DataFrame,
    name: str = "bloom_probe",
    sink_dir: str | None = None,
    checkpoint_dir: str | None = None,
):
    """STREAM-STATIC Bloom membership — incremental-crawl dedup as a
    stream job: incoming documents are shingled and probed against the
    STATIC reference-corpus bit set (built once by the batch side,
    ``operators/corpus.bloom_bits``), emitting per-document
    (n_shingles, n_seen, seen_ratio).

    Runs via ``foreachBatch``: per micro-batch the probe is the exact
    batch plan (explode → broadcast bit-set join → per-doc rollup), so
    stream == batch by construction (pinned in tests), there is no
    cross-batch streaming state at all — the membership decision is
    per-document — and the bit set stays a broadcast bounded by m rows
    no matter how much reference corpus it summarizes.

    Sinks: same contract as :func:`semantic_dedup_stream` — with
    ``sink_dir`` set (the production form) each batch's per-document
    rows append DELTA-ONLY via :func:`_append_delta_sink` (per-batch
    cost O(|batch|), flat over stream life, replay-idempotent;
    redelivery removed at read by :func:`stream_sink_results` on
    ``doc_id``); without it the rows accumulate in global temp view
    ``name`` — the DEMO form whose per-batch re-checkpoint cost grows
    with history (:func:`_accumulate_view`). Returns the started
    query."""
    from ..operators.corpus import bloom_probe, shingle_rows

    spark = docs_stream.sparkSession

    def _probe(batch: DataFrame, batch_id: int) -> None:
        out = bloom_probe(shingle_rows(batch), seen_bits)
        if sink_dir is not None:
            _append_delta_sink(out, sink_dir, batch_id)
        else:
            _accumulate_view(spark, out, name, "doc_id")

    w = docs_stream.writeStream.outputMode("append").foreachBatch(
        _probe
    )
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def _accumulate_view(spark, out: DataFrame, name: str, key: str) -> None:
    """DEMO-ONLY accumulate sink: union the batch's rows into the
    standing global-temp view (anti-joined on ``key`` so redelivery
    cannot duplicate) and re-checkpoint the WHOLE accumulated result.
    Per-batch work and checkpoint size are O(total accumulated rows) —
    O(total²) cumulative over a stream's life (round-9 verdict finding)
    — so this form is for in-process demos and tests only; production
    streams pass ``sink_dir`` and get the delta-only append sink."""
    existing = [
        t.name
        for t in spark.catalog.listTables("global_temp")
        if t.name == name
    ]
    if existing:
        prev = spark.table(f"global_temp.{name}")
        out = prev.unionByName(
            out.join(prev.select(key).distinct(), key, "left_anti")
        )
    from ..caches import swap_view_checkpoint

    ck = out.localCheckpoint(eager=True)
    ck.createOrReplaceGlobalTempView(name)
    swap_view_checkpoint(ck, name)


def _append_delta_sink(out: DataFrame, sink_dir: str, batch_id: int) -> None:
    """DELTA-ONLY append sink (round-10 item 1): write ONLY this
    batch's result rows, into the batch's OWN hive-style partition
    directory (``batch=<id>``) with per-partition overwrite — so a
    replayed batch id (foreachBatch's at-least-once restart semantics
    under a checkpointed query) rewrites its own partition instead of
    duplicating it. Per-batch cost is O(|batch result|): no read, no
    union, no re-checkpoint of history — the accumulate-view form's
    O(total) per-batch work (and O(total²) cumulative) is gone, which
    is the property a continuous serving stream needs. Source-level
    redelivery (the same vector arriving again in a LATER batch)
    produces an identical row under a different batch id; the
    idempotency key travels with the row, and
    :func:`stream_sink_results` removes such replays at read time —
    the reader pays that dedup, never the hot append path."""
    out.write.mode("overwrite").parquet(
        f"{sink_dir.rstrip('/')}/batch={batch_id}"
    )


def stream_sink_results(
    spark, sink_dir: str, keys: tuple[str, ...]
) -> DataFrame:
    """Read a delta-append stream sink as the deduplicated result table:
    one row per ``keys`` tuple. Rows for a redelivered input are
    IDENTICAL by construction (frozen index, deterministic rank), so
    dropping duplicates on the idempotency key is exact, not a choice
    among variants. This is the consumer-side half of the sink's
    idempotency contract; cost is one column-pruned scan + one
    aggregate over the sink — paid per READ, not per ingest batch."""
    return (
        spark.read.parquet(sink_dir)
        .drop("batch")
        .dropDuplicates(list(keys))
    )


def semantic_dedup_batch_fn(
    spark,
    sf_dir: str,
    name: str = "semantic_dedup",
    sink_dir: str | None = None,
):
    """The foreachBatch body of :func:`semantic_dedup_stream`, exposed
    so soak harnesses can wrap it with timing. Routes a micro-batch
    through the frozen router and emits its near-dup rows to the
    configured sink (delta-append when ``sink_dir`` is set, else the
    demo accumulate view)."""
    from ..functions.vectors import as_double
    from ..operators.similarity import (
        frozen_router_parts,
        ingest_dedup_rows,
        _route_assign,
    )

    base_a, coarse_arr, groups, pcm, wmax = frozen_router_parts(
        spark, sf_dir
    )

    def _dedup(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        bv = batch.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        )
        routed = _route_assign(bv, coarse_arr, groups, pcm, wmax)
        out = ingest_dedup_rows(base_a, routed)
        if sink_dir is not None:
            _append_delta_sink(out, sink_dir, batch_id)
        else:
            _accumulate_view(spark, out, name, "doc_id")

    return _dedup


def semantic_dedup_stream(
    vec_stream: DataFrame,
    sf_dir: str,
    name: str = "semantic_dedup",
    sink_dir: str | None = None,
    checkpoint_dir: str | None = None,
):
    """STREAMING SEMANTIC DEDUP-AT-INGEST — the streaming twin of the
    batch ``q_dedup_ingest_incremental`` (round-9 item: the reference's
    whole posture is streaming; the daily batch-vs-corpus dedup should
    run continuously, not nightly). Incoming (vec_id, embedding) rows
    are routed per micro-batch through the FROZEN base-trained
    two-level router (coarse fold → fine fold → hash-plane shard — all
    broadcast state, no retraining, no shuffle), compared ONLY against
    standing-corpus members of their own (cent_id, shard) bucket, and
    every near-dup (cosine ≥ threshold) is emitted as
    (doc_id, cent_id, matched_doc_id, max_sim) — the continuously-
    maintained reject/merge list.

    Sinks (round-10 item 1): with ``sink_dir`` set — the PRODUCTION
    form — each batch's rows are appended DELTA-ONLY to a parquet
    directory partitioned by batch id (:func:`_append_delta_sink`):
    per-batch cost is O(|batch|), flat over the stream's life (pinned
    by scripts/stream_sink_soak.py), batch replay is idempotent via
    per-partition overwrite, and source-level redelivery is removed at
    read time by :func:`stream_sink_results` on ``doc_id`` (the key
    travels with the row). Without ``sink_dir`` the rows accumulate in
    global temp view ``name`` — a DEMO form whose per-batch
    re-checkpoint cost grows with history (see
    :func:`_accumulate_view`); don't run it on an unbounded stream.

    stream == batch by construction: each micro-batch runs EXACTLY the
    batch operator's pair stage (``operators/similarity
    .ingest_dedup_rows``) against the same session-persisted base
    assignment, and a vector's verdict depends only on its own content
    + the frozen index — no cross-batch state, so a re-delivered
    vector reproduces its identical row in either sink form.

    Cost shape at 100 TB: per batch, |batch| routing folds + per-bucket
    (batch × base-occupancy) comparisons — linear in the batch,
    corpus-size-independent at constant occupancy; the broadcasted
    router is K+√K rows and the base side is read from its persisted
    posting-list form, never recomputed. Returns the started query."""
    spark = vec_stream.sparkSession
    w = vec_stream.writeStream.outputMode("append").foreachBatch(
        semantic_dedup_batch_fn(spark, sf_dir, name, sink_dir)
    )
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def ann_serve_batch_fn(
    spark,
    sf_dir: str,
    name: str = "ann_serve",
    sink_dir: str | None = None,
):
    """The foreachBatch body of :func:`ann_serve_stream`, exposed for
    soak harnesses; answers each micro-batch's vectors with their
    top-k standing-corpus neighbors and emits to the configured sink."""
    from ..functions.vectors import as_double
    from ..operators.similarity import (
        ann_serve_rows,
        frozen_router_parts,
        _route_assign,
    )

    base_a, coarse_arr, groups, pcm, wmax = frozen_router_parts(
        spark, sf_dir
    )

    def _serve(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        bv = batch.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        )
        routed = _route_assign(bv, coarse_arr, groups, pcm, wmax)
        out = ann_serve_rows(base_a, routed)
        if sink_dir is not None:
            _append_delta_sink(out, sink_dir, batch_id)
        else:
            _accumulate_view(spark, out, name, "q_id")

    return _serve


def ann_serve_stream(
    vec_stream: DataFrame,
    sf_dir: str,
    name: str = "ann_serve",
    sink_dir: str | None = None,
    checkpoint_dir: str | None = None,
):
    """STREAMING ANN SERVING — the streaming twin of the batch
    ``q_ann_serve_incremental`` (search-at-ingest): arriving
    (vec_id, embedding) rows are routed per micro-batch through the
    FROZEN base-trained two-level router (all broadcast state, no
    retraining) and answered with their top-{ANN_BATCH_K}
    standing-corpus neighbors from their own (cent_id, shard) posting
    list, emitted as (q_id, rnk, vec_id, sim) — the continuously-served
    answer table. k is fixed at the batch operator's ANN_BATCH_K so
    stream == batch holds by construction (the former ``k`` override
    silently broke that parity; round-9 ADVICE — dropped).

    Sinks (round-10 item 1): same contract as
    :func:`semantic_dedup_stream` — ``sink_dir`` set is the PRODUCTION
    delta-only append form (per-batch cost O(|batch|·k), flat over
    stream life, batch-replay idempotent by per-partition overwrite,
    source redelivery removed at read by :func:`stream_sink_results`
    on (q_id, rnk)); unset is the DEMO accumulate view whose per-batch
    cost grows with history.

    stream == batch by construction: each micro-batch runs EXACTLY the
    batch operator's rank stage (``operators/similarity
    .ann_serve_rows``) against the same session-persisted base
    assignment — a query's answer depends only on its own content + the
    frozen index, no cross-batch state, so a replayed vector
    reproduces its identical rows.

    Cost shape at 100 TB: per batch, |batch| routing folds + per-bucket
    (batch × occupancy) scoring — linear in the arrival batch,
    corpus-size-independent at constant occupancy; the broadcast router
    is K+√K rows and the base side reads from its persisted
    posting-list form. Returns the started query."""
    spark = vec_stream.sparkSession
    w = vec_stream.writeStream.outputMode("append").foreachBatch(
        ann_serve_batch_fn(spark, sf_dir, name, sink_dir)
    )
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def ivf_index_append_batch_fn(spark, sf_dir: str, sink_dir: str):
    """The foreachBatch body of :func:`ivf_index_append_stream`: route
    the micro-batch through the FROZEN base-trained router and append
    its (vec_id, cent_id, shard, sim) posting-list rows — EXACTLY the
    batch rule of ``q_ivf_index_append`` (frozen centroids, frozen
    per-cell split widths, cosine to the chosen centroid) — to the
    delta sink. ``sim`` is stored RAW (riders round): the drift audit
    aggregates it decimal-exact."""
    from ..functions.vectors import as_double, cosine
    from ..operators.similarity import _append_index, _route_assign

    _, _, wmax, cents, coarse_arr, groups, pcm = _append_index(
        spark, sf_dir
    )

    def _append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        bv = batch.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        )
        routed = _route_assign(bv, coarse_arr, groups, pcm, wmax)
        out = routed.join(F.broadcast(cents), "cent_id").select(
            "vec_id",
            "cent_id",
            "shard",
            cosine(F.col("v"), F.col("cv")).alias("sim"),
        )
        _append_delta_sink(out, sink_dir, batch_id)

    return _append


def ivf_index_append_stream(
    vec_stream: DataFrame,
    sf_dir: str,
    sink_dir: str,
    checkpoint_dir: str | None = None,
):
    """STREAMING INDEX APPEND — the GROW leg that closes the
    append-path lifecycle (round-10 item 5): arriving vectors are
    routed per micro-batch through the FROZEN base-trained two-level
    router (all broadcast state — K+√K router rows plus the ≤K-row
    per-cell width map; no retraining, no re-split) and their
    (cent_id, shard) posting-list assignments are appended DELTA-ONLY
    to ``sink_dir`` — so route (this), audit (drift), filter
    (dedup-at-ingest), and answer (serve) ALL run continuously, the
    reference's everything-streaming posture applied to the index
    lifecycle itself.

    stream == batch by construction: each batch applies EXACTLY
    ``q_ivf_index_append``'s rule (a vector's assignment depends only
    on its own content + the frozen index), pinned by parity tests.
    Idempotency is the delta-sink contract: batch replay overwrites its
    own partition, source redelivery reproduces identical rows removed
    at read by :func:`stream_sink_results` on ``vec_id``. The grown
    index is the base posting lists UNION the sink read — and the
    drift audit runs off it unchanged
    (``operators/similarity.drift_audit_rows``), so the "when to
    rebuild" alarm works on a continuously-grown index too.

    Cost shape at 100 TB: per batch, |batch| routing folds against
    broadcast state and an O(|batch|) append — linear in the arrival
    batch, independent of both corpus size and stream lifetime (the
    accumulate-view trap does not apply: nothing re-reads history on
    the hot path). Returns the started query."""
    spark = vec_stream.sparkSession
    w = vec_stream.writeStream.outputMode("append").foreachBatch(
        ivf_index_append_batch_fn(spark, sf_dir, sink_dir)
    )
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def funnel_stream(
    events: DataFrame,
    step_types: tuple[str, str, str] = ("view", "click", "purchase"),
    window_sec: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAMING multi-step funnel — the real-time twin of the batch
    ``q_funnel_multistep``: one event stream filtered into the three
    funnel legs and CHAINED through two stream-stream joins, each with
    a time-range bound (next step strictly after the previous, within
    ``window_sec``).  Emits one append-mode row per completed
    view→click→purchase chain with all three timestamps.

    State story: every leg carries its own watermark and every join has
    a range bound, so Spark can evict join state once the watermark
    passes vts + 2·window — state is bounded by (arrival rate ×
    funnel horizon), independent of stream lifetime.  Chained
    stream-stream inner joins are append-mode-only by construction,
    which is exactly the semantics a funnel-completion feed wants
    (each completion is a fact, never restated)."""
    t1, t2, t3 = step_types
    ev = _event_time(events, "ts")
    v = (
        ev.filter(F.col("event_type") == t1)
        .select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("vts")
        )
        .withWatermark("vts", watermark)
    )
    c = (
        ev.filter(F.col("event_type") == t2)
        .select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
        )
        .withWatermark("cts", watermark)
    )
    p = (
        ev.filter(F.col("event_type") == t3)
        .select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
        )
        .withWatermark("pts", watermark)
    )
    within = lambda later, earlier: (
        (later > earlier)
        & (later <= earlier + F.expr(f"INTERVAL {window_sec} SECONDS"))
    )
    vc = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & within(F.col("cts"), F.col("vts")),
    )
    # The joined stream carries TWO watermarked event-time columns (vts,
    # cts); a further stream-stream join refuses that. Strip the
    # event-time tag from vts with an exact unix_micros round trip —
    # cts (the later step) remains the single event-time column driving
    # the second join's state eviction.
    vc = vc.select(
        "v_user",
        F.timestamp_micros(F.unix_micros(F.col("vts"))).alias("vts"),
        "cts",
    )
    vcp = vc.join(
        p,
        (F.col("p_user") == F.col("v_user"))
        & within(F.col("pts"), F.col("cts")),
    )
    return vcp.select(
        F.col("v_user").alias("user_id"), "vts", "cts", "pts"
    )


def new_users_per_minute(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "365 days",
) -> DataFrame:
    """Streaming twin of ``q_running_distinct_users``'s first stage: the
    per-minute count of FIRST-SEEN users. ``dropDuplicates`` on the user
    key keeps one state row per user forever (the cumulative-distinct
    question is inherently unbounded — at 100 TB keyspaces the HLL
    variant ``windowed_distinct_users`` is the bounded-state trade), so
    each user survives exactly once, at first arrival; a windowed count
    then yields new-users-per-minute, and the consumer accumulates the
    running total (a monotone sum over append-mode rows — the
    foreachBatch sink adds each closed window once).

    CAVEAT vs batch: streaming first-seen is ARRIVAL-order first; the
    batch form is EVENT-TIME min. They agree whenever each user's events
    arrive in event-time order (true for the replay fixtures, pinned in
    tests); under disorder the streaming answer attributes the user to
    the minute of the first-arriving event — documented divergence, same
    class as SURVEY §2 ST4."""
    events = _event_time(events, ts_col)
    firsts = events.dropDuplicates([user_col])
    return (
        firsts.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 minute"))
        .agg(F.count("*").alias("new_users"))
    )


DQ_STREAM_TYPES = ("click", "view", "purchase", "signup", "error")


def dq_monitor_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """Streaming twin of ``q_dq_audit``'s per-row checks: a windowed
    CONSTRAINT MONITOR emitting, per tumbling window, the row count and
    the violation counts for the non-null and value-domain rules — the
    continuous form of the batch audit (uniqueness and referential
    integrity need cross-batch state and stay batch-side / in the
    ``dedup_stream`` and enrichment paths).

    Same conditional-sum arithmetic as the batch audit, so a replay of
    the same rows produces identical counts (pinned by
    tests/test_streaming.py). Wire this to an alerting sink via
    ``fanout_foreach_batch`` with a ``violations > 0`` filter."""
    events = _event_time(events, ts_col)
    bad_type = ~F.col("event_type").isin(*DQ_STREAM_TYPES)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias(
                "null_user_violations"
            ),
            F.sum(F.when(bad_type, 1).otherwise(0)).alias(
                "domain_violations"
            ),
        )
    )


def ts_similarity_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    query_user: int = 0,
    name: str = "ts_similarity",
):
    """STREAMING twin of ``q_ts_similarity_search``: maintain the
    per-(user, hour) activity cells incrementally across micro-batches
    (the incremental-MV merge — counts are re-aggregable partials) and
    re-score Pearson correlation against the query user's series from
    the MERGED cells each batch, publishing to the global temp view
    ``name``.

    Why foreachBatch and not chained streaming aggs: correlation needs
    Σ(cnt_h²), a second-level aggregate over CLOSED hourly counts —
    maintaining it as two chained stateful operators couples the score
    to watermark closure, whereas merging count partials keeps every
    moment exact at all times and bit-equal to the batch operator on
    the same prefix (pinned in tests). State = the cells table, bounded
    by |users| × |grid hours| — the same cardinality the batch plan
    shuffles, NOT the raw stream."""
    spark = events.sparkSession
    events = _event_time(events, ts_col)
    cells_view = f"{name}_cells"

    def _step(batch: DataFrame, batch_id: int) -> None:
        delta = batch.groupBy(
            F.col(user_col).alias("user_id"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        ).agg(F.count("*").alias("cnt"))
        # batch 0 == a (re)started query: drop any cells view left by a
        # previous run under the same name — merging stale counts into
        # a fresh run would silently double-count every cell and
        # corrupt every downstream correlation
        if batch_id == 0:
            spark.catalog.dropGlobalTempView(cells_view)
        existing = [
            t.name
            for t in spark.catalog.listTables("global_temp")
            if t.name == cells_view
        ]
        if existing:
            delta = (
                spark.table(f"global_temp.{cells_view}")
                .unionByName(delta)
                .groupBy("user_id", "hour")
                .agg(F.sum("cnt").alias("cnt"))
            )
        from ..caches import swap_view_checkpoint

        cells = delta.localCheckpoint(eager=True)
        cells.createOrReplaceGlobalTempView(cells_view)
        swap_view_checkpoint(cells, cells_view)

        grid = cells.select(F.count_distinct("hour").alias("n"))
        stats = cells.groupBy("user_id").agg(
            F.sum("cnt").alias("sx"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sx2"),
        )
        q = cells.filter(F.col("user_id") == query_user).select(
            "hour", F.col("cnt").alias("qcnt")
        )
        qstats = q.agg(
            F.sum("qcnt").alias("qsx"),
            F.sum(F.col("qcnt") * F.col("qcnt")).alias("qsx2"),
        )
        xy = (
            cells.join(F.broadcast(q), "hour")
            .groupBy("user_id")
            .agg(F.sum(F.col("cnt") * F.col("qcnt")).alias("sxy"))
        )
        n = F.col("n")
        var_x = n * F.col("sx2") - F.col("sx") * F.col("sx")
        var_q = n * F.col("qsx2") - F.col("qsx") * F.col("qsx")
        # per-factor double cast (not product-then-cast): each variance
        # is ~n·Σx² in BIGINT, so the product overflows long before the
        # moments do — mirrors the batch operator and its oracle
        corr = (
            n * F.coalesce(F.col("sxy"), F.lit(0))
            - F.col("sx") * F.col("qsx")
        ) / F.sqrt(var_x.cast("double") * var_q.cast("double"))
        out = (
            stats.join(xy, "user_id", "left")
            .crossJoin(F.broadcast(grid))
            .crossJoin(F.broadcast(qstats))
            .filter(
                (F.col("user_id") != query_user)
                & (var_x > 0)
                & (var_q > 0)
            )
            .select("user_id", F.round(corr, 6).alias("corr"))
        )
        ck_out = out.localCheckpoint(eager=True)
        ck_out.createOrReplaceGlobalTempView(name)
        swap_view_checkpoint(ck_out, name)

    return (
        events.writeStream.outputMode("append")
        .foreachBatch(_step)
        .start()
    )


_BITMAP_STREAM_WORD_BITS = 63


def bitmap_distinct_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    name: str = "bitmap_distinct",
):
    """STREAMING twin of ``q_bitmap_distinct``: maintain the per-type
    bitmap WORD table incrementally across micro-batches and publish
    exact per-type distinct-user counts after every batch. The word OR
    is associative and idempotent, so the merge is redelivery-tolerant
    (re-OR-ing a user's bit is a no-op) — the property that makes the
    bitmap MV streaming-refreshable where a count-distinct partial is
    not. State = the word table, bounded by
    |types| × ceil(|users|/{_BITMAP_STREAM_WORD_BITS}) BIGINTs — the
    same cardinality the batch plan shuffles, never the raw stream.

    foreachBatch (not a chained stateful agg) because the published
    readout is a second-level aggregate (popcount sum) over the merged
    words; merging word partials keeps every count exact at all times
    and bit-equal to the batch operator on the same prefix (pinned in
    tests). Batch 0 drops any same-name leftover view — the
    restart-reset convention shared with ``ts_similarity_stream``."""
    spark = events.sparkSession
    events = _event_time(events, ts_col)
    words_view = f"{name}_words"
    bits = _BITMAP_STREAM_WORD_BITS

    def _step(batch: DataFrame, batch_id: int) -> None:
        delta = (
            batch.select(
                F.col(type_col).alias("event_type"),
                F.expr(
                    f"({user_col} - pmod({user_col}, {bits})) div {bits}"
                ).alias("word_id"),
                F.expr(
                    f"shiftleft(1L, CAST(pmod({user_col}, {bits}) AS INT))"
                ).alias("bit"),
            )
            .groupBy("event_type", "word_id")
            .agg(F.bit_or("bit").alias("word"))
        )
        if batch_id == 0:
            spark.catalog.dropGlobalTempView(words_view)
        existing = [
            t.name
            for t in spark.catalog.listTables("global_temp")
            if t.name == words_view
        ]
        if existing:
            delta = (
                spark.table(f"global_temp.{words_view}")
                .unionByName(delta)
                .groupBy("event_type", "word_id")
                .agg(F.bit_or("word").alias("word"))
            )
        from ..caches import swap_view_checkpoint

        words = delta.localCheckpoint(eager=True)
        words.createOrReplaceGlobalTempView(words_view)
        swap_view_checkpoint(words, words_view)
        out = words.groupBy("event_type").agg(
            F.sum(F.bit_count("word"))
            .cast("bigint")
            .alias("distinct_users"),
            F.count("*").cast("bigint").alias("bitmap_words"),
        )
        ck_out = out.localCheckpoint(eager=True)
        ck_out.createOrReplaceGlobalTempView(name)
        swap_view_checkpoint(ck_out, name)

    return (
        events.writeStream.outputMode("append")
        .foreachBatch(_step)
        .start()
    )
