"""Custom stateful streaming operator (SURVEY.md §2.9 ST5).

The reference's ``EmojiAnalytics`` class (reference analytical_server.py:
12-109) is a hand-rolled stateful aggregator: per-type counters and a
global total mutated under a lock by a consumer thread. Its Spark-native
replacement for the *reference* semantics is built-in windowed aggregation
(streaming/core.py) — but the engine also exposes the genuinely-custom
path, ``applyInPandasWithState``, for stateful logic the built-in
operators can't express (per-key running aggregates with arbitrary
transition functions, TTL eviction, emitted deltas).

``running_key_stats`` is that path, kept deliberately close to the
reference's state shape (count + sum per key) so the batch equivalence
test can pin it to ``groupBy().agg()``:

- state per key: ``(n_events, total_value)`` — Arrow-serialized tuples in
  the state store, partitioned by the grouping key; scale-out is the state
  store's problem (RocksDB provider at 100 TB), not the operator's.
- output mode ``update``: one row per key per micro-batch in which the key
  was touched (or timed out) — the delta stream the reference's dashboard
  polls for.
- optional event-time TTL: keys idle past the watermark by ``ttl`` are
  evicted (the reference's 3-minute deque eviction, analytical_server.py:
  49-52, generalized and watermark-driven instead of arrival-driven).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("evicted", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_key_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 minute",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) over an unbounded stream via
    ``applyInPandasWithState``; emits the updated totals for every key
    touched in a micro-batch. With ``ttl_ms`` set, a key whose last
    activity falls ``ttl_ms`` behind the watermark is evicted and emits a
    final row flagged ``evicted=true``."""

    def update(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "evicted": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if ttl_ms is not None:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "evicted": [False],
            }
        )

    timeout: Any = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    stream = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if ttl_ms is not None:
        # event-time timeouts require a watermark to measure idleness
        stream = stream.withWatermark(ts_col, watermark)
    return (
        stream.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def running_key_stats_tws(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 minute",
    ttl_ms: int | None = None,
) -> DataFrame:
    """The same per-key running (count, sum) on ``transformWithState`` —
    Spark 4's successor to applyInPandasWithState. The operator owns NAMED
    state cells through a typed handle (here one ValueState) instead of a
    single opaque tuple, composes multiple state shapes per key
    (value/list/map), and supports processing/event-time timers via
    ``timeMode``; state lives in the same per-key state store, so the
    scale story (RocksDB provider, key-partitioned) is unchanged. Kept
    semantically identical to :func:`running_key_stats` so one batch
    equivalence test pins both APIs.

    With ``ttl_ms`` set the processor mirrors
    :func:`running_key_stats`'s event-time TTL through TWS's own timer
    surface: each batch re-arms a per-key timer at watermark + ttl
    (deleting the previous one — TWS timers don't auto-replace the way
    ``setTimeoutTimestamp`` does), and ``handleExpiredTimer`` emits the
    final ``evicted=true`` row and clears the state cell.

    Environment notes: requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``google.protobuf`` package for its driver-side schema worker — the
    test suite skips (rather than fails) where protobuf isn't bundled."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._stats = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE"
            )
            if ttl_ms is not None:
                # the currently-armed expiry, so the next batch can
                # delete-then-re-arm instead of stacking stale timers
                self._armed = handle.getValueState("armed", "t BIGINT")

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            n, total = (
                self._stats.get() if self._stats.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._stats.update((n, total))
            if ttl_ms is not None:
                new_expiry = timerValues.getCurrentWatermarkInMs() + ttl_ms
                if self._armed.exists():
                    (old,) = self._armed.get()
                    if old != new_expiry:
                        self._handle.deleteTimer(old)
                self._handle.registerTimer(new_expiry)
                self._armed.update((new_expiry,))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "evicted": [False],
                }
            )

        def handleExpiredTimer(
            self, key: tuple, timerValues: Any, expiredTimerInfo: Any
        ) -> Iterator[pd.DataFrame]:
            if not self._stats.exists():
                return
            n, total = self._stats.get()
            self._stats.clear()
            if ttl_ms is not None and self._armed.exists():
                self._armed.clear()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "evicted": [True],
                }
            )

        def close(self) -> None:
            pass

    stream = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if ttl_ms is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return stream.groupBy(F.col(key_col)).transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=(
            "key STRING, n_events BIGINT, total_value DOUBLE, "
            "evicted BOOLEAN"
        ),
        outputMode="update",
        timeMode="none" if ttl_ms is None else "eventTime",
    )


ATTRIBUTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("channel", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_ATTR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("lt_us", T.LongType()),  # last-touch ts (microseconds)
        T.StructField("lt_type", T.StringType()),
    ]
)

ATTR_TOUCH_TYPES = ("click", "view")
ATTR_LOOKBACK_US = 3 * 24 * 3600 * 1_000_000  # 3 days, matches batch op


def attribution_stream(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``q_attribution_last_touch``
    (operators/joins.py): per-user LAST-TOUCH state — one (ts, type)
    pair per user, the same state the batch window carries implicitly —
    updated by click/view rows; every purchase emits its attributed
    channel immediately (``direct`` when no touch within the 3-day
    lookback). State is one tuple per user regardless of history
    length — the constant-size-state property that makes attribution
    streamable at all.

    Rows within a micro-batch are processed in (ts, event_id) order, so
    in-order replay reproduces the batch answer exactly (pinned by
    tests/test_streaming.py); under cross-batch disorder the stream
    attributes against the touches SEEN SO FAR — the same
    arrival-vs-event-time divergence class as ``new_users_per_minute``
    (SURVEY §2 ST4)."""

    def update(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover — no TTL configured
            state.remove()
            return
        lt_us, lt_type = state.get if state.exists else (None, None)
        out_user, out_event, out_channel, out_value = [], [], [], []
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["ts", "event_id"])
        for row in pdf.itertuples():
            ts_us = int(row.ts.value // 1_000)  # pandas ns -> us
            if row.event_type in ATTR_TOUCH_TYPES:
                lt_us, lt_type = ts_us, row.event_type
            elif row.event_type == "purchase":
                if lt_us is not None and lt_us >= ts_us - ATTR_LOOKBACK_US:
                    channel = lt_type
                else:
                    channel = "direct"
                out_user.append(key[0])
                out_event.append(row.event_id)
                out_channel.append(channel)
                out_value.append(row.value)
        if lt_us is not None:
            state.update((lt_us, lt_type))
        if out_user:
            yield pd.DataFrame(
                {
                    "user_id": out_user,
                    "event_id": out_event,
                    "channel": out_channel,
                    "value": out_value,
                }
            )

    stream = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.groupBy(F.col("user_id")).applyInPandasWithState(
        update,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=_ATTR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


GROWTH_FLOW_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day_num", T.LongType()),
        T.StructField("flow", T.StringType()),
    ]
)

_GROWTH_STATE_SCHEMA = T.StructType(
    [T.StructField("last_day", T.LongType())]
)

_US_PER_DAY = 86_400 * 1_000_000


def growth_flows_stream(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``q_growth_accounting``'s classification arm:
    per-user state is ONE integer — the last active day — and each
    first-touch-of-a-day emits its flow label (``new`` / ``retained`` /
    ``resurrected``) the moment it happens, instead of at the nightly
    batch. Constant per-user state, the same property that makes
    ``attribution_stream`` streamable.

    CHURN is deliberately absent from THIS form: a churn row is the
    OBSERVATION OF ABSENCE (no activity by end of day d+1), which
    streaming can only emit from a timer sweep. The churn-complete
    twins are :func:`growth_flows_churn_stream` (event-time timeouts,
    runs everywhere) and :func:`growth_flows_timer_stream` (Spark 4
    ``transformWithStateInPandas`` timers, gated by
    :func:`timer_backend_available`); this timer-free variant remains
    for pipelines that only need the real-time
    new/retained/resurrected counters with zero timeout bookkeeping.

    In-order replay reproduces the batch classification exactly (rows
    are sorted by (ts, event_id) within each micro-batch; pinned in
    tests); under cross-batch disorder a late older-day event is
    ignored (the day already advanced) — arrival-order semantics."""

    def update(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover — no TTL configured
            state.remove()
            return
        last_day = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["ts", "event_id"])
        out_day, out_flow = [], []
        for row in pdf.itertuples():
            d = int(row.ts.value // 1_000) // _US_PER_DAY
            if last_day is None:
                flow = "new"
            elif d == last_day:
                continue
            elif d == last_day + 1:
                flow = "retained"
            elif d > last_day:
                flow = "resurrected"
            else:  # older than the frontier — late arrival, day closed
                continue
            out_day.append(d)
            out_flow.append(flow)
            last_day = d
        if last_day is not None:
            state.update((last_day,))
        if out_day:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_day),
                    "day_num": out_day,
                    "flow": out_flow,
                }
            )

    stream = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.groupBy(F.col("user_id")).applyInPandasWithState(
        update,
        outputStructType=GROWTH_FLOW_SCHEMA,
        stateStructType=_GROWTH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DAY_MS = 86_400 * 1_000


def timer_backend_available() -> tuple[bool, str]:
    """Observable gate for the ``transformWithStateInPandas`` timer
    backend, mirroring the Kafka connector gate: the Spark 4 stateful
    processor speaks a protobuf wire protocol to its JVM state server
    (``pyspark/sql/streaming/proto/StateMessage_pb2.py``), so without
    ``google.protobuf`` the driver-side pre-init worker crashes before
    the first batch. Tests skip with THIS reason instead of an opaque
    ``STREAM_FAILED``; :func:`growth_flows_churn_stream` is the
    certified substitute that needs no protobuf."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False, (
            "google.protobuf not installed: transformWithStateInPandas "
            "state-server protocol unavailable in this environment "
            "(growth_flows_churn_stream is the certified substitute)"
        )
    return True, ""


def growth_flows_churn_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """CHURN-COMPLETE streaming growth accounting on the
    ``applyInPandasWithState`` backend via **event-time timeouts**
    (``GroupStateTimeout.EventTimeTimeout``) — closes the declared
    batch/stream asymmetry of :func:`growth_flows_stream` without the
    protobuf-backed ``transformWithStateInPandas`` path (see
    :func:`timer_backend_available`).

    Churn is the observation of ABSENCE: ``churned(d) ⇔ active(d−1) ∧
    ¬active(d)``. Three emission paths cover every way absence becomes
    observable, together reproducing the batch lead() derivation row
    for row (pinned in tests/test_streaming_timers.py):

    1. **Timeout sweep** — every activity re-arms the group's event-time
       timeout at start-of-day ``last+2`` (= end of the churn window
       ``last+1``). When the watermark passes it with no new activity,
       Spark invokes the group with ``hasTimedOut`` and we emit
       ``(user, last+1, "churned")``. Fresh activity overwrites the
       timeout, so a retained user never churns.
    2. **In-batch gap** — consecutive same-user days ``L → d`` with
       ``d > L+1`` arriving in one batch can never fire the timeout
       (data in the batch suppresses it), so the data path emits the
       missed ``(user, L+1, "churned")`` inline before the
       ``resurrected`` row.
    3. **Already-past window** — when the re-arm target is at or below
       the current watermark (history replayed after the watermark
       advanced), no future in-watermark event can contradict absence,
       so churn is emitted immediately instead of arming a dead timer.

    A ``churn_emitted`` flag in state makes paths 1 and 2 mutually
    exclusive across batches (a timeout in batch k, then a comeback in
    batch k+1, must not re-emit the same churn row). State survives a
    fired timeout — the comeback classifies ``resurrected``, matching
    the batch lag() rule.

    At 100 TB: per-user state is one (long, boolean) row plus one
    pending timeout — the same constant-state property as the
    classification-only stream; the timeout sweep is the state store's
    own range scan, not a per-batch full-keyspace pass."""
    state_schema = T.StructType(
        [
            T.StructField("last_day", T.LongType()),
            T.StructField("churn_emitted", T.BooleanType()),
        ]
    )

    def update(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            last_day, churn_emitted = state.get
            if not churn_emitted:
                # state persists (no remove()): a later comeback must
                # classify resurrected, exactly like the batch lag()
                state.update((last_day, True))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "day_num": [last_day + 1],
                        "flow": ["churned"],
                    }
                )
            return
        last_day, churn_emitted = (
            state.get if state.exists else (None, False)
        )
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out_day, out_flow = [], []
        for row in pdf.itertuples():
            d = int(row.ts.value // 1_000) // _US_PER_DAY
            if last_day is None:
                flow = "new"
            elif d == last_day:
                continue
            elif d == last_day + 1:
                flow = "retained"
            elif d > last_day:
                if not churn_emitted:  # path 2: timeout was suppressed
                    out_day.append(last_day + 1)
                    out_flow.append("churned")
                flow = "resurrected"
            else:  # older than the frontier — late arrival, day closed
                continue
            out_day.append(d)
            out_flow.append(flow)
            last_day = d
            churn_emitted = False
        if last_day is not None:
            # Spark clears a group's pending timeout on EVERY function
            # call — even one whose rows were all late no-ops — so the
            # watch must be re-armed here whenever the frontier's churn
            # is still unobserved, and only then.
            if churn_emitted:
                state.update((last_day, True))
            else:
                window_end_ms = (last_day + 2) * _DAY_MS
                if window_end_ms > state.getCurrentWatermarkMs():
                    state.update((last_day, False))
                    state.setTimeoutTimestamp(window_end_ms)
                else:  # path 3: window already swept past
                    state.update((last_day, True))
                    out_day.append(last_day + 1)
                    out_flow.append("churned")
        if out_day:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_day),
                    "day_num": out_day,
                    "flow": out_flow,
                }
            )

    stream = events.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark_delay)
    return stream.groupBy(F.col("user_id")).applyInPandasWithState(
        update,
        outputStructType=GROWTH_FLOW_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def growth_flows_timer_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """CHURN-COMPLETE streaming growth accounting via EVENT-TIME TIMERS
    (``transformWithStateInPandas``, Spark 4) — closes the one declared
    batch/stream asymmetry of :func:`growth_flows_stream`: churn is the
    observation of ABSENCE (no activity through end of day L+1), which
    only a timer sweep can emit.

    Per-user state is still one integer (last active day). Every
    activity (re)arms a single event-time timer at the start of day
    L+2 = the end of the user's churn-observation window; when the
    WATERMARK passes it without new activity the timer fires and emits
    ``(user, L+1, "churned")`` — exactly the batch identity
    ``churned(d) ⇔ active(d−1) ∧ ¬active(d)``. New activity first
    deletes the stale timer, so a retained user never churns, and a
    comeback after a fired churn classifies ``resurrected`` — matching
    the batch lag() classification row for row (pinned in
    tests/test_streaming_timers.py by replaying multi-day fixtures and
    diffing against the batch window).

    Needs the RocksDB state store provider (the transformWithState
    backend), ``google.protobuf`` for the state-server wire protocol
    (check :func:`timer_backend_available` — in protobuf-less
    environments :func:`growth_flows_churn_stream` is the certified
    substitute with identical output), and an event-time watermark on
    ``ts_col``; churn for day d emits once the watermark passes
    end-of-day d — the final fixture day's churn stays open until
    later data closes it, the correct streaming reading of "absence
    not yet observable".

    At 100 TB: state is 8 bytes + one timer per active user, RocksDB
    keeps it off-heap, and the timer sweep is the state store's own
    range scan — no per-batch full-keyspace pass."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _GrowthTimerProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._last = handle.getValueState("last_day", "last_day long")

        def handleInputRows(self, key, rows, timerValues):
            last_day = None
            if self._last.exists():
                last_day = self._last.get()[0]
            out_day, out_flow = [], []
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            for row in pdf.itertuples():
                d = int(row.ts.value // 1_000) // _US_PER_DAY
                if last_day is None:
                    flow = "new"
                elif d == last_day:
                    continue
                elif d == last_day + 1:
                    flow = "retained"
                elif d > last_day:
                    flow = "resurrected"
                else:
                    continue
                out_day.append(d)
                out_flow.append(flow)
                last_day = d
            if last_day is not None:
                self._last.update((last_day,))
                # re-arm the absence watch: one live timer per user at
                # start-of-day last+2 (== end of churn window last+1)
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                self._handle.registerTimer((last_day + 2) * _DAY_MS)
            if out_day:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(out_day),
                        "day_num": out_day,
                        "flow": out_flow,
                    }
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            churn_day = expiredTimerInfo.getExpiryTimeInMs() // _DAY_MS - 1
            last_day = self._last.get()[0] if self._last.exists() else None
            # fire only if the state still says "last active the day
            # before the churn day" — a stale timer the delete missed
            # (or a race with same-batch activity) must not double-emit
            if last_day is not None and last_day == churn_day - 1:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "day_num": [churn_day],
                        "flow": ["churned"],
                    }
                )

        def close(self) -> None:
            pass

    stream = events.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark_delay)
    return stream.groupBy(F.col("user_id")).transformWithStateInPandas(
        _GrowthTimerProcessor(),
        outputStructType=GROWTH_FLOW_SCHEMA,
        outputMode="update",
        timeMode="eventTime",
    )
