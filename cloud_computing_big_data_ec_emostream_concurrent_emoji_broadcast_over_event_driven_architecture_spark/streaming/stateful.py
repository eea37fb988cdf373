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

    CHURN is deliberately absent from the streaming form: a churn row
    is the OBSERVATION OF ABSENCE (no activity by end of day d+1),
    which streaming can only emit from a timer sweep — the batch
    operator derives it from the same lead() the classification uses,
    so the nightly batch remains the system of record for churn while
    this stream feeds the real-time new/retained/resurrected counters.
    Stated divergence, same class as SURVEY §2 ST4.

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
