"""Central registry of every session-lifetime cache the engine creates.

The engine memoizes a handful of expensive intermediates per
(session, fixture) — shingle hash sets, BPE trainings, IVF/k-means
assignments, RHP sketches, growth activity cells — plus short-lived
per-query persists inside iterative operators. At 100 TB a leaked
persist is executor memory permanently gone, so every cache MUST have
an observable release path; this module is that single point of truth
(round-6 audit item).

Inventory:

- **session memos** (live until cleared; built lazily on first use,
  shared by every query on the same fixture): each owning module keeps
  its own dict + ``clear_*`` function, all enumerated in
  ``SESSION_CACHE_CLEARERS`` below.
- **per-query transients** (an iterative operator persists an edge
  list for its own loop): registered via :func:`track_transient` and
  released by :func:`release_transients` — or by the operator itself
  when lineage allows (``q_hierarchy_data_edges`` unpersists inline
  after its eager checkpoints).
- **disk-layout artifacts** (NOT RDD storage): the bucketed catalog
  tables (`operators/joins.py` ``_bucketed_pair``) and any
  ``write_partitioned`` output live in the warehouse directory, cost
  no executor memory, and are dropped via ``DROP TABLE`` — out of
  scope for the RDD-leak gate.

``bench.py`` pre-builds exactly ONE of these before timing: the dedup
shingle hash sets (reported as the ``cache_build`` line item). All
other memos build lazily inside the first query that needs them, so
their build cost is visible in that query's timing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TRANSIENTS: list[DataFrame] = []
_CHECKPOINT_RDDS: list[tuple] = []


def track_transient(df: DataFrame) -> DataFrame:
    """Record a per-query persisted frame so the session can release it
    later (iterative operators persist loop state that must outlive the
    function but not the session)."""
    _TRANSIENTS.append(df)
    return df


def track_checkpoint(df: DataFrame) -> DataFrame:
    """Record a ``localCheckpoint``-ed frame's underlying RDD id.

    Checkpoint RDDs are persisted storage the ContextCleaner releases
    only after JVM GC of the RDD handle — in practice they linger for
    the session. Iterative loops create one per round; tracking the id
    (via the LogicalRDD plan node) lets :func:`release_transients` drop
    the blocks deterministically. NOTE: after release the checkpointed
    frame is unreadable (checkpoints cannot recompute), so release is a
    session-level operation, never mid-query."""
    try:
        plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        _CHECKPOINT_RDDS.append(
            (df.sparkSession.sparkContext, plan.rdd().id())
        )
    except Exception:
        pass
    return df


_VIEW_CHECKPOINTS: dict[tuple, tuple] = {}


def swap_view_checkpoint(df: DataFrame, name: str) -> None:
    """Bound the streaming-view checkpoint chain to ONE live RDD.

    The foreachBatch sinks materialize each micro-batch's accumulated
    view with an eager ``localCheckpoint`` and re-register the global
    temp view — without release, every batch leaks its predecessor's
    checkpoint blocks (unbounded executor-storage growth over a
    long-running stream; round-6 audit finding). Call AFTER the new
    checkpoint is materialized and the view re-registered: the new
    frame is self-contained, so dropping the replaced RDD is safe.
    (External readers racing the swap window would re-query the view on
    the next trigger; in-process consumers read between batches.)"""
    sc = df.sparkSession.sparkContext
    key = (sc.applicationId, name)
    try:
        rid = df._jdf.queryExecution().analyzed().rdd().id()  # noqa: SLF001
    except Exception:
        rid = None
    prev = _VIEW_CHECKPOINTS.pop(key, None)
    if rid is not None:
        _VIEW_CHECKPOINTS[key] = (sc, rid)
    if prev is not None:
        psc, prid = prev
        try:
            psc._jsc.sc().unpersistRDD(prid, False)  # noqa: SLF001
        except Exception:
            pass


def release_transients() -> None:
    while _TRANSIENTS:
        try:
            _TRANSIENTS.pop().unpersist()
        except Exception:
            pass
    while _CHECKPOINT_RDDS:
        sc, rid = _CHECKPOINT_RDDS.pop()
        try:
            sc._jsc.sc().unpersistRDD(rid, False)  # noqa: SLF001
        except Exception:
            pass
    for sc, rid in list(_VIEW_CHECKPOINTS.values()):
        try:
            sc._jsc.sc().unpersistRDD(rid, False)  # noqa: SLF001
        except Exception:
            pass
    _VIEW_CHECKPOINTS.clear()


def _clearers():
    from .catalog import clear_table_memo
    from .operators.analytics import clear_words_cache
    from .operators.dedup import clear_hashset_cache, clear_pair_cache
    from .operators.growth import clear_cells_cache
    from .operators.similarity import clear_ivf_cache, clear_rhp_cache
    from .operators.text import clear_bpe_cache

    return {
        "audience_bitmap_words": clear_words_cache,
        # plan-handle memo only (no persisted blocks): reader DataFrames
        # keyed per session — cleared here so no stale JVM refs outlive
        # a clear-all (round-10 optimization)
        "table_reader_plans": clear_table_memo,
        "dedup_shingle_hashsets": clear_hashset_cache,
        # owns BOTH its handles and its checkpoint blocks (dedup-local
        # RDD-id list) — no ordering dependency on iterative_transients
        "dedup_tier_pair_lists": clear_pair_cache,
        "bpe_trainings": clear_bpe_cache,
        "growth_activity_cells": clear_cells_cache,
        "ivf_assignments": clear_ivf_cache,
        "rhp_sketches": clear_rhp_cache,
        "iterative_transients": release_transients,
    }


def SESSION_CACHE_CLEARERS() -> dict:
    """name -> zero-arg release function, one per session cache family."""
    return _clearers()


def clear_all_session_caches() -> None:
    """Release every session-lifetime persist the engine holds. After
    this, a session that has run ANY subset of the registry must hold
    zero engine-owned persisted RDDs (pinned by
    tests/test_cache_hygiene.py)."""
    for fn in _clearers().values():
        fn()


def persisted_rdd_count(spark: SparkSession) -> int:
    """Number of persisted RDDs the JVM currently tracks (JVM-global in
    local mode — callers should diff against a baseline, not expect 0
    in a shared session)."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()  # noqa: SLF001
