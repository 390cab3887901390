"""Session-scoped shared-lineage cache (VERDICT r6 #1).

Registry queries are self-contained ``(spark, sf_dir) -> DataFrame``
programs, so compositions rebuilt their upstream layers inline per call:
every gold view re-derived bronze -> silver, and the curation rollups
re-ran the whole ``corpus_curate`` funnel (14.4s cold at sf0.1). On a
real deployment those layers are materialized tables — the reference
writes silver/gold to catalog tables and every consumer reads them
(run_sales_analytics.py child-job chain; create_refined_schemas.py) —
so sharing them across queries in one session is the faithful local
analogue, exactly like the pipeline runner's warehouse and the IVF cell
store.

Two sharing modes, chosen by how a frame is built:

- ``persist`` (lazy builders — the silver layer, the derived partsupp
  bridge): the frame is ``persist()``-marked once per (session, key) and
  the SAME DataFrame object is returned to every caller. Nothing runs
  until a consumer executes; Spark's CacheManager also substitutes the
  cached relation into any INDEPENDENTLY-constructed identical plan, and
  the executed-plan string keeps the full original lineage beneath
  ``InMemoryRelation`` — so the plan locks in tests/test_plans.py still
  read the real join/exchange structure.
- ``checkpoint`` (eager builders — the ``corpus_curate`` flag frame,
  whose construction itself runs jobs for the connected-components
  loop): built once, ``localCheckpoint``-pinned, reused.

Keys include the SparkContext identity, so a new session (tests spin
several) never sees another session's frames, and dropped contexts let
their blocks be GC'd. ``SPARK_GRAFT_LINEAGE_CACHE=0`` disables sharing
entirely (every call rebuilds, the pre-r7 behavior).

At 100 TB the persist tier maps to the materialized silver tables the
pipeline already writes; executor-memory pressure turns into a
storage-backed table read, not a recompute.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel
from .pinning import pin

_MEMO: dict[tuple, DataFrame] = {}
# RLock, NOT Lock: builders nest (silver_order_details' build lambda calls
# bronze_lineitem, itself memoized) — a non-reentrant lock self-deadlocks
# on the nested shared_frame call.
_LOCK = threading.RLock()


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_LINEAGE_CACHE", "1") != "0"


def _session_key(spark: SparkSession) -> tuple:
    sc = spark.sparkContext
    return (sc.applicationId, sc.startTime)


def shared_frame(
    spark: SparkSession,
    key: tuple | str,
    build: Callable[[], DataFrame],
    *,
    checkpoint: bool = False,
) -> DataFrame:
    """Return the per-(session, key) shared frame, building it on first use.

    ``checkpoint=False``: persist()-mark the built frame (lazy; the first
    consumer materializes it). ``checkpoint=True``: localCheckpoint-pin it
    eagerly (for builders whose construction already runs Spark jobs).
    The double-checked lock keeps concurrent pipeline stages from building
    the same layer twice."""
    if not enabled():
        return build()
    skey = _session_key(spark)
    full_key = (skey, key)
    df = _MEMO.get(full_key)
    if df is not None:
        return df
    with _LOCK:
        # sweep entries of other (stopped) sessions: the JVM frees their
        # blocks, but the dict would otherwise keep stale DataFrame/py4j
        # handles alive for the process lifetime (r7 review) — a process
        # that spins many sessions (the test pattern) must stay bounded
        for stale in [k for k in _MEMO if k[0] != skey]:
            del _MEMO[stale]
        df = _MEMO.get(full_key)
        if df is None:
            df = build()
            if checkpoint:
                df = df.transform(pin)
            else:
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
            _MEMO[full_key] = df
    return df


def seed(spark: SparkSession, key: tuple | str, df: DataFrame) -> None:
    """Pre-populate a shared-frame slot with an externally-built frame —
    the adoption path for maintained tables (llmdata.incrstats seeds the
    tokmemo tiers with warehouse reads so text consumers answer from the
    maintained statistics instead of re-scanning the corpus). Replaces
    any frame already in the slot. No-op when sharing is disabled (every
    call rebuilds inline, so there is nothing to adopt into)."""
    if not enabled():
        return
    full_key = (_session_key(spark), key)
    with _LOCK:
        old = _MEMO.get(full_key)
        if old is not None:
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 — context may already be gone
                pass
        _MEMO[full_key] = df.persist(StorageLevel.MEMORY_AND_DISK)


# auxiliary caches elsewhere (e.g. the similarity codebook memo) register
# a clearer so tests' memo.clear() releases their persisted blocks too
_AUX_CLEARERS: list[Callable[[], None]] = []


def register_aux_clear(fn: Callable[[], None]) -> None:
    if fn not in _AUX_CLEARERS:
        _AUX_CLEARERS.append(fn)


def clear() -> None:
    """Drop all memoized frames (tests; unpersists best-effort)."""
    with _LOCK:
        for df in _MEMO.values():
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — context may already be gone
                pass
        _MEMO.clear()
    for fn in _AUX_CLEARERS:
        fn()
