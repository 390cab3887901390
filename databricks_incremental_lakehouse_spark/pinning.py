"""Lineage pinning with a deployment dial (guide §5).

Every "compute once, consume many times" intermediate in this engine is
pinned by materializing it and cutting its lineage. Locally the cheapest
mechanism is ``localCheckpoint(eager=True)``: one materialization into
executor block storage, plan truncated to a ``Scan ExistingRDD`` (which
also stops statically-unrolled loops from re-planning the pinned
subtree — the r13 pagerank fix). Its weakness is cluster fault
tolerance: localCheckpoint TRUNCATES lineage, so on a real cluster a
lost executor invalidates the pinned blocks and fails the job instead of
recomputing (VERDICT r13 "what's wrong" #3).

``SPARK_GRAFT_PIN`` selects the mechanism at deployment time, the same
pattern as the committer dial (session.py):

- ``local`` (default)  — ``localCheckpoint(eager=True)``: right for
  local[] / ephemeral-cluster runs where a lost executor kills the app
  anyway; zero extra I/O.
- ``persist``          — ``persist(MEMORY_AND_DISK)`` + eager
  materialization: keeps full lineage, so a lost executor recomputes the
  missing partitions; the plan is NOT truncated (statically unrolled
  loops re-plan, but never re-execute, the pinned subtree).
- ``checkpoint``       — reliable ``checkpoint(eager=True)`` into
  ``spark.sparkContext.setCheckpointDir`` storage (set it via
  ``SPARK_GRAFT_CHECKPOINT_DIR`` — session.py wires it): survives
  executor loss AND truncates lineage; costs one write+read of the
  frame through the checkpoint filesystem. The 100 TB default on a
  shared cluster.

All three materialize eagerly exactly once, so the VALUES every consumer
sees are identical across modes; only fault-tolerance and plan shape
differ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

PIN_MODE_ENV = "SPARK_GRAFT_PIN"
_VALID = ("local", "persist", "checkpoint")


def pin_mode() -> str:
    """Effective pin mechanism (env dial; unknown values fail loudly —
    a typo silently falling back to ``local`` would ship the wrong
    fault-tolerance story to a cluster)."""
    mode = os.environ.get(PIN_MODE_ENV, "local")
    if mode not in _VALID:
        raise ValueError(
            f"{PIN_MODE_ENV}={mode!r} is not one of {_VALID}"
        )
    return mode


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once and return a frame every consumer can
    re-read without re-executing the producing plan."""
    mode = pin_mode()
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        # eager: consumers may be collected on the driver or raced by
        # concurrent stages — the pin contract is "materialized now",
        # not "materialized by whoever reads first". count() populates
        # the cache with the frame's FULL schema (the InMemoryRelation
        # sits above the pruning boundary).
        out.count()
        return out
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
