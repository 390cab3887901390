"""Shared-lineage cache contract (memo.py, VERDICT r6 #1)."""

import os

from databricks_incremental_lakehouse_spark import memo
from databricks_incremental_lakehouse_spark.silver.order_details import (
    silver_order_details,
)


def test_shared_frame_returns_same_object_and_builds_once(spark, sf_smoke):
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).toDF("x")

    a = memo.shared_frame(spark, ("t1", "k"), build)
    b = memo.shared_frame(spark, ("t1", "k"), build)
    assert a is b
    assert len(calls) == 1


def test_shared_frame_disabled_rebuilds(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LINEAGE_CACHE", "0")
    calls = []

    def build():
        calls.append(1)
        return spark.range(2).toDF("x")

    a = memo.shared_frame(spark, ("t2", "k"), build)
    b = memo.shared_frame(spark, ("t2", "k"), build)
    assert len(calls) == 2
    assert a is not b


def test_silver_default_build_is_shared_but_injected_bypasses(spark, sf_smoke):
    """The pinned-default silver build is one shared frame; passing any
    injected input frame (the refresh path) must bypass the cache — a
    micro-batch build keyed like the full build would poison every
    consumer."""
    a = silver_order_details(spark, sf_smoke)
    b = silver_order_details(spark, sf_smoke)
    assert a is b
    injected = silver_order_details(
        spark, sf_smoke, lineitem=spark.read.parquet(
            os.path.join(sf_smoke, "lineitem.parquet")
        ).limit(0)
    )
    assert injected is not a
    # the shared frame's executed plan keeps real lineage under the cache
    # node, so plan locks still see the join structure
    plan = a._jdf.queryExecution().toString()
    assert "order_key" in plan


def test_stale_session_entries_swept(spark):
    """Entries keyed by a dead session must be dropped on the next build
    (the dict would otherwise grow for the process lifetime)."""
    fake_key = (("app-dead", 0), ("zombie",))
    with memo._LOCK:
        memo._MEMO[fake_key] = spark.range(1).toDF("x")
    memo.shared_frame(spark, ("t3", "k"), lambda: spark.range(1).toDF("x"))
    assert fake_key not in memo._MEMO
