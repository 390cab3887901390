"""Stream-stream join — the one §2.9 operator family round 5 lacked.

``view`` events joined to ``purchase`` events of the same user arriving
within :data:`JOIN_BOUND_MIN` minutes of the view — the canonical
attribution join ("which views converted"). Three faces of one relation:

- :func:`events_view_purchase_join` — the BATCH twin over the events
  table: an equi-join on user_id with the interval predicate as a join
  filter. This is the oracle-checkable definition of the semantics.
- :func:`view_purchase_join_stream` — the STREAMING form: two
  ``readStream`` legs over the same source, both watermarked, joined with
  the same time-bound condition. Spark's stream-stream inner join keeps
  each side's rows in the state store only until the other side's
  watermark passes the time bound — state is O(watermark x arrival rate),
  not O(stream) — and emits each matched pair exactly once, so the
  drained output EQUALS the batch join row-for-row (asserted in
  tests/test_streaming.py and by the shared driver oracle).
- :func:`stream_view_purchase_join` — the registry query that drains the
  stream (availableNow, memoized per sf_dir) and serves the result, so
  the stream-stream path itself gets a driver CORRECTNESS row instead of
  a pytest-only check.

At 100 TB: both legs shuffle on user_id once; the interval bound is what
makes unbounded-stream state finite (without both per-side time bounds
Spark must keep every row forever). The batch twin's plan is the same
single hash join DuckDB runs for the oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

JOIN_BOUND_MIN = 30  # purchase within [view.ts, view.ts + 30 minutes]

_JOIN_COND = (
    "view_user_id = purchase_user_id "
    "AND purchase_ts >= view_ts "
    f"AND purchase_ts <= view_ts + INTERVAL {JOIN_BOUND_MIN} MINUTES"
)


def _views(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("view_user_id"),
        F.col("ts").cast("timestamp").alias("view_ts"),
        F.col("value").alias("view_value"),
    )


def _purchases(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("purchase_user_id"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )


def _project(joined: DataFrame) -> DataFrame:
    """The shared output contract of the batch and streaming forms.
    ``delay_us`` is an exact integer microsecond difference (second-grain
    epoch would floor on Spark but round on DuckDB's double epoch)."""
    return joined.select(
        "view_event_id",
        F.col("view_user_id").alias("user_id"),
        "view_ts",
        "view_value",
        "purchase_event_id",
        "purchase_ts",
        "purchase_value",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias(
            "delay_us"
        ),
    )


def events_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: every (view, purchase) pair of the same user with the
    purchase inside the attribution bound."""
    ev = load_table(spark, sf_dir, "events")
    return _project(_views(ev).join(_purchases(ev), F.expr(_JOIN_COND)))


EVENTS_VIEW_PURCHASE_ORACLE = f"""
WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
                  value FROM events),
v AS (SELECT event_id AS view_event_id, user_id, ts AS view_ts,
             value AS view_value FROM e WHERE event_type = 'view'),
p AS (SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts,
             value AS purchase_value FROM e WHERE event_type = 'purchase')
SELECT v.view_event_id, v.user_id, v.view_ts, v.view_value,
       p.purchase_event_id, p.purchase_ts, p.purchase_value,
       epoch_us(p.purchase_ts) - epoch_us(v.view_ts) AS delay_us
FROM v JOIN p
  ON v.user_id = p.user_id
 AND p.purchase_ts >= v.view_ts
 AND p.purchase_ts <= v.view_ts + INTERVAL {JOIN_BOUND_MIN} MINUTES"""


def view_purchase_join_stream(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
):
    """The streaming form: two watermarked legs over the events source,
    stream-stream inner join with the per-side time bound, appended to a
    parquet sink; ``availableNow`` drains the current source and stops.

    The 1-hour watermark delay bounds state without affecting this
    corpus's result (inner joins emit on match; the watermark only
    governs state eviction and would drop only rows arriving later than
    the delay out of order)."""
    static = spark.read.parquet(source_dir)
    stream = spark.readStream.schema(static.schema).parquet(source_dir)
    views = _views(stream).withWatermark("view_ts", "1 hour")
    purchases = _purchases(stream).withWatermark("purchase_ts", "1 hour")
    joined = _project(views.join(purchases, F.expr(_JOIN_COND)))
    return (
        joined.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# session-scoped memo: one drained join per sf_dir
_JOIN_TARGETS: dict[str, str] = {}


def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: drain the stream-stream join over the events table
    and serve the appended sink — checked against the SAME oracle as the
    batch twin (the stateful.stream_user_totals drain discipline: raise
    on timeout, memoize only after a confirmed drain)."""
    target = _JOIN_TARGETS.get(sf_dir)
    if target is None:
        root = tempfile.mkdtemp(prefix="ss_join_")
        src = os.path.join(root, "src")
        os.makedirs(src)
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(src, "events.parquet"),
        )
        q = view_purchase_join_stream(
            spark, src, os.path.join(root, "target"), os.path.join(root, "ckpt")
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "view_purchase_join_stream did not drain within 300s; "
                "refusing to read a partial sink"
            )
        target = os.path.join(root, "target")
        _JOIN_TARGETS[sf_dir] = target
    return spark.read.parquet(target)


def register_joins(register) -> None:
    register(
        "events_view_purchase_join",
        events_view_purchase_join,
        EVENTS_VIEW_PURCHASE_ORACLE,
    )
    register(
        "stream_view_purchase_join",
        stream_view_purchase_join,
        EVENTS_VIEW_PURCHASE_ORACLE,
    )
