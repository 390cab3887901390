"""Incremental ingestion — Structured Streaming + keyed merge upsert.

The reference is named "incremental" but re-overwrites every table per run
(INSERT OVERWRITE, extract_orders.py:72-88; SURVEY.md gestalt). This module
supplies the genuinely incremental path named as the rebuild's north star
(BASELINE.json ``spark_approach``): a streaming source -> watermark ->
keyed dedup -> ``foreachBatch`` merge into the target table.

On Databricks/Delta runtimes the merge body is ``DeltaTable.merge`` (MERGE
INTO keyed on the same PKs the reference dedups on); this harness has no
Delta, so :func:`merge_upsert` implements the same upsert contract over a
parquet directory: read current -> anti-join out matched keys -> union new
image -> atomic overwrite-by-rewrite. Semantics match MERGE
WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *.

Scale notes: the parquet fallback rewrites the table (the cost Delta's
transaction log avoids); partition the target and restrict the rewrite to
touched partitions for bounded work. Streaming state is bounded by the
watermark; ``dropDuplicates`` keys must include the watermark column's
event-time semantics to allow state eviction.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup_latest


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    keys: Sequence[str],
    tiebreak_cols: Sequence[str] | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_path`` by key.

    Equivalent to ``MERGE INTO target USING updates ON keys WHEN MATCHED
    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` — last-writer-wins
    within ``updates`` via the deterministic keep-latest dedup.
    """
    updates = dedup_latest(updates, keys=keys, tiebreak_cols=tiebreak_cols)
    if os.path.isdir(target_path):
        current = spark.read.parquet(target_path)
        kept = current.join(updates.select(*keys), list(keys), "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    # rewrite through a staging dir: the overwrite must not read-and-clobber
    # the files it is scanning
    staging = target_path.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(staging)
    final = spark.read.parquet(staging)
    final.write.mode("overwrite").parquet(target_path)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)


def incremental_events_stream(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """File-source streaming ingest of events with watermarked dedup and
    merge upsert per micro-batch.

    ``readStream`` file source at ``source_dir`` (parquet, events schema with
    a proper timestamp ``ts``), ``withWatermark('ts', watermark)`` bounds
    dedup state, ``dropDuplicates('event_id')`` is the streaming form of the
    bronze keep-latest dedup (extract_orders.py:57-67), and each micro-batch
    merges into the target keyed on ``event_id``.
    """
    static = spark.read.parquet(source_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .dropDuplicates(["event_id"])
    )

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession,
            batch_df,
            target_path,
            keys=["event_id"],
        )

    writer = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# primary keys per bronze table — the same PKs the reference dedups on
# (extract_orders.py:63, extract_lineitem.py:72-75, …); partsupp is derived
# (bronze_partsupp), not ingested, so it has no incremental source path.
BRONZE_MERGE_KEYS = {
    "orders": ["o_orderkey"],
    "customers": ["c_custkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],  # composite
    "suppliers": ["s_suppkey"],
    "parts": ["p_partkey"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
}


def incremental_bronze_stream(
    spark: SparkSession,
    table: str,
    source_dir: str,
    target_path: str,
    checkpoint_dir: str,
    batch_id: str | None = None,
) -> StreamingQuery:
    """Incremental bronze ingest for any source table — the north-star
    replacement for the reference's daily INSERT OVERWRITE
    (extract_orders.py:72-88): stream newly arrived files, run the SAME
    bronze cleaning (project -> audit -> null filter -> keep-latest dedup,
    via the batch builder's ``raw=`` parameter) on each micro-batch, and
    MERGE on the table's primary key (:data:`BRONZE_MERGE_KEYS` —
    composite for lineitem).

    Last-writer-wins across batches: a re-delivered key replaces the
    stored image instead of re-ingesting the full snapshot. At production
    scale the merge body is Delta ``MERGE INTO``; here it is the parquet
    :func:`merge_upsert` with identical semantics.
    """
    from ..bronze import BRONZE_BUILDERS
    from ..constants import FIXED_BATCH_ID

    if table not in BRONZE_MERGE_KEYS:
        raise ValueError(
            f"no incremental source path for {table!r}; one of "
            f"{sorted(BRONZE_MERGE_KEYS)}"
        )
    builder = BRONZE_BUILDERS[table]
    keys = BRONZE_MERGE_KEYS[table]
    bid = batch_id or FIXED_BATCH_ID
    static = spark.read.parquet(source_dir)
    stream = spark.readStream.schema(static.schema).parquet(source_dir)

    def _merge_batch(batch_df: DataFrame, _batch_no: int) -> None:
        cleaned = builder(batch_df.sparkSession, sf_dir="", batch_id=bid, raw=batch_df)
        merge_upsert(batch_df.sparkSession, cleaned, target_path, keys=keys)

    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def incremental_bronze_orders_stream(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_dir: str,
    batch_id: str | None = None,
) -> StreamingQuery:
    """Orders specialization of :func:`incremental_bronze_stream`."""
    return incremental_bronze_stream(
        spark, "orders", source_dir, target_path, checkpoint_dir, batch_id
    )
