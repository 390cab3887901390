"""End-to-end incremental silver/gold refresh — changed-key recompute.

The reference rebuilds every layer daily (full INSERT OVERWRITE chain,
run_sales_analytics.py:109-110). This module is the incremental
replacement: a micro-batch of changed ``orders``/``lineitem`` rows flows
bronze -> silver -> gold touching only the data that can change:

1. **Bronze**: keyed :func:`~.incremental.merge_upsert` per table
   (orders on ``o_orderkey``; lineitem on the composite line key, hash-
   bucketed by ``l_orderkey`` so a whole order's lines share a bucket).
2. **Silver** ``order_details``: the changed orders' rows are recomputed
   from merged bronze (bucket-pruned reads + broadcast semi-join on the
   changed keys) and merged with ``scope=`` replace semantics — every
   stale line of a changed order is dropped even if the new image has
   fewer/renumbered lines. The target is laid out
   ``order_year=Y/_kb=hash(order_key)`` so year predicates still prune
   for analytics while merges stay key-restricted.
3. **Gold** ``monthly_sales_trends``: the month-grain base aggregate is
   refreshed only for affected months (old image's months ∪ new image's
   months), re-aggregated from a year-pruned, month-semi-joined scan of
   silver; the trend-window layer is then recomputed wholesale over the
   month-grain base — O(#months) rows regardless of fact size.

At 100 TB the per-update cost is O(batch x table/num_buckets) for the
merges plus O(affected-month partitions) for the re-agg — never a full
fact scan. On Databricks the merge bodies become Delta ``MERGE INTO``
and the trends rewrite a gold table overwrite; semantics are identical.
"""

from __future__ import annotations

import os
import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..bronze import bronze_lineitem, bronze_orders, bronze_parts
from ..constants import FIXED_BATCH_ID
from ..gold.monthly_sales_trends import (
    monthly_sales_base,
    trend_windows,
    vw_monthly_sales_trends_oracle_sql,
)
from ..silver.order_details import silver_order_details
from ..tables import load_table
from .incremental import (
    BUCKET_COL,
    _key_bucket,
    _read_meta,
    merge_upsert,
    read_merge_target,
)


class IncrementalWarehouse:
    """Path layout of the incremental warehouse (all merge targets)."""

    def __init__(self, root: str):
        self.root = root

    def bronze(self, table: str) -> str:
        return os.path.join(self.root, "bronze", table)

    @property
    def silver_order_details(self) -> str:
        return os.path.join(self.root, "silver", "order_details")

    @property
    def gold_monthly_base(self) -> str:
        return os.path.join(self.root, "gold", "monthly_base")

    @property
    def gold_monthly_trends(self) -> str:
        return os.path.join(self.root, "gold", "monthly_sales_trends")


def _rewrite_trends(spark: SparkSession, wh: IncrementalWarehouse) -> None:
    """Recompute the window layer over the month-grain base (tiny at any
    SF) and publish it. A plain overwrite is fine for a table this small;
    on Delta this is the same gold-view refresh the reference runs."""
    trends = trend_windows(read_merge_target(spark, wh.gold_monthly_base))
    trends.coalesce(1).write.mode("overwrite").parquet(wh.gold_monthly_trends)


def _read_keys_pruned(
    spark: SparkSession, target: str, changed: DataFrame, key_col: str
) -> DataFrame:
    """Bucket-pruned read of a merge target restricted to the given keys.

    ``changed`` is a single-column DF of key values named ``key_col`` (the
    target's bucket key). Only bucket dirs that can contain those keys are
    scanned (the bucket-id collect is bounded by ``num_buckets``); the
    broadcast semi-join then exacts the rows — the micro-batch side is
    always the small side."""
    meta = _read_meta(target)
    nb = int(meta["num_buckets"])
    buckets = sorted(
        {
            r[0]
            for r in changed.select(
                _key_bucket([key_col], nb).alias("b")
            ).distinct().collect()
        }
    )
    df = (
        spark.read.parquet(target)
        .filter(F.col(BUCKET_COL).isin(buckets))
        .drop(BUCKET_COL)
    )
    return df.join(F.broadcast(changed), key_col, "left_semi")


def init_incremental_warehouse(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    batch_id: str = FIXED_BATCH_ID,
    num_buckets: int = 16,
) -> IncrementalWarehouse:
    """Initial (full) load of every layer into merge targets."""
    wh = IncrementalWarehouse(root)
    merge_upsert(
        spark,
        bronze_orders(spark, sf_dir, batch_id),
        wh.bronze("orders"),
        keys=["o_orderkey"],
        num_buckets=num_buckets,
    )
    merge_upsert(
        spark,
        bronze_lineitem(spark, sf_dir, batch_id),
        wh.bronze("lineitem"),
        keys=["l_orderkey", "l_linenumber"],
        bucket_keys=["l_orderkey"],
        num_buckets=num_buckets,
    )
    merge_upsert(
        spark,
        bronze_parts(spark, sf_dir, batch_id),
        wh.bronze("parts"),
        keys=["p_partkey"],
        num_buckets=num_buckets,
    )
    od = silver_order_details(
        spark,
        sf_dir,
        batch_id,
        orders=read_merge_target(spark, wh.bronze("orders")),
        lineitem=read_merge_target(spark, wh.bronze("lineitem")),
        parts=read_merge_target(spark, wh.bronze("parts")),
    )
    merge_upsert(
        spark,
        od,
        wh.silver_order_details,
        keys=["order_key", "line_number"],
        bucket_keys=["order_key"],
        partition_cols=["order_year"],
        num_buckets=num_buckets,
    )
    base = monthly_sales_base(read_merge_target(spark, wh.silver_order_details))
    merge_upsert(
        spark,
        base,
        wh.gold_monthly_base,
        keys=["order_year", "order_month"],
        num_buckets=4,
    )
    _rewrite_trends(spark, wh)
    return wh


def apply_order_updates(
    spark: SparkSession,
    root: str,
    orders_updates: DataFrame | None = None,
    lineitem_updates: DataFrame | None = None,
    batch_id: str = FIXED_BATCH_ID,
) -> IncrementalWarehouse:
    """Flow one micro-batch of raw order/lineitem changes through
    bronze -> silver -> gold, touching only affected keys/months.

    Update model: an arriving ``orders`` row replaces the order; arriving
    ``lineitem`` rows upsert individual lines. Either way the whole order
    is re-derived in silver from merged bronze, so its silver image is
    always consistent with bronze (the same invariant the reference's full
    rebuild provides, at a fraction of the cost)."""
    wh = IncrementalWarehouse(root)
    if not os.path.isdir(wh.silver_order_details):
        raise ValueError(
            f"incremental warehouse at {root!r} is not initialized; "
            "run init_incremental_warehouse first"
        )
    changed_parts = []
    if orders_updates is not None:
        changed_parts.append(
            orders_updates.select(F.col("o_orderkey").alias("order_key"))
        )
    if lineitem_updates is not None:
        changed_parts.append(
            lineitem_updates.select(F.col("l_orderkey").alias("order_key"))
        )
    if not changed_parts:
        return wh
    changed = reduce(DataFrame.unionByName, changed_parts).distinct()

    # affected months of the OLD image — materialized eagerly (python list)
    # because the silver dirs it reads are about to be swapped
    old_months = [
        (r["order_year"], r["order_month"])
        for r in _read_keys_pruned(
            spark, wh.silver_order_details, changed, "order_key"
        )
        .select("order_year", "order_month")
        .distinct()
        .collect()
    ]

    # 1. bronze merges (same cleaning as the batch extract, via raw=)
    if orders_updates is not None:
        merge_upsert(
            spark,
            bronze_orders(spark, "", batch_id, raw=orders_updates),
            wh.bronze("orders"),
            keys=["o_orderkey"],
        )
    if lineitem_updates is not None:
        merge_upsert(
            spark,
            bronze_lineitem(spark, "", batch_id, raw=lineitem_updates),
            wh.bronze("lineitem"),
            keys=["l_orderkey", "l_linenumber"],
            bucket_keys=["l_orderkey"],
        )

    # 2. recompute the changed orders' silver rows from merged bronze
    orders_new = _read_keys_pruned(
        spark,
        wh.bronze("orders"),
        changed.select(F.col("order_key").alias("o_orderkey")),
        "o_orderkey",
    )
    lines_new = _read_keys_pruned(
        spark,
        wh.bronze("lineitem"),
        changed.select(F.col("order_key").alias("l_orderkey")),
        "l_orderkey",
    )
    new_silver = silver_order_details(
        spark,
        "",
        batch_id,
        orders=orders_new,
        lineitem=lines_new,
        parts=read_merge_target(spark, wh.bronze("parts")),
    )
    new_months = [
        (r["order_year"], r["order_month"])
        for r in new_silver.select("order_year", "order_month").distinct().collect()
    ]
    months = sorted(set(old_months) | set(new_months))
    years = sorted({y for y, _m in months})

    merge_upsert(
        spark,
        new_silver,
        wh.silver_order_details,
        keys=["order_key", "line_number"],
        bucket_keys=["order_key"],
        scope=changed,
        partition_cols=["order_year"],
        partition_scope={"order_year": years},
    )

    # 3. re-aggregate ONLY the affected months (year partitions prune the
    # scan) and scope-replace them in the month-grain base
    if months:
        months_df = spark.createDataFrame(
            months, "order_year int, order_month int"
        )
        month_rows = (
            spark.read.parquet(wh.silver_order_details)
            .drop(BUCKET_COL)
            .filter(F.col("order_year").isin(years))
            .join(F.broadcast(months_df), ["order_year", "order_month"], "left_semi")
        )
        merge_upsert(
            spark,
            monthly_sales_base(month_rows),
            wh.gold_monthly_base,
            keys=["order_year", "order_month"],
            scope=months_df,
        )
        _rewrite_trends(spark, wh)
    return wh


def _query_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: build the incremental warehouse, push one update
    micro-batch through it, and return the refreshed gold trends.

    The update batch replays 50 existing orders verbatim (every raw image
    of each key, so the keyed dedup resolves exactly as the initial load
    did), so the refreshed result must equal the from-scratch
    ``vw_monthly_sales_trends`` — which is exactly the oracle it is
    registered against. The mutating-update case (values equal a true
    batch rebuild) is covered in pytest."""
    root = tempfile.mkdtemp(prefix="incr_wh_")
    wh = init_incremental_warehouse(spark, sf_dir, root)
    raw = load_table(spark, sf_dir, "orders")
    keys50 = raw.select("o_orderkey").distinct().orderBy("o_orderkey").limit(50)
    upd = raw.join(F.broadcast(keys50), "o_orderkey", "left_semi")
    apply_order_updates(spark, root, orders_updates=upd)
    return spark.read.parquet(wh.gold_monthly_trends)


def register_refresh(register) -> None:
    register(
        "incr_monthly_trends_refresh",
        _query_incremental_refresh,
        vw_monthly_sales_trends_oracle_sql(),
    )
