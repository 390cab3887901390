"""Audit/lineage column injection (reference operator P2).

Every bronze row carries ``_ingested_at TIMESTAMP, _source_system STRING,
_batch_id STRING`` (reference extract_orders.py:37-39, DDL
create_extract_schemas.py:34-36); silver carries ``_refined_at, _batch_id``
(create_refined_schemas.py:54-55).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import AUDIT_INGESTED_AT, FIXED_BATCH_ID, SOURCE_SYSTEM


def with_audit_columns(
    df: DataFrame,
    batch_id: str = FIXED_BATCH_ID,
    source_system: str = SOURCE_SYSTEM,
    include_timestamp: bool = False,
    ts_col: str = "_ingested_at",
) -> DataFrame:
    """Stamp audit columns.

    ``ts_col`` matches the reference's ``_ingested_at = current_timestamp()``
    (extract_orders.py:37). By default it is the PINNED
    ``AUDIT_INGESTED_AT`` so the column sits inside the deterministic
    oracle-checked surface (FIXTURES.md); ``include_timestamp=True``
    switches to wall-clock for materialized pipeline tables.
    """
    df = df.withColumn(
        ts_col,
        F.current_timestamp()
        if include_timestamp
        else F.lit(AUDIT_INGESTED_AT).cast("timestamp"),
    )
    return df.withColumn("_source_system", F.lit(source_system)).withColumn(
        "_batch_id", F.lit(batch_id)
    )
