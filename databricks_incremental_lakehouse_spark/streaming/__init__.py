from .incremental import (
    BRONZE_MERGE_KEYS,
    incremental_bronze_orders_stream,
    incremental_bronze_stream,
    incremental_events_stream,
    merge_upsert,
    read_merge_target,
)
from .stateful import stateful_user_totals_stream
from .windows import register_all

__all__ = [
    "merge_upsert",
    "read_merge_target",
    "incremental_events_stream",
    "incremental_bronze_orders_stream",
    "incremental_bronze_stream",
    "BRONZE_MERGE_KEYS",
    "stateful_user_totals_stream",
    "register_all",
]
