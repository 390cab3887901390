from .incremental import (
    BRONZE_MERGE_KEYS,
    apply_cdf_delta,
    checkpoint_changelog,
    incremental_bronze_orders_stream,
    incremental_bronze_stream,
    incremental_cdf_aggregate_stream,
    incremental_corpus_dedup_stream,
    incremental_curated_corpus_stream,
    incremental_events_stream,
    incremental_minhash_registry_stream,
    merge_upsert,
    read_as_of,
    read_cdf_totals,
    read_changelog,
    read_merge_target,
    restore_to_commit,
)
from .refresh import (
    IncrementalWarehouse,
    apply_order_updates,
    incremental_sales_stream,
    init_incremental_warehouse,
)
from .refresh import register_refresh as _register_refresh
from .stateful import stateful_user_totals_stream
from .temporal import register_all as _register_temporal
from .windows import register_all as _register_windows

__all__ = [
    "merge_upsert",
    "read_as_of",
    "read_cdf_totals",
    "apply_cdf_delta",
    "checkpoint_changelog",
    "read_changelog",
    "read_merge_target",
    "restore_to_commit",
    "incremental_events_stream",
    "incremental_bronze_orders_stream",
    "incremental_bronze_stream",
    "incremental_cdf_aggregate_stream",
    "incremental_corpus_dedup_stream",
    "incremental_curated_corpus_stream",
    "incremental_minhash_registry_stream",
    "BRONZE_MERGE_KEYS",
    "stateful_user_totals_stream",
    "IncrementalWarehouse",
    "init_incremental_warehouse",
    "apply_order_updates",
    "incremental_sales_stream",
    "register_all",
]


def register_all(register) -> None:
    _register_windows(register)
    _register_temporal(register)
    _register_refresh(register)
    from .joins import register_joins
    from .stateful import (
        STREAM_USER_TOTALS_ORACLE,
        stream_funnel,
        stream_retention,
        stream_user_totals,
    )
    from .temporal import EVENTS_FUNNEL_ORACLE, EVENTS_RETENTION_ORACLE

    register("stream_user_totals", stream_user_totals, STREAM_USER_TOTALS_ORACLE)
    register("stream_funnel", stream_funnel, EVENTS_FUNNEL_ORACLE)
    register("stream_retention", stream_retention, EVENTS_RETENTION_ORACLE)
    register_joins(register)
    from .scd import register_scd

    register_scd(register)
