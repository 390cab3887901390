from .incremental import incremental_events_stream, merge_upsert
from .windows import register_all

__all__ = ["merge_upsert", "incremental_events_stream", "register_all"]
