from .audit import with_audit_columns
from .dedup import dedup_latest

__all__ = ["with_audit_columns", "dedup_latest"]
