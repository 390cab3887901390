from .audit import with_audit_columns
from .layout import vacuum_table, write_bucketed, z_value, zorder_write
from .dedup import dedup_latest
from .rounding import round_dbl, round_dbl_sql
from .skew import salted_count_distinct, salted_join

__all__ = [
    "with_audit_columns",
    "dedup_latest",
    "round_dbl",
    "round_dbl_sql",
    "salted_join",
    "salted_count_distinct",
    "z_value",
    "zorder_write",
    "write_bucketed",
    "vacuum_table",
]
