from .checks import (
    qc_business_rules,
    qc_null_checks,
    qc_referential_integrity,
    qc_row_counts,
    register_all,
    run_all_checks,
)

__all__ = [
    "qc_row_counts",
    "qc_null_checks",
    "qc_referential_integrity",
    "qc_business_rules",
    "run_all_checks",
    "register_all",
]
