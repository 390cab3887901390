from .catalog import create_gold_views, database_name, register_warehouse
from .runner import (
    LakehouseConfig,
    run_sales_analytics,
    run_supplier_analytics,
)

__all__ = [
    "LakehouseConfig",
    "run_sales_analytics",
    "run_supplier_analytics",
    "register_warehouse",
    "create_gold_views",
    "database_name",
]
