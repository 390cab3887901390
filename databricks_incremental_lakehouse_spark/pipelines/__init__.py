from .runner import (
    LakehouseConfig,
    run_sales_analytics,
    run_supplier_analytics,
)

__all__ = ["LakehouseConfig", "run_sales_analytics", "run_supplier_analytics"]
