from .customer_lifetime_value import (
    vw_customer_lifetime_value,
    vw_customer_lifetime_value_oracle_sql,
    vw_customer_lifetime_value_fully_scoped,
    vw_customer_lifetime_value_tiers_scoped,
)
from .monthly_sales_trends import (
    vw_monthly_sales_trends,
    vw_monthly_sales_trends_oracle_sql,
)
from .revenue_by_region import vw_revenue_by_region, vw_revenue_by_region_oracle_sql
from .supplier_performance import (
    vw_supplier_performance,
    vw_supplier_performance_oracle_sql,
)

__all__ = [
    "vw_revenue_by_region",
    "vw_revenue_by_region_oracle_sql",
    "vw_customer_lifetime_value",
    "vw_customer_lifetime_value_oracle_sql",
    "vw_customer_lifetime_value_fully_scoped",
    "vw_customer_lifetime_value_tiers_scoped",
    "vw_supplier_performance",
    "vw_supplier_performance_oracle_sql",
    "vw_monthly_sales_trends",
    "vw_monthly_sales_trends_oracle_sql",
]
