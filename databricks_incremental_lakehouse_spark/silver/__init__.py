from .customer_orders import (
    silver_customer_orders,
    silver_customer_orders_oracle_ctes,
    silver_customer_orders_oracle_sql,
    silver_customer_orders_rfm_scoped,
    silver_customer_orders_rfm_scoped_oracle_sql,
)
from .order_details import (
    silver_order_details,
    silver_order_details_oracle_ctes,
    silver_order_details_oracle_sql,
)
from .supplier_parts import (
    silver_supplier_parts,
    silver_supplier_parts_oracle_ctes,
    silver_supplier_parts_oracle_sql,
)

__all__ = [
    "silver_order_details",
    "silver_order_details_oracle_ctes",
    "silver_order_details_oracle_sql",
    "silver_customer_orders",
    "silver_customer_orders_oracle_ctes",
    "silver_customer_orders_oracle_sql",
    "silver_customer_orders_rfm_scoped",
    "silver_customer_orders_rfm_scoped_oracle_sql",
    "silver_supplier_parts",
    "silver_supplier_parts_oracle_ctes",
    "silver_supplier_parts_oracle_sql",
]
