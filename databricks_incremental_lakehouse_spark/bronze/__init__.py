from .extracts import (
    BRONZE_ORACLE_CTES,
    bronze_oracle_sql,
    bronze_customers,
    bronze_lineitem,
    bronze_nation,
    bronze_orders,
    bronze_parts,
    bronze_partsupp,
    bronze_region,
    bronze_suppliers,
)

BRONZE_BUILDERS = {
    "orders": bronze_orders,
    "customers": bronze_customers,
    "lineitem": bronze_lineitem,
    "suppliers": bronze_suppliers,
    "parts": bronze_parts,
    "partsupp": bronze_partsupp,
    "nation": bronze_nation,
    "region": bronze_region,
}

__all__ = [
    "BRONZE_BUILDERS",
    "BRONZE_ORACLE_CTES",
    "bronze_oracle_sql",
    "bronze_orders",
    "bronze_customers",
    "bronze_lineitem",
    "bronze_suppliers",
    "bronze_parts",
    "bronze_partsupp",
    "bronze_nation",
    "bronze_region",
]
