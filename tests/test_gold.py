"""Gold views: DuckDB-oracle parity (driver-style)."""

from databricks_incremental_lakehouse_spark.gold import (
    vw_customer_lifetime_value,
    vw_customer_lifetime_value_oracle_sql,
    vw_customer_lifetime_value_tiers_scoped,
    vw_monthly_sales_trends,
    vw_monthly_sales_trends_oracle_sql,
    vw_revenue_by_region,
    vw_revenue_by_region_oracle_sql,
    vw_supplier_performance,
    vw_supplier_performance_oracle_sql,
)
from tests.parity import compare


def test_revenue_by_region_parity(spark, sf_correct):
    compare(
        vw_revenue_by_region(spark, sf_correct),
        vw_revenue_by_region_oracle_sql(),
        sf_correct,
        name="gold_revenue_by_region",
    )


def test_monthly_sales_trends_parity(spark, sf_correct):
    compare(
        vw_monthly_sales_trends(spark, sf_correct),
        vw_monthly_sales_trends_oracle_sql(),
        sf_correct,
        name="gold_monthly_sales_trends",
    )


def test_customer_lifetime_value_parity(spark, sf_correct):
    compare(
        vw_customer_lifetime_value(spark, sf_correct),
        vw_customer_lifetime_value_oracle_sql(),
        sf_correct,
        name="gold_customer_lifetime_value",
    )


def test_clv_tiers_scoped_parity(spark, sf_correct):
    compare(
        vw_customer_lifetime_value_tiers_scoped(spark, sf_correct),
        vw_customer_lifetime_value_oracle_sql(pct_scope="region_name"),
        sf_correct,
        name="gold_customer_lifetime_value_tiers_scoped",
    )


def test_clv_scoped_agrees_on_single_region(spark, sf_correct):
    """On a corpus restricted to ONE region the scoped and global
    percentile variants must be row-identical — the same agreement
    property that validated the scoped RFM layer (r4)."""
    from databricks_incremental_lakehouse_spark.silver.customer_orders import (
        silver_customer_orders,
    )
    from databricks_incremental_lakehouse_spark.silver.order_details import (
        silver_order_details,
    )
    from pyspark.sql import functions as F

    co = silver_customer_orders(spark, sf_correct).filter(
        F.col("region_name") == "EUROPE"
    )
    od = silver_order_details(spark, sf_correct).join(
        co.select("customer_key"), "customer_key", "left_semi"
    )
    both = [
        {
            tuple(r)
            for r in vw_customer_lifetime_value(
                spark,
                sf_correct,
                order_details=od,
                customer_orders=co,
                pct_scope=scope,
            ).collect()
        }
        for scope in (None, "region_name")
    ]
    assert both[0] and both[0] == both[1]


def test_supplier_performance_parity(spark, sf_correct):
    compare(
        vw_supplier_performance(spark, sf_correct),
        vw_supplier_performance_oracle_sql(),
        sf_correct,
        name="gold_supplier_performance",
    )
