"""Gold views: DuckDB-oracle parity (driver-style)."""

from databricks_incremental_lakehouse_spark.gold import (
    vw_customer_lifetime_value,
    vw_customer_lifetime_value_oracle_sql,
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


def test_supplier_performance_parity(spark, sf_correct):
    compare(
        vw_supplier_performance(spark, sf_correct),
        vw_supplier_performance_oracle_sql(),
        sf_correct,
        name="gold_supplier_performance",
    )
