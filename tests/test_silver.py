"""Silver layer: DuckDB-oracle parity (driver-style) + invariants."""

from pyspark.sql import functions as F

from databricks_incremental_lakehouse_spark.silver import (
    silver_customer_orders,
    silver_customer_orders_oracle_sql,
    silver_order_details,
    silver_order_details_oracle_sql,
    silver_supplier_parts,
    silver_supplier_parts_oracle_sql,
)
from tests.parity import compare


def test_order_details_parity(spark, sf_correct):
    df = silver_order_details(spark, sf_correct)
    compare(df, silver_order_details_oracle_sql(), sf_correct, name="silver_order_details")


def test_customer_orders_parity(spark, sf_correct):
    df = silver_customer_orders(spark, sf_correct)
    compare(
        df, silver_customer_orders_oracle_sql(), sf_correct, name="silver_customer_orders"
    )


def test_supplier_parts_parity(spark, sf_correct):
    df = silver_supplier_parts(spark, sf_correct)
    compare(
        df, silver_supplier_parts_oracle_sql(), sf_correct, name="silver_supplier_parts"
    )


def test_order_details_quality_gate(spark, sf_correct):
    df = silver_order_details(spark, sf_correct)
    bad = df.filter(
        (F.col("quantity") <= 0)
        | (F.col("extended_price") <= 0)
        | (F.col("net_revenue") < 0)
    ).count()
    assert bad == 0


def test_customer_orders_grain(spark, sf_correct):
    df = silver_customer_orders(spark, sf_correct)
    assert df.count() == df.select("customer_key").distinct().count()
