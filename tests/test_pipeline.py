"""End-to-end pipeline runs: both DAGs materialize and QC passes."""

import os

from databricks_incremental_lakehouse_spark.pipelines import (
    LakehouseConfig,
    database_name,
    register_warehouse,
    run_sales_analytics,
    run_supplier_analytics,
)


def test_both_pipelines_end_to_end(spark, sf_smoke, tmp_path):
    cfg = LakehouseConfig.from_env_file(
        sf_dir=sf_smoke, warehouse_dir=str(tmp_path / "warehouse"), env="dev"
    )
    sales = run_sales_analytics(spark, cfg, quality_raises=True)
    assert all(v["status"] == "SUCCESS" for v in sales.values())
    supplier = run_supplier_analytics(spark, cfg, quality_raises=True)
    assert all(v["status"] == "SUCCESS" for v in supplier.values())

    # inter-stage data went through tables, and the partitioned silver fact
    # has year subdirectories for pruning
    od_dir = cfg.table_path("refined", "order_details")
    assert any(p.startswith("order_year=") for p in os.listdir(od_dir))

    views = cfg.table_path("views", "vw_monthly_sales_trends")
    assert spark.read.parquet(views).count() > 0

    # catalog DDL surface: every materialized table queryable via spark.sql
    registered = register_warehouse(spark, cfg)
    assert len(registered) == 15  # 8 bronze + 3 silver + 4 gold
    bronze_db = database_name(cfg, "extract")
    n = spark.sql(f"SELECT count(*) AS n FROM {bronze_db}.orders").first().n
    assert n == spark.read.parquet(cfg.table_path("extract", "orders")).count()
    gold_db = database_name(cfg, "views")
    assert (
        spark.sql(f"SELECT * FROM {gold_db}.vw_monthly_sales_trends").count() > 0
    )
    # the PARTITIONED silver fact must be queryable through the catalog —
    # registration without partition recovery yields an empty table
    silver_db = database_name(cfg, "refined")
    n_sql = spark.sql(f"SELECT count(*) AS n FROM {silver_db}.order_details").first().n
    assert n_sql == spark.read.parquet(od_dir).count() and n_sql > 0
    # idempotent re-registration
    assert len(register_warehouse(spark, cfg)) == 15
