"""End-to-end pipeline runs: both DAGs materialize and QC passes."""

import os

from databricks_incremental_lakehouse_spark.pipelines import (
    LakehouseConfig,
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
