"""Catalog / namespace DDL surface (reference operators S3, S6, S7).

The reference creates Unity-Catalog namespaces and Delta tables idempotently
before every run (`CREATE CATALOG/SCHEMA IF NOT EXISTS` —
create_extract_schemas.py:17-18; `CREATE TABLE IF NOT EXISTS ... USING
DELTA TBLPROPERTIES(...)` — :23-41) and exposes gold as SQL views
(vw_revenue_by_region.py:20-23). Vanilla Spark has a 2-level namespace, so
the reference's ``catalog.schema`` pair flattens to one database name
(``{catalog}_{schema}``), exactly how the reference parameterizes prefixes
via widgets (_context.py:47-52).

:func:`register_warehouse` points idempotent ``CREATE DATABASE`` /
``CREATE TABLE ... USING PARQUET LOCATION`` DDL at the parquet warehouse a
pipeline run materialized, after which the entire layer surface is plain
``spark.sql``::

    spark.sql("SELECT count(*) FROM dev_lakehouse_bronze.orders")
    spark.sql("SELECT * FROM dev_lakehouse_gold.vw_monthly_sales_trends")

On Databricks the same statements run unchanged with ``USING DELTA`` and a
real 3-level catalog. Table properties mirror the reference's
``quality = bronze|silver|gold`` tags (create_extract_schemas.py:40).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .runner import LakehouseConfig

_LAYERS = {
    # schema-config key -> (quality tag, tables)
    "extract": (
        "bronze",
        [
            "orders",
            "customers",
            "lineitem",
            "suppliers",
            "parts",
            "partsupp",
            "nation",
            "region",
        ],
    ),
    "refined": ("silver", ["order_details", "customer_orders", "supplier_parts"]),
    "views": (
        "gold",
        [
            "vw_revenue_by_region",
            "vw_customer_lifetime_value",
            "vw_supplier_performance",
            "vw_monthly_sales_trends",
        ],
    ),
}


def database_name(cfg: LakehouseConfig, schema_key: str) -> str:
    return f"{cfg.settings['catalog']}_{cfg.settings[f'{schema_key}_schema']}"


def register_warehouse(
    spark: SparkSession,
    cfg: LakehouseConfig,
    missing_ok: bool = True,
    analyze: bool = True,
) -> list[str]:
    """Idempotently register every materialized warehouse table in the Spark
    catalog. Returns the fully-qualified names registered.

    ``missing_ok``: skip tables whose parquet directory does not exist yet
    (e.g. supplier-DAG outputs before the weekly run), mirroring the
    reference's create-before-populate idempotency (README.md:122).

    ``analyze`` runs ``ANALYZE TABLE ... COMPUTE STATISTICS`` on each
    registered table, persisting rowCount/sizeInBytes into the catalog.
    Leaf parquet relations get size-based estimates for free, but ROW
    counts are what the cost-based optimizer needs for join reordering
    and aggregate estimation (``spark.sql.cbo.enabled`` — set in
    :func:`~..session.build_spark`); on Databricks this is the same
    ``ANALYZE``/auto-stats Delta runs. One footer-driven count job per
    table at registration time.
    """
    import os

    registered: list[str] = []
    for schema_key, (quality, tables) in _LAYERS.items():
        db = database_name(cfg, schema_key)
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {db} "
            f"COMMENT '{quality} layer of the incremental lakehouse'"
        )
        for table in tables:
            path = cfg.table_path(schema_key, table)
            if not os.path.isdir(path):
                if missing_ok:
                    continue
                raise FileNotFoundError(path)
            fq = f"{db}.{table}"
            # external parquet table over the pipeline's output; DROP first
            # so a re-run after a schema change re-derives the new schema
            spark.sql(f"DROP TABLE IF EXISTS {fq}")
            spark.sql(
                f"CREATE TABLE {fq} USING PARQUET LOCATION '{path}' "
                f"TBLPROPERTIES ('quality' = '{quality}')"
            )
            # hive-style partitioned output (e.g. order_details/order_year=…)
            # registers with an EMPTY partition list until partitions are
            # recovered — without this the table exists but returns 0 rows
            if any("=" in d for d in os.listdir(path) if not d.startswith("_")):
                spark.sql(f"MSCK REPAIR TABLE {fq}")
            if analyze:
                spark.sql(f"ANALYZE TABLE {fq} COMPUTE STATISTICS")
            registered.append(fq)
    return registered


def create_gold_views(spark: SparkSession, cfg: LakehouseConfig) -> list[str]:
    """Register the four gold models as NON-materialized views over the
    materialized silver tables — the reference's actual gold shape
    (``CREATE OR REPLACE VIEW`` — vw_revenue_by_region.py:20-23), while the
    pipeline additionally materializes them for BI latency.

    The views are session-scoped temp views built from the same lazy
    DataFrame programs the pipeline materializes; querying one recomputes
    from current silver state (a view's semantics), writing nothing.
    Returns the registered view names.
    """
    from ..gold import (
        vw_customer_lifetime_value,
        vw_monthly_sales_trends,
        vw_revenue_by_region,
        vw_supplier_performance,
    )

    od = spark.read.parquet(cfg.table_path("refined", "order_details"))
    co = spark.read.parquet(cfg.table_path("refined", "customer_orders"))
    views = {
        "vw_revenue_by_region": vw_revenue_by_region(
            spark, cfg.sf_dir, order_details=od, customer_orders=co
        ),
        "vw_customer_lifetime_value": vw_customer_lifetime_value(
            spark, cfg.sf_dir, order_details=od, customer_orders=co
        ),
        "vw_monthly_sales_trends": vw_monthly_sales_trends(
            spark, cfg.sf_dir, order_details=od
        ),
    }
    import os

    sp_path = cfg.table_path("refined", "supplier_parts")
    if os.path.isdir(sp_path):
        views["vw_supplier_performance"] = vw_supplier_performance(
            spark,
            cfg.sf_dir,
            supplier_parts=spark.read.parquet(sp_path),
            order_details=od,
        )
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return sorted(views)
