"""Gold ``vw_revenue_by_region`` — regional revenue with YoY growth.

Re-expresses reference ``src/views/vw_revenue_by_region.py``: order_details
⋈ customer_orders (:41-43), 6-key aggregation (:28-46), YoY LAG windows
(:64-76) and quarterly revenue-share window (:77-81).

Scale notes: the join is fact x customer-dim on customer_key (sort-merge at
scale; customer_orders is customer-grain so AQE may broadcast it at small
SF). The LAG window partitions by (region, nation, segment, month) and the
share window by (region, year, quarter) — both well-distributed over
aggregated rows, no single-partition exchange anywhere in this view. The
reference writes the LAG expression three times (:64-76); we compute it once
and reuse the column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import AS_OF_DATE, FIXED_BATCH_ID
from ..operators import round_dbl
from ..oracle_util import with_clause
from ..silver.customer_orders import silver_customer_orders, silver_customer_orders_oracle_ctes
from ..silver.order_details import silver_order_details, silver_order_details_oracle_ctes


def vw_revenue_by_region(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    order_details: DataFrame | None = None,
    customer_orders: DataFrame | None = None,
) -> DataFrame:
    if order_details is None:
        order_details = silver_order_details(spark, sf_dir, batch_id)
    if customer_orders is None:
        customer_orders = silver_customer_orders(spark, sf_dir, batch_id)

    late = F.count(F.when(F.col("is_late_shipment"), 1))
    metrics = (
        order_details.select(
            "customer_key",
            "order_key",
            "order_year",
            "order_quarter",
            "order_month",
            "quantity",
            "net_revenue",
            "total_charge",
            "discount_pct",
            "is_late_shipment",
        )
        .join(
            customer_orders.select(
                "customer_key", "region_name", "nation_name", "market_segment"
            ),
            "customer_key",
            "inner",
        )
        .groupBy(
            "region_name",
            "nation_name",
            "market_segment",
            "order_year",
            "order_quarter",
            "order_month",
        )
        .agg(
            F.countDistinct("order_key").alias("order_count"),
            F.sum(F.col("quantity").cast("double")).alias("total_quantity"),
            round_dbl(F.sum("net_revenue"), 2).alias("total_revenue"),
            round_dbl(F.sum("total_charge"), 2).alias("total_charge_with_tax"),
            round_dbl(F.avg("net_revenue"), 2).alias("avg_line_revenue"),
            round_dbl(F.avg(F.col("discount_pct").cast("double")), 4).alias("avg_discount_rate"),
            late.alias("late_shipments"),
            F.count(F.lit(1)).alias("total_lines"),
            round_dbl(F.lit(100.0) * late / F.count(F.lit(1)), 2).alias(
                "late_shipment_pct"
            ),
        )
    )

    w_yoy = Window.partitionBy(
        "region_name", "nation_name", "market_segment", "order_month"
    ).orderBy("order_year")
    w_share = Window.partitionBy("region_name", "order_year", "order_quarter")
    prev = F.lag("total_revenue").over(w_yoy)
    return metrics.withColumns(
        {
            "prev_year_revenue": prev,
            "yoy_revenue_growth_pct": round_dbl(
                (F.col("total_revenue") - prev)
                / F.nullif(prev, F.lit(0.0))
                * F.lit(100.0),
                2,
            ),
            "revenue_share_in_region_pct": round_dbl(
                F.col("total_revenue")
                / F.nullif(F.sum("total_revenue").over(w_share), F.lit(0.0))
                * F.lit(100.0),
                2,
            ),
        }
    )


_GOLD_RBR_CTE = """
    SELECT *,
        LAG(total_revenue) OVER w_yoy AS prev_year_revenue,
        CAST(ROUND(CAST((total_revenue - LAG(total_revenue) OVER w_yoy)
             / NULLIF(LAG(total_revenue) OVER w_yoy, 0) * CAST(100.0 AS DOUBLE) AS DECIMAL(38,6)), 2) AS DOUBLE) AS yoy_revenue_growth_pct,
        CAST(ROUND(CAST(total_revenue / NULLIF(SUM(total_revenue) OVER (
                PARTITION BY region_name, order_year, order_quarter), 0)
             * CAST(100.0 AS DOUBLE) AS DECIMAL(38,6)), 2) AS DOUBLE) AS revenue_share_in_region_pct
    FROM (
        SELECT
            co.region_name,
            co.nation_name,
            co.market_segment,
            od.order_year,
            od.order_quarter,
            od.order_month,
            COUNT(DISTINCT od.order_key) AS order_count,
            SUM(CAST(od.quantity AS DOUBLE)) AS total_quantity,
            CAST(ROUND(CAST(SUM(od.net_revenue) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_revenue,
            CAST(ROUND(CAST(SUM(od.total_charge) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_charge_with_tax,
            CAST(ROUND(CAST(AVG(od.net_revenue) AS DECIMAL(38,6)), 2) AS DOUBLE) AS avg_line_revenue,
            CAST(ROUND(CAST(AVG(CAST(od.discount_pct AS DOUBLE)) AS DECIMAL(38,8)), 4) AS DOUBLE) AS avg_discount_rate,
            COUNT(CASE WHEN od.is_late_shipment THEN 1 END) AS late_shipments,
            COUNT(*) AS total_lines,
            CAST(ROUND(CAST(CAST(100.0 AS DOUBLE) * COUNT(CASE WHEN od.is_late_shipment THEN 1 END)
                 / COUNT(*) AS DECIMAL(38,6)), 2) AS DOUBLE) AS late_shipment_pct
        FROM s_order_details od
        INNER JOIN s_customer_orders co ON od.customer_key = co.customer_key
        GROUP BY co.region_name, co.nation_name, co.market_segment,
                 od.order_year, od.order_quarter, od.order_month
    )
    WINDOW w_yoy AS (
        PARTITION BY region_name, nation_name, market_segment, order_month
        ORDER BY order_year
    )"""


def vw_revenue_by_region_oracle_sql(
    batch_id: str = FIXED_BATCH_ID, as_of_date: str = AS_OF_DATE
) -> str:
    ctes = silver_order_details_oracle_ctes(batch_id)
    ctes.update(silver_customer_orders_oracle_ctes(batch_id, as_of_date))
    ctes["g_revenue_by_region"] = _GOLD_RBR_CTE
    return with_clause(ctes, "SELECT * FROM g_revenue_by_region")
