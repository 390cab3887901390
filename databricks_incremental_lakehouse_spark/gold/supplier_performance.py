"""Gold ``vw_supplier_performance`` — composite supplier scorecard.

Re-expresses reference ``src/views/vw_supplier_performance.py``: cost
metrics CTE over supplier_parts (:25-44), delivery metrics CTE over
order_details (:45-62), the weighted composite score (:76-82), tiering
(:88-93) and regional/global RANK (:94-95).

Adaptation: ``avg_delivery_delay_days`` (:52) is dropped — the test data
has no receipt date (FIXTURES.md); the composite score's delivery component
uses the adapted late-shipment definition (constants.LATE_SHIP_DAYS).

Scale notes: both CTEs pre-aggregate to supplier grain (10K rows at SF1)
before the LEFT join — dim x dim. The global RANK is a single-partition
window over supplier-grain rows, the designed trade-off (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import FIXED_BATCH_ID
from ..operators import round_dbl
from ..oracle_util import replace_cast, with_clause
from ..silver.order_details import silver_order_details, silver_order_details_oracle_ctes
from ..silver.supplier_parts import silver_supplier_parts, silver_supplier_parts_oracle_ctes


def vw_supplier_performance(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    supplier_parts: DataFrame | None = None,
    order_details: DataFrame | None = None,
) -> DataFrame:
    if supplier_parts is None:
        supplier_parts = silver_supplier_parts(spark, sf_dir, batch_id)
    if order_details is None:
        order_details = silver_order_details(spark, sf_dir, batch_id)

    cheapest = F.sum(F.when(F.col("is_cheapest_in_region"), 1).otherwise(0))
    scm = supplier_parts.groupBy(
        "supplier_key",
        "supplier_name",
        "supplier_nation",
        "supplier_region",
        "supplier_acct_balance",
    ).agg(
        F.countDistinct("part_key").alias("parts_in_catalog"),
        F.countDistinct("part_type").alias("distinct_part_types"),
        F.countDistinct("part_brand").alias("distinct_brands"),
        F.sum("available_qty").alias("total_available_qty"),
        round_dbl(F.avg(F.col("supply_cost").cast("double")), 2).alias("avg_supply_cost"),
        round_dbl(F.avg("margin_pct") * F.lit(100.0), 2).alias("avg_margin_pct"),
        round_dbl(F.avg("cost_vs_region_avg"), 4).alias("avg_cost_vs_region"),
        cheapest.alias("cheapest_count"),
        F.count(F.lit(1)).alias("total_combos"),
        round_dbl(F.lit(100.0) * cheapest / F.count(F.lit(1)), 2).alias(
            "cheapest_pct"
        ),
    )

    late = F.count(F.when(F.col("is_late_shipment"), 1))
    returned = F.count(F.when(F.col("return_flag") == "R", 1))
    sdm = order_details.groupBy("supplier_key").agg(
        F.countDistinct("order_key").alias("orders_fulfilled"),
        F.sum(F.col("quantity").cast("double")).alias("total_qty_shipped"),
        round_dbl(F.sum("net_revenue"), 2).alias("total_revenue_generated"),
        round_dbl(F.avg("shipping_delay_days"), 1).alias("avg_ship_delay_days"),
        late.alias("late_shipments"),
        F.count(F.lit(1)).alias("total_shipments"),
        round_dbl(F.lit(100.0) * late / F.count(F.lit(1)), 2).alias(
            "late_shipment_rate"
        ),
        round_dbl(
            F.lit(100.0) * (F.lit(1.0) - late * F.lit(1.0) / F.count(F.lit(1))), 2
        ).alias("on_time_delivery_rate"),
        returned.alias("returned_items"),
        round_dbl(F.lit(100.0) * returned / F.count(F.lit(1)), 2).alias(
            "return_rate_pct"
        ),
    )

    composite = scm.join(sdm, "supplier_key", "left").withColumn(
        "performance_score",
        round_dbl(
            F.coalesce(F.col("on_time_delivery_rate"), F.lit(50.0)) * F.lit(0.40)
            + F.least(F.col("cheapest_pct"), F.lit(100.0)) * F.lit(0.30)
            + F.least(F.col("distinct_part_types") * 5, F.lit(100).cast("long"))
            * F.lit(0.20)
            + (F.lit(100.0) - F.coalesce(F.col("return_rate_pct"), F.lit(50.0)))
            * F.lit(0.10),
            2,
        ),
    )

    w_region = Window.partitionBy("supplier_region").orderBy(
        F.col("performance_score").desc()
    )
    w_global = Window.orderBy(F.col("performance_score").desc())
    return composite.withColumns(
        {
            "supplier_tier": F.when(
                F.col("performance_score") >= 80, "Tier 1 - Strategic"
            )
            .when(F.col("performance_score") >= 60, "Tier 2 - Preferred")
            .when(F.col("performance_score") >= 40, "Tier 3 - Approved")
            .otherwise("Tier 4 - Under Review"),
            "rank_in_region": F.rank().over(w_region),
            "overall_rank": F.rank().over(w_global),
        }
    )


_GOLD_SPF_CTE = """
    SELECT *,
        CASE
            WHEN performance_score >= 80 THEN 'Tier 1 - Strategic'
            WHEN performance_score >= 60 THEN 'Tier 2 - Preferred'
            WHEN performance_score >= 40 THEN 'Tier 3 - Approved'
            ELSE 'Tier 4 - Under Review'
        END AS supplier_tier,
        CAST(RANK() OVER (PARTITION BY supplier_region ORDER BY performance_score DESC) AS INT) AS rank_in_region,
        CAST(RANK() OVER (ORDER BY performance_score DESC) AS INT) AS overall_rank
    FROM (
        SELECT
            scm.*,
            sdm.orders_fulfilled,
            sdm.total_qty_shipped,
            sdm.total_revenue_generated,
            sdm.avg_ship_delay_days,
            sdm.late_shipments,
            sdm.total_shipments,
            sdm.late_shipment_rate,
            sdm.on_time_delivery_rate,
            sdm.returned_items,
            sdm.return_rate_pct,
            CAST(ROUND(CAST(
                COALESCE(sdm.on_time_delivery_rate, 50) * 0.40
                + LEAST(scm.cheapest_pct, 100) * 0.30
                + LEAST(scm.distinct_part_types * 5, 100) * 0.20
                + (100 - COALESCE(sdm.return_rate_pct, 50)) * 0.10
            AS DECIMAL(38,6)), 2) AS DOUBLE) AS performance_score
        FROM (
            SELECT
                supplier_key, supplier_name, supplier_nation, supplier_region,
                supplier_acct_balance,
                COUNT(DISTINCT part_key) AS parts_in_catalog,
                COUNT(DISTINCT part_type) AS distinct_part_types,
                COUNT(DISTINCT part_brand) AS distinct_brands,
                CAST(SUM(available_qty) AS BIGINT) AS total_available_qty,
                CAST(ROUND(CAST(AVG(CAST(supply_cost AS DOUBLE)) AS DECIMAL(38,6)), 2) AS DOUBLE) AS avg_supply_cost,
                CAST(ROUND(CAST(AVG(margin_pct) * CAST(100.0 AS DOUBLE) AS DECIMAL(38,6)), 2) AS DOUBLE) AS avg_margin_pct,
                CAST(ROUND(CAST(AVG(cost_vs_region_avg) AS DECIMAL(38,8)), 4) AS DOUBLE) AS avg_cost_vs_region,
                CAST(SUM(CASE WHEN is_cheapest_in_region THEN 1 ELSE 0 END) AS BIGINT) AS cheapest_count,
                COUNT(*) AS total_combos,
                CAST(ROUND(CAST(CAST(100.0 AS DOUBLE) * SUM(CASE WHEN is_cheapest_in_region THEN 1 ELSE 0 END)
                     / COUNT(*) AS DECIMAL(38,6)), 2) AS DOUBLE) AS cheapest_pct
            FROM s_supplier_parts
            GROUP BY supplier_key, supplier_name, supplier_nation, supplier_region, supplier_acct_balance
        ) scm
        LEFT JOIN (
            SELECT
                supplier_key,
                COUNT(DISTINCT order_key) AS orders_fulfilled,
                SUM(CAST(quantity AS DOUBLE)) AS total_qty_shipped,
                CAST(ROUND(CAST(SUM(net_revenue) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_revenue_generated,
                CAST(ROUND(CAST(AVG(shipping_delay_days) AS DECIMAL(38,5)), 1) AS DOUBLE) AS avg_ship_delay_days,
                COUNT(CASE WHEN is_late_shipment THEN 1 END) AS late_shipments,
                COUNT(*) AS total_shipments,
                CAST(ROUND(CAST(CAST(100.0 AS DOUBLE) * COUNT(CASE WHEN is_late_shipment THEN 1 END)
                     / COUNT(*) AS DECIMAL(38,6)), 2) AS DOUBLE) AS late_shipment_rate,
                CAST(ROUND(CAST(CAST(100.0 AS DOUBLE) * (1 - COUNT(CASE WHEN is_late_shipment THEN 1 END) * CAST(1.0 AS DOUBLE)
                     / COUNT(*)) AS DECIMAL(38,6)), 2) AS DOUBLE) AS on_time_delivery_rate,
                COUNT(CASE WHEN return_flag = 'R' THEN 1 END) AS returned_items,
                CAST(ROUND(CAST(CAST(100.0 AS DOUBLE) * COUNT(CASE WHEN return_flag = 'R' THEN 1 END)
                     / COUNT(*) AS DECIMAL(38,6)), 2) AS DOUBLE) AS return_rate_pct
            FROM s_order_details
            GROUP BY supplier_key
        ) sdm ON scm.supplier_key = sdm.supplier_key
    )"""


def vw_supplier_performance_oracle_sql(batch_id: str = FIXED_BATCH_ID) -> str:
    ctes = silver_supplier_parts_oracle_ctes(batch_id)
    ctes.update(silver_order_details_oracle_ctes(batch_id))
    ctes["g_supplier_performance"] = _GOLD_SPF_CTE
    return with_clause(
        ctes,
        "SELECT "
        + replace_cast({"supplier_acct_balance": "DOUBLE"})
        + " FROM g_supplier_performance",
    )
