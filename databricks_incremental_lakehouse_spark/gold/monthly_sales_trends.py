"""Gold ``vw_monthly_sales_trends`` — monthly time series with MAs and growth.

Re-expresses reference ``src/views/vw_monthly_sales_trends.py``: monthly
aggregation (:24-44), trend windows — MoM/YoY LAG (:48-57), 3/6/12-month
moving averages (:58-66), YTD cumulative (:67-70), in-year rank (:71) — and
the outer seasonal-index / growth-acceleration select (:76-82).

Determinism notes: every LAG/MA window orders by (order_year, order_month),
which is unique per row; the YTD running sum is wrapped in the deterministic
cent-round (sum of already-cent-rounded values) so engine summation order
cannot leak ulps.

Scale notes: input is month-grain (dozens-hundreds of rows regardless of SF)
so the unpartitioned trend windows' single-partition exchange is over tiny
data — the designed trade-off (SURVEY.md §4). The heavy lifting (the
aggregation over order_details) is a partial+final hash agg; the five
COUNT(DISTINCT) columns rewrite into expand+two-phase agg handled by
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import FIXED_BATCH_ID
from ..operators import round_dbl
from ..oracle_util import with_clause
from ..silver.order_details import silver_order_details, silver_order_details_oracle_ctes


def monthly_sales_base(order_details: DataFrame) -> DataFrame:
    """Month-grain aggregation layer (vw_monthly_sales_trends.py:24-44).

    Split out so the incremental refresh path can maintain it per affected
    month (delete+insert on the ``(order_year, order_month)`` key) while the
    batch view composes it with :func:`trend_windows` unchanged. This is the
    expensive pass — a partial+final hash agg over the line-grain fact; the
    COUNT(DISTINCT) columns rewrite into expand+two-phase agg in Catalyst.
    """
    return (
        order_details.groupBy("order_year", "order_month", "order_quarter")
        .agg(
            F.countDistinct("order_key").alias("total_orders"),
            F.count(F.lit(1)).alias("total_line_items"),
            F.sum(F.col("quantity").cast("double")).alias("total_quantity"),
            round_dbl(F.sum("net_revenue"), 2).alias("total_revenue"),
            round_dbl(F.sum("total_charge"), 2).alias("total_revenue_with_tax"),
            round_dbl(F.avg("net_revenue"), 2).alias("avg_line_revenue"),
            round_dbl(F.avg(F.col("discount_pct").cast("double")), 4).alias("avg_discount_rate"),
            F.countDistinct("customer_key").alias("unique_customers"),
            F.countDistinct("supplier_key").alias("unique_suppliers"),
            F.countDistinct("part_key").alias("unique_products"),
            F.count(F.when(F.col("is_late_shipment"), 1)).alias("late_shipments"),
            F.count(F.when(F.col("return_flag") == "R", 1)).alias("returns"),
            round_dbl(F.avg("shipping_delay_days"), 1).alias("avg_ship_delay"),
        )
    )


def trend_windows(monthly: DataFrame) -> DataFrame:
    """Trend-window layer over the month-grain base
    (vw_monthly_sales_trends.py:48-82).

    Input is month-grain — dozens-hundreds of rows regardless of SF — so
    recomputing it wholesale after an incremental base refresh is O(months),
    not O(fact)."""
    w_seq = Window.orderBy("order_year", "order_month")
    w_ytd = (
        Window.partitionBy("order_year")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_year_rank = Window.partitionBy("order_year").orderBy(
        F.col("total_revenue").desc()
    )
    prev_m = F.lag("total_revenue").over(w_seq)
    prev_y = F.lag("total_revenue", 12).over(w_seq)
    mom = round_dbl(
        (F.col("total_revenue") - prev_m) / F.nullif(prev_m, F.lit(0.0)) * F.lit(100.0),
        2,
    )
    trends = monthly.withColumns(
        {
            "prev_month_revenue": prev_m,
            "mom_revenue_growth_pct": mom,
            "same_month_prev_year_revenue": prev_y,
            "yoy_revenue_growth_pct": round_dbl(
                (F.col("total_revenue") - prev_y)
                / F.nullif(prev_y, F.lit(0.0))
                * F.lit(100.0),
                2,
            ),
            "revenue_3mo_moving_avg": round_dbl(
                F.avg("total_revenue").over(w_seq.rowsBetween(-2, 0)), 2
            ),
            "revenue_6mo_moving_avg": round_dbl(
                F.avg("total_revenue").over(w_seq.rowsBetween(-5, 0)), 2
            ),
            "revenue_12mo_moving_avg": round_dbl(
                F.avg("total_revenue").over(w_seq.rowsBetween(-11, 0)), 2
            ),
            # raw running SUM in the reference (:67-70); cent-round recovers
            # the exact decimal total independent of summation order
            "ytd_cumulative_revenue": round_dbl(
                F.sum("total_revenue").over(w_ytd), 2
            ),
            "revenue_rank_in_year": F.rank().over(w_year_rank),
            "avg_order_value": round_dbl(
                F.col("total_revenue") / F.nullif(F.col("total_orders"), F.lit(0)), 2
            ),
            "revenue_per_customer": round_dbl(
                F.col("total_revenue") / F.nullif(F.col("unique_customers"), F.lit(0)),
                2,
            ),
        }
    )

    return trends.withColumns(
        {
            "seasonal_index": round_dbl(
                F.col("total_revenue")
                / F.nullif(F.col("revenue_12mo_moving_avg"), F.lit(0.0)),
                4,
            ),
            "growth_acceleration": round_dbl(
                F.col("mom_revenue_growth_pct")
                - F.lag("mom_revenue_growth_pct").over(w_seq),
                2,
            ),
        }
    )


def vw_monthly_sales_trends(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    order_details: DataFrame | None = None,
) -> DataFrame:
    if order_details is None:
        order_details = silver_order_details(spark, sf_dir, batch_id)
    return trend_windows(monthly_sales_base(order_details))


_GOLD_MST_CTE = """
    SELECT *,
        CAST(ROUND(CAST(total_revenue / NULLIF(revenue_12mo_moving_avg, 0) AS DECIMAL(38,8)), 4) AS DOUBLE) AS seasonal_index,
        CAST(ROUND(CAST(mom_revenue_growth_pct - LAG(mom_revenue_growth_pct) OVER (ORDER BY order_year, order_month) AS DECIMAL(38,6)), 2) AS DOUBLE) AS growth_acceleration
    FROM (
        SELECT *,
            LAG(total_revenue) OVER w_seq AS prev_month_revenue,
            CAST(ROUND(CAST((total_revenue - LAG(total_revenue) OVER w_seq)
                 / NULLIF(LAG(total_revenue) OVER w_seq, 0) * CAST(100.0 AS DOUBLE) AS DECIMAL(38,6)), 2) AS DOUBLE) AS mom_revenue_growth_pct,
            LAG(total_revenue, 12) OVER w_seq AS same_month_prev_year_revenue,
            CAST(ROUND(CAST((total_revenue - LAG(total_revenue, 12) OVER w_seq)
                 / NULLIF(LAG(total_revenue, 12) OVER w_seq, 0) * CAST(100.0 AS DOUBLE) AS DECIMAL(38,6)), 2) AS DOUBLE) AS yoy_revenue_growth_pct,
            CAST(ROUND(CAST(AVG(total_revenue) OVER (w_seq ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)), 2) AS DOUBLE) AS revenue_3mo_moving_avg,
            CAST(ROUND(CAST(AVG(total_revenue) OVER (w_seq ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)), 2) AS DOUBLE) AS revenue_6mo_moving_avg,
            CAST(ROUND(CAST(AVG(total_revenue) OVER (w_seq ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)), 2) AS DOUBLE) AS revenue_12mo_moving_avg,
            CAST(ROUND(CAST(SUM(total_revenue) OVER (
                PARTITION BY order_year ORDER BY order_month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)), 2) AS DOUBLE) AS ytd_cumulative_revenue,
            CAST(RANK() OVER (PARTITION BY order_year ORDER BY total_revenue DESC) AS INT) AS revenue_rank_in_year,
            CAST(ROUND(CAST(total_revenue / NULLIF(total_orders, 0) AS DECIMAL(38,6)), 2) AS DOUBLE) AS avg_order_value,
            CAST(ROUND(CAST(total_revenue / NULLIF(unique_customers, 0) AS DECIMAL(38,6)), 2) AS DOUBLE) AS revenue_per_customer
        FROM (
            SELECT
                order_year, order_month, order_quarter,
                COUNT(DISTINCT order_key) AS total_orders,
                COUNT(*) AS total_line_items,
                SUM(CAST(quantity AS DOUBLE)) AS total_quantity,
                CAST(ROUND(CAST(SUM(net_revenue) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_revenue,
                CAST(ROUND(CAST(SUM(total_charge) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_revenue_with_tax,
                CAST(ROUND(CAST(AVG(net_revenue) AS DECIMAL(38,6)), 2) AS DOUBLE) AS avg_line_revenue,
                CAST(ROUND(CAST(AVG(CAST(discount_pct AS DOUBLE)) AS DECIMAL(38,8)), 4) AS DOUBLE) AS avg_discount_rate,
                COUNT(DISTINCT customer_key) AS unique_customers,
                COUNT(DISTINCT supplier_key) AS unique_suppliers,
                COUNT(DISTINCT part_key) AS unique_products,
                COUNT(CASE WHEN is_late_shipment THEN 1 END) AS late_shipments,
                COUNT(CASE WHEN return_flag = 'R' THEN 1 END) AS returns,
                CAST(ROUND(CAST(AVG(shipping_delay_days) AS DECIMAL(38,5)), 1) AS DOUBLE) AS avg_ship_delay
            FROM s_order_details
            GROUP BY order_year, order_month, order_quarter
        )
        WINDOW w_seq AS (ORDER BY order_year, order_month)
    )"""


def vw_monthly_sales_trends_oracle_sql(batch_id: str = FIXED_BATCH_ID) -> str:
    ctes = silver_order_details_oracle_ctes(batch_id)
    ctes["g_monthly_sales_trends"] = _GOLD_MST_CTE
    return with_clause(ctes, "SELECT * FROM g_monthly_sales_trends")
