"""Gold ``vw_customer_lifetime_value`` — CLV, cohorts, value tiers.

Re-expresses reference ``src/views/vw_customer_lifetime_value.py``: per-
customer order-detail metrics CTE (:25-40), cohort/CLV CTE (:41-57), the
triple LEFT join (:98-100), PERCENT_RANK percentiles (:90-91) and
Platinum/Gold/Silver/Bronze tiering (:92-97).

Adaptation: ``distinct_ship_modes_used`` (:29) is dropped — the test data
carries no ship mode (FIXTURES.md).

Scale notes: both CTEs aggregate to customer grain before joining, so the
joins are dim x dim. PERCENT_RANK over all customers is a global window —
single-partition exchange over customer-grain rows, same designed trade-off
as the reference (SURVEY.md §4); computed once and reused for the tier CASE
(the reference repeats the window expression — Catalyst dedups; we reuse the
column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import AS_OF_DATE, FIXED_BATCH_ID
from ..operators import round_dbl
from ..oracle_util import replace_cast, with_clause
from ..silver.customer_orders import silver_customer_orders, silver_customer_orders_oracle_ctes
from ..silver.order_details import silver_order_details, silver_order_details_oracle_ctes


def vw_customer_lifetime_value(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    order_details: DataFrame | None = None,
    customer_orders: DataFrame | None = None,
    pct_scope: str | None = None,
) -> DataFrame:
    """``pct_scope``: optional column partitioning the two PERCENT_RANK
    windows and the derived tier CASE (e.g. ``"region_name"``). ``None``
    reproduces the reference's global percentiles (single-partition
    exchange, module docstring); a scope turns each window into a
    hash-partitioned exchange — the 100x-customers scale path, same
    pattern as :func:`..silver.customer_orders.rfm_segmentation`. On a
    corpus with one scope value the variants agree exactly
    (tests/test_gold.py)."""
    if order_details is None:
        order_details = silver_order_details(spark, sf_dir, batch_id)
    if customer_orders is None:
        customer_orders = silver_customer_orders(spark, sf_dir, batch_id)

    returned = F.sum(F.when(F.col("return_flag") == "R", 1).otherwise(0))
    odm = order_details.groupBy("customer_key").agg(
        F.countDistinct("part_brand").alias("distinct_brands_purchased"),
        F.countDistinct("part_type").alias("distinct_part_types"),
        round_dbl(F.avg("shipping_delay_days"), 1).alias("avg_shipping_delay"),
        round_dbl(F.avg(F.col("discount_pct").cast("double")), 4).alias("avg_discount_received"),
        returned.alias("returned_lines"),
        F.count(F.lit(1)).alias("total_lines"),
        round_dbl(F.lit(100.0) * returned / F.count(F.lit(1)), 2).alias(
            "return_rate_pct"
        ),
        round_dbl(F.sum("net_revenue"), 2).alias("detailed_total_revenue"),
        round_dbl(F.sum("tax_amount"), 2).alias("total_tax_paid"),
    )

    ca = customer_orders.select(
        "customer_key",
        F.concat(
            F.year("first_order_date").cast("string"),
            F.lit("-Q"),
            F.quarter("first_order_date").cast("string"),
        ).alias("acquisition_cohort"),
        round_dbl(
            F.col("avg_order_value")
            * F.when(
                F.col("order_frequency_days") > 0,
                F.lit(365.0) / F.col("order_frequency_days"),
            ).otherwise(F.lit(1.0))
            * F.lit(3.0),
            2,
        ).alias("estimated_3yr_clv"),
        F.when(
            F.col("customer_tenure_days") > 0,
            round_dbl(
                F.col("total_revenue") / F.col("customer_tenure_days"), 2
            ),
        )
        .otherwise(F.col("total_revenue"))
        .alias("revenue_per_tenure_day"),
    )

    part = [F.col(pct_scope)] if pct_scope else []
    w_rev = Window.partitionBy(*part).orderBy("total_revenue")
    w_ord = Window.partitionBy(*part).orderBy("total_orders")
    rev_pct = F.percent_rank().over(w_rev)
    joined = (
        customer_orders.select(
            "customer_key",
            "customer_name",
            "market_segment",
            "nation_name",
            "region_name",
            "account_balance",
            "total_orders",
            "total_revenue",
            "avg_order_value",
            "first_order_date",
            "last_order_date",
            "days_since_last_order",
            "order_frequency_days",
            "fulfillment_rate",
            "customer_tenure_days",
            "customer_segment",
            "rfm_recency_score",
            "rfm_frequency_score",
            "rfm_monetary_score",
        )
        .join(odm, "customer_key", "left")
        .join(ca, "customer_key", "left")
        .withColumns(
            {
                "revenue_percentile": rev_pct,
                "order_frequency_percentile": F.percent_rank().over(w_ord),
            }
        )
        .withColumn(
            "value_tier",
            F.when(F.col("revenue_percentile") >= 0.9, "Platinum")
            .when(F.col("revenue_percentile") >= 0.7, "Gold")
            .when(F.col("revenue_percentile") >= 0.4, "Silver")
            .otherwise("Bronze"),
        )
    )
    return joined


def vw_customer_lifetime_value_tiers_scoped(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
) -> DataFrame:
    """Region-scoped value tiers: the three PERCENT_RANK windows computed
    WITHIN ``region_name`` — the partitioned-percentile scale variant of
    :func:`vw_customer_lifetime_value` (r4 VERDICT item 3; the NTILE RFM
    layer got the same treatment in round 4). Same schema; percentiles
    and Platinum/Gold/Silver/Bronze tiers mean "within region". Still
    consumes the GLOBAL RFM silver layer, so exactly one SinglePartition
    exchange remains upstream — :func:`vw_customer_lifetime_value_fully_scoped`
    removes that one too."""
    return vw_customer_lifetime_value(
        spark, sf_dir, batch_id, pct_scope="region_name"
    )


def vw_customer_lifetime_value_fully_scoped(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
) -> DataFrame:
    """The zero-global-window CLV chain (VERDICT r5 task 8): region-scoped
    RFM quintiles at the silver layer feeding region-scoped PERCENT_RANK
    tiers at the gold layer, so NO single-partition exchange survives
    anywhere in the lineage (plan-locked in tests/test_plans.py). This is
    the end-to-end path a 100x-customer deployment runs: every window is
    a hash-partitioned exchange on region_name over customer-grain rows.
    Scores and tiers both mean "within region"."""
    from ..silver.customer_orders import silver_customer_orders_rfm_scoped

    return vw_customer_lifetime_value(
        spark,
        sf_dir,
        batch_id,
        customer_orders=silver_customer_orders_rfm_scoped(spark, sf_dir, batch_id),
        pct_scope="region_name",
    )


_GOLD_CLV_CTE = """
    SELECT
        co.customer_key,
        co.customer_name,
        co.market_segment,
        co.nation_name,
        co.region_name,
        co.account_balance,
        co.total_orders,
        co.total_revenue,
        co.avg_order_value,
        co.first_order_date,
        co.last_order_date,
        co.days_since_last_order,
        co.order_frequency_days,
        co.fulfillment_rate,
        co.customer_tenure_days,
        co.customer_segment,
        co.rfm_recency_score,
        co.rfm_frequency_score,
        co.rfm_monetary_score,
        odm.distinct_brands_purchased,
        odm.distinct_part_types,
        odm.avg_shipping_delay,
        odm.avg_discount_received,
        odm.returned_lines,
        odm.total_lines,
        odm.return_rate_pct,
        odm.detailed_total_revenue,
        odm.total_tax_paid,
        ca.acquisition_cohort,
        ca.estimated_3yr_clv,
        ca.revenue_per_tenure_day,
        PERCENT_RANK() OVER ({pct_part}ORDER BY co.total_revenue) AS revenue_percentile,
        PERCENT_RANK() OVER ({pct_part}ORDER BY co.total_orders) AS order_frequency_percentile,
        CASE
            WHEN PERCENT_RANK() OVER ({pct_part}ORDER BY co.total_revenue) >= 0.9 THEN 'Platinum'
            WHEN PERCENT_RANK() OVER ({pct_part}ORDER BY co.total_revenue) >= 0.7 THEN 'Gold'
            WHEN PERCENT_RANK() OVER ({pct_part}ORDER BY co.total_revenue) >= 0.4 THEN 'Silver'
            ELSE 'Bronze'
        END AS value_tier
    FROM s_customer_orders co
    LEFT JOIN (
        SELECT
            customer_key,
            COUNT(DISTINCT part_brand) AS distinct_brands_purchased,
            COUNT(DISTINCT part_type) AS distinct_part_types,
            CAST(ROUND(CAST(AVG(shipping_delay_days) AS DECIMAL(38,5)), 1) AS DOUBLE) AS avg_shipping_delay,
            CAST(ROUND(CAST(AVG(CAST(discount_pct AS DOUBLE)) AS DECIMAL(38,8)), 4) AS DOUBLE) AS avg_discount_received,
            CAST(SUM(CASE WHEN return_flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines,
            COUNT(*) AS total_lines,
            CAST(ROUND(CAST(CAST(100.0 AS DOUBLE) * SUM(CASE WHEN return_flag = 'R' THEN 1 ELSE 0 END)
                 / COUNT(*) AS DECIMAL(38,6)), 2) AS DOUBLE) AS return_rate_pct,
            CAST(ROUND(CAST(SUM(net_revenue) AS DECIMAL(38,6)), 2) AS DOUBLE) AS detailed_total_revenue,
            CAST(ROUND(CAST(SUM(tax_amount) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_tax_paid
        FROM s_order_details
        GROUP BY customer_key
    ) odm ON co.customer_key = odm.customer_key
    LEFT JOIN (
        SELECT
            customer_key,
            concat(CAST(year(first_order_date) AS VARCHAR), '-Q', CAST(quarter(first_order_date) AS VARCHAR)) AS acquisition_cohort,
            CAST(ROUND(CAST(avg_order_value
                 * CASE WHEN order_frequency_days > 0 THEN (CAST(365.0 AS DOUBLE) / order_frequency_days) ELSE CAST(1.0 AS DOUBLE) END
                 * CAST(3.0 AS DOUBLE) AS DECIMAL(38,6)), 2) AS DOUBLE) AS estimated_3yr_clv,
            CASE WHEN customer_tenure_days > 0
                 THEN CAST(ROUND(CAST(total_revenue / customer_tenure_days AS DECIMAL(38,6)), 2) AS DOUBLE)
                 ELSE total_revenue
            END AS revenue_per_tenure_day
        FROM s_customer_orders
    ) ca ON co.customer_key = ca.customer_key"""


def vw_customer_lifetime_value_oracle_sql(
    batch_id: str = FIXED_BATCH_ID,
    as_of_date: str = AS_OF_DATE,
    pct_scope: str | None = None,
    rfm_part: str = "",
) -> str:
    """``rfm_part`` mirrors the silver layer's scoped-NTILE fragment (""
    = global RFM; "PARTITION BY region_name " = the fully-scoped chain)."""
    ctes = silver_order_details_oracle_ctes(batch_id)
    ctes.update(
        silver_customer_orders_oracle_ctes(batch_id, as_of_date, rfm_part=rfm_part)
    )
    ctes["g_customer_lifetime_value"] = _GOLD_CLV_CTE.format(
        pct_part=f"PARTITION BY co.{pct_scope} " if pct_scope else ""
    )
    return with_clause(
        ctes,
        "SELECT "
        + replace_cast({"account_balance": "DOUBLE"})
        + " FROM g_customer_lifetime_value",
    )
