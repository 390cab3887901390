"""Silver ``customer_orders`` — per-customer profile with RFM segmentation.

Re-expresses reference ``src/refined/refined_customer_orders.py``: geo join
(:24-41) -> left-join order aggregation (:44-87) -> RFM quintiles (:90-101)
-> segment derivation (:104-145).

Grain: one row per customer with >=1 order (post-agg filter :97).

Determinism adaptations (documented deviations, FIXTURES.md):

- ``days_since_last_order`` uses the pinned ``AS_OF_DATE`` instead of
  ``current_date()`` (:57).
- The three ``NTILE(5)`` windows (:93-95) order only by the metric, so ties
  are placed arbitrarily; we append ``customer_key`` as a deterministic
  tiebreak in both engines.

Scale notes: the geo joins broadcast nation (25 rows) and region (5 rows);
the orders aggregation is a single hash-partition shuffle on customer_key
with map-side partial aggregation. The unpartitioned NTILE windows force a
single-partition exchange — over *customer-grain aggregated* rows (SF1:
150K rows), the same designed trade-off the reference makes (SURVEY.md §4).
For larger customer counts :func:`rfm_segmentation` takes ``scoped_by``
(e.g. ``"region_name"``): the quintile windows then partition by the scope
column, so every exchange is a hash shuffle and no single task ever sorts
the full customer set. The scoped variant is registered and oracle-checked
as ``silver_customer_orders_rfm_scoped``; the global version stays the
reference-parity default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..bronze import (
    BRONZE_ORACLE_CTES,
    bronze_customers,
    bronze_nation,
    bronze_orders,
    bronze_region,
)
from ..constants import AS_OF_DATE, AUDIT_REFINED_AT, FIXED_BATCH_ID
from ..operators import round_dbl
from ..oracle_util import replace_cast, with_clause


def customer_orders_base(
    customers: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    as_of_date: str = AS_OF_DATE,
) -> DataFrame:
    """Customer-grain base: geo join + per-customer order aggregation
    (refined_customer_orders.py:24-87), INCLUDING zero-order customers.

    Split out so the incremental refresh path can maintain it per changed
    customer (scope-replace on ``customer_key``) while
    :func:`rfm_segmentation` — the global-quintile window layer that any
    customer's change can shift — recomputes over the customer-grain base
    (O(customers), not O(orders); the same single-partition-over-aggregates
    trade-off the reference makes)."""
    # Stage 1 — geography (refined_customer_orders.py:24-41); nation/region
    # are tiny -> explicit broadcast keeps the plan shuffle-free here.
    customers_geo = (
        customers.select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("market_segment"),
            F.col("c_acctbal").alias("account_balance"),
            F.col("c_nationkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
            "left",
        )
        .select(
            "customer_key",
            "customer_name",
            "market_segment",
            "account_balance",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )

    # Stage 2 — per-customer order aggregation (:44-87)
    as_of = F.lit(as_of_date).cast("date")
    cnt = F.count(F.col("o_orderkey"))
    agg = (
        customers_geo.join(
            orders.select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
            customers_geo.customer_key == F.col("o_custkey"),
            "left",
        )
        .groupBy(
            "customer_key",
            "customer_name",
            "market_segment",
            "nation_name",
            "region_name",
            "account_balance",
        )
        .agg(
            cnt.alias("total_orders"),
            # Reference keeps the raw SUM (:53); cent-rounding recovers the
            # exact decimal sum regardless of double summation order.
            F.coalesce(round_dbl(F.sum(F.col("o_totalprice").cast("double")), 2), F.lit(0.0)).alias(
                "total_revenue"
            ),
            F.coalesce(round_dbl(F.avg(F.col("o_totalprice").cast("double")), 2), F.lit(0.0)).alias(
                "avg_order_value"
            ),
            F.min("o_orderdate").alias("first_order_date"),
            F.max("o_orderdate").alias("last_order_date"),
            F.datediff(as_of, F.max("o_orderdate")).alias("days_since_last_order"),
            F.when(
                cnt > 1,
                round_dbl(
                    F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
                    / (cnt - F.lit(1.0)),
                    2,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("order_frequency_days"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("fulfilled_orders"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("open_orders"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("partial_orders"),
            F.when(
                cnt > 0,
                round_dbl(
                    F.lit(100.0)
                    * F.count(F.when(F.col("o_orderstatus") == "F", 1))
                    / cnt,
                    2,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("fulfillment_rate"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias(
                "customer_tenure_days"
            ),
        )
    )
    return agg


def rfm_segmentation(
    agg: DataFrame,
    batch_id: str = FIXED_BATCH_ID,
    scoped_by: str | None = None,
) -> DataFrame:
    """RFM quintiles + segmentation over the customer-grain base
    (refined_customer_orders.py:90-145).

    ``scoped_by``: optional column to partition the quintile windows by
    (e.g. ``"region_name"``). ``None`` reproduces the reference's global
    quintiles (single-partition exchange over customer-grain rows); a scope
    turns each window into a hash-partitioned exchange — the 100x-customers
    scale path (module docstring). On a corpus with one scope value the two
    variants agree exactly (tests/test_silver.py)."""
    # Stage 3 — RFM quintiles over customers with orders (:90-101);
    # customer_key appended for tie determinism (module docstring).
    with_orders = agg.filter(F.col("total_orders") > 0)
    part = [F.col(scoped_by)] if scoped_by else []
    w_recency = Window.partitionBy(*part).orderBy(
        F.col("days_since_last_order").asc(), F.col("customer_key").asc()
    )
    w_frequency = Window.partitionBy(*part).orderBy(
        F.col("total_orders").desc(), F.col("customer_key").asc()
    )
    w_monetary = Window.partitionBy(*part).orderBy(
        F.col("total_revenue").desc(), F.col("customer_key").asc()
    )
    rfm = with_orders.withColumns(
        {
            "rfm_recency_score": F.ntile(5).over(w_recency),
            "rfm_frequency_score": F.ntile(5).over(w_frequency),
            "rfm_monetary_score": F.ntile(5).over(w_monetary),
        }
    )

    # Stage 4 — segmentation (:104-145)
    r, f_, m = (
        F.col("rfm_recency_score"),
        F.col("rfm_frequency_score"),
        F.col("rfm_monetary_score"),
    )
    segmented = rfm.withColumn(
        "customer_segment",
        F.when((r <= 2) & (f_ <= 2) & (m <= 2), "Champions")
        .when((r <= 2) & (f_ <= 3), "Loyal Customers")
        .when((r <= 2) & (m <= 2), "Big Spenders")
        .when((r <= 3) & (f_ <= 3), "Potential Loyalists")
        .when((r >= 4) & (f_ >= 4), "At Risk")
        .when((r >= 4) & (f_ <= 2), "Cannot Lose Them")
        .otherwise("Others"),
    ).withColumns(
        {
            "_refined_at": F.lit(AUDIT_REFINED_AT).cast("timestamp"),
            "_batch_id": F.lit(batch_id),
        }
    )

    return segmented.select(
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
        "fulfilled_orders",
        "open_orders",
        "partial_orders",
        "fulfillment_rate",
        "customer_tenure_days",
        "rfm_recency_score",
        "rfm_frequency_score",
        "rfm_monetary_score",
        "customer_segment",
        "_refined_at",
        "_batch_id",
    )


def silver_customer_orders(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    as_of_date: str = AS_OF_DATE,
    customers: DataFrame | None = None,
    orders: DataFrame | None = None,
    nation: DataFrame | None = None,
    region: DataFrame | None = None,
    shared: bool = True,
) -> DataFrame:
    # Default builds are shared session-wide (see silver_order_details /
    # memo.py — the materialized-silver-table analogue, VERDICT r6 #1).
    if (
        shared
        and customers is None
        and orders is None
        and nation is None
        and region is None
        and batch_id == FIXED_BATCH_ID
        and as_of_date == AS_OF_DATE
    ):
        from ..memo import shared_frame

        return shared_frame(
            spark,
            ("silver_customer_orders", sf_dir),
            lambda: silver_customer_orders(spark, sf_dir, shared=False),
        )
    if customers is None:
        customers = bronze_customers(spark, sf_dir, batch_id)
    if orders is None:
        orders = bronze_orders(spark, sf_dir, batch_id)
    if nation is None:
        nation = bronze_nation(spark, sf_dir, batch_id)
    if region is None:
        region = bronze_region(spark, sf_dir, batch_id)
    return rfm_segmentation(
        customer_orders_base(customers, orders, nation, region, as_of_date),
        batch_id,
    )


def silver_customer_orders_rfm_scoped(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    as_of_date: str = AS_OF_DATE,
) -> DataFrame:
    """Region-scoped RFM: quintiles computed WITHIN region_name — the
    partitioned-percentile scale variant (module docstring). Same schema as
    :func:`silver_customer_orders`; scores mean "quintile within region"."""
    return rfm_segmentation(
        customer_orders_base(
            bronze_customers(spark, sf_dir, batch_id),
            bronze_orders(spark, sf_dir, batch_id),
            bronze_nation(spark, sf_dir, batch_id),
            bronze_region(spark, sf_dir, batch_id),
            as_of_date,
        ),
        batch_id,
        scoped_by="region_name",
    )


_SILVER_CO_CTE = """
    SELECT
        customer_key, customer_name, market_segment, nation_name, region_name,
        account_balance, total_orders, total_revenue, avg_order_value,
        first_order_date, last_order_date, days_since_last_order,
        order_frequency_days, fulfilled_orders, open_orders, partial_orders,
        fulfillment_rate, customer_tenure_days,
        rfm_recency_score, rfm_frequency_score, rfm_monetary_score,
        CASE
            WHEN rfm_recency_score <= 2 AND rfm_frequency_score <= 2 AND rfm_monetary_score <= 2
                THEN 'Champions'
            WHEN rfm_recency_score <= 2 AND rfm_frequency_score <= 3
                THEN 'Loyal Customers'
            WHEN rfm_recency_score <= 2 AND rfm_monetary_score <= 2
                THEN 'Big Spenders'
            WHEN rfm_recency_score <= 3 AND rfm_frequency_score <= 3
                THEN 'Potential Loyalists'
            WHEN rfm_recency_score >= 4 AND rfm_frequency_score >= 4
                THEN 'At Risk'
            WHEN rfm_recency_score >= 4 AND rfm_frequency_score <= 2
                THEN 'Cannot Lose Them'
            ELSE 'Others'
        END AS customer_segment,
        TIMESTAMP '{refined_at}' AS _refined_at,
        '{batch_id}' AS _batch_id
    FROM (
        SELECT *,
            CAST(NTILE(5) OVER ({rfm_part}ORDER BY days_since_last_order ASC, customer_key ASC) AS INT) AS rfm_recency_score,
            CAST(NTILE(5) OVER ({rfm_part}ORDER BY total_orders DESC, customer_key ASC) AS INT) AS rfm_frequency_score,
            CAST(NTILE(5) OVER ({rfm_part}ORDER BY total_revenue DESC, customer_key ASC) AS INT) AS rfm_monetary_score
        FROM (
            SELECT
                cg.customer_key,
                cg.customer_name,
                cg.market_segment,
                cg.nation_name,
                cg.region_name,
                cg.account_balance,
                COUNT(o.o_orderkey) AS total_orders,
                COALESCE(CAST(ROUND(CAST(SUM(CAST(o.o_totalprice AS DOUBLE)) AS DECIMAL(38,6)), 2) AS DOUBLE), CAST(0 AS DOUBLE)) AS total_revenue,
                COALESCE(CAST(ROUND(CAST(AVG(CAST(o.o_totalprice AS DOUBLE)) AS DECIMAL(38,6)), 2) AS DOUBLE), CAST(0 AS DOUBLE)) AS avg_order_value,
                MIN(o.o_orderdate) AS first_order_date,
                MAX(o.o_orderdate) AS last_order_date,
                CAST(date_diff('day', MAX(o.o_orderdate), DATE '{as_of}') AS INT) AS days_since_last_order,
                CASE WHEN COUNT(o.o_orderkey) > 1
                     THEN CAST(ROUND(CAST(CAST(date_diff('day', MIN(o.o_orderdate), MAX(o.o_orderdate)) AS DOUBLE)
                          / (COUNT(o.o_orderkey) - CAST(1.0 AS DOUBLE)) AS DECIMAL(38,6)), 2) AS DOUBLE)
                     ELSE NULL
                END AS order_frequency_days,
                COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS fulfilled_orders,
                COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS open_orders,
                COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS partial_orders,
                CASE WHEN COUNT(o.o_orderkey) > 0
                     THEN CAST(ROUND(CAST(CAST(100.0 AS DOUBLE) * COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END)
                          / COUNT(o.o_orderkey) AS DECIMAL(38,6)), 2) AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE)
                END AS fulfillment_rate,
                CAST(date_diff('day', MIN(o.o_orderdate), MAX(o.o_orderdate)) AS INT) AS customer_tenure_days
            FROM (
                SELECT
                    c.c_custkey AS customer_key,
                    c.c_name AS customer_name,
                    c.c_mktsegment AS market_segment,
                    c.c_acctbal AS account_balance,
                    n.n_name AS nation_name,
                    r.r_name AS region_name
                FROM b_customers c
                LEFT JOIN b_nation n ON c.c_nationkey = n.n_nationkey
                LEFT JOIN b_region r ON n.n_regionkey = r.r_regionkey
            ) cg
            LEFT JOIN b_orders o ON cg.customer_key = o.o_custkey
            GROUP BY cg.customer_key, cg.customer_name, cg.market_segment,
                     cg.nation_name, cg.region_name, cg.account_balance
        )
        WHERE total_orders > 0
    )"""


def silver_customer_orders_oracle_ctes(
    batch_id: str = FIXED_BATCH_ID,
    as_of_date: str = AS_OF_DATE,
    rfm_part: str = "",
) -> dict[str, str]:
    """``rfm_part``: SQL fragment partitioning the RFM quintile windows
    ("" = reference-global; "PARTITION BY region_name " = scoped variant)."""
    bronze = BRONZE_ORACLE_CTES(batch_id)
    return {
        "b_customers": bronze["b_customers"],
        "b_orders": bronze["b_orders"],
        "b_nation": bronze["b_nation"],
        "b_region": bronze["b_region"],
        "s_customer_orders": _SILVER_CO_CTE.format(
            batch_id=batch_id,
            as_of=as_of_date,
            refined_at=AUDIT_REFINED_AT,
            rfm_part=rfm_part,
        ),
    }


def silver_customer_orders_oracle_sql(
    batch_id: str = FIXED_BATCH_ID, as_of_date: str = AS_OF_DATE
) -> str:
    return with_clause(
        silver_customer_orders_oracle_ctes(batch_id, as_of_date),
        "SELECT " + replace_cast({"account_balance": "DOUBLE"}) + " FROM s_customer_orders",
    )


def silver_customer_orders_rfm_scoped_oracle_sql(
    batch_id: str = FIXED_BATCH_ID, as_of_date: str = AS_OF_DATE
) -> str:
    return with_clause(
        silver_customer_orders_oracle_ctes(
            batch_id, as_of_date, rfm_part="PARTITION BY region_name "
        ),
        "SELECT " + replace_cast({"account_balance": "DOUBLE"}) + " FROM s_customer_orders",
    )
