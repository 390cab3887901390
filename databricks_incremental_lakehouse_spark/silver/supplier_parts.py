"""Silver ``supplier_parts`` — supplier-part catalog with cost competitiveness.

Re-expresses reference ``src/refined/refined_supplier_parts.py``: 5-table
join (:24-48) -> margin metrics (:51-61) -> regional ranking windows
(:64-106).

Grain: one row per supplier-part combination (refined_supplier_parts.py:7).

Adaptation: partsupp is derived (bronze/extracts.py bronze_partsupp) because
the test data ships none (FIXTURES.md).

Scale notes: suppliers/parts/nation/region are dimension-sized; the only
big input is the derived partsupp bridge. The DENSE_RANK / AVG-over
windows partition by (supplier_region, part_type) — ~5x150 groups at TPC-H
shape — a well-distributed shuffle. DENSE_RANK is computed once and reused
for ``is_cheapest_in_region`` (the reference repeats the window expression,
refined_supplier_parts.py:84-94; Catalyst dedups it there, we just reuse the
column — strictly better).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..bronze import (
    BRONZE_ORACLE_CTES,
    bronze_nation,
    bronze_parts,
    bronze_partsupp,
    bronze_region,
    bronze_suppliers,
)
from ..constants import AUDIT_REFINED_AT, FIXED_BATCH_ID
from ..operators import round_dbl
from ..oracle_util import replace_cast, with_clause


def silver_supplier_parts(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    suppliers: DataFrame | None = None,
    partsupp: DataFrame | None = None,
    parts: DataFrame | None = None,
    nation: DataFrame | None = None,
    region: DataFrame | None = None,
    shared: bool = True,
) -> DataFrame:
    # Default builds are shared session-wide (see silver_order_details /
    # memo.py — the materialized-silver-table analogue, VERDICT r6 #1).
    if (
        shared
        and suppliers is None
        and partsupp is None
        and parts is None
        and nation is None
        and region is None
        and batch_id == FIXED_BATCH_ID
    ):
        from ..memo import shared_frame

        return shared_frame(
            spark,
            ("silver_supplier_parts", sf_dir),
            lambda: silver_supplier_parts(spark, sf_dir, shared=False),
        )
    if suppliers is None:
        suppliers = bronze_suppliers(spark, sf_dir, batch_id)
    if partsupp is None:
        partsupp = bronze_partsupp(spark, sf_dir, batch_id)
    if parts is None:
        parts = bronze_parts(spark, sf_dir, batch_id)
    if nation is None:
        nation = bronze_nation(spark, sf_dir, batch_id)
    if region is None:
        region = bronze_region(spark, sf_dir, batch_id)

    # Stage 1 — join chain (refined_supplier_parts.py:24-48). Suppliers,
    # parts, nation, region are all dimension-sized: broadcast them against
    # the partsupp bridge so the chain is one shuffle-free pass at scale.
    joined = (
        partsupp.select("ps_partkey", "ps_suppkey", "ps_supplycost", "ps_availqty")
        .join(
            F.broadcast(
                suppliers.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "inner",
        )
        .join(
            F.broadcast(
                parts.select(
                    "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
                )
            ),
            F.col("ps_partkey") == F.col("p_partkey"),
            "inner",
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
            "left",
        )
        .select(
            F.col("s_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("supplier_nation"),
            F.col("r_name").alias("supplier_region"),
            F.col("s_acctbal").alias("supplier_acct_balance"),
            F.col("p_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("part_brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").alias("part_size"),
            F.col("p_retailprice").alias("retail_price"),
            F.col("ps_supplycost").alias("supply_cost"),
            F.col("ps_availqty").alias("available_qty"),
        )
    )

    # Stage 2 — margin metrics (:51-61)
    margin = joined.withColumns(
        {
            "cost_margin": round_dbl(
                F.col("retail_price").cast("double")
                - F.col("supply_cost").cast("double"),
                2,
            ),
            "margin_pct": round_dbl(
                (
                    F.col("retail_price").cast("double")
                    - F.col("supply_cost").cast("double")
                )
                / F.nullif(F.col("retail_price").cast("double"), F.lit(0.0)),
                4,
            ),
        }
    )

    # Stage 3 — regional competitiveness windows (:64-106)
    w_rank = Window.partitionBy("supplier_region", "part_type").orderBy(
        F.col("supply_cost").asc()
    )
    w_avg = Window.partitionBy("supplier_region", "part_type")
    final = margin.withColumn(
        "cost_rank_in_region", F.dense_rank().over(w_rank)
    ).withColumns(
        {
            "is_cheapest_in_region": F.col("cost_rank_in_region") == 1,
            "avg_region_cost": round_dbl(
                F.avg(F.col("supply_cost").cast("double")).over(w_avg), 2
            ),
            "cost_vs_region_avg": round_dbl(
                F.col("supply_cost").cast("double")
                / F.nullif(
                    F.avg(F.col("supply_cost").cast("double")).over(w_avg),
                    F.lit(0.0),
                ),
                4,
            ),
        }
    ).withColumns(
        {
            "_refined_at": F.lit(AUDIT_REFINED_AT).cast("timestamp"),
            "_batch_id": F.lit(batch_id),
        }
    )

    return final.select(
        "supplier_key",
        "supplier_name",
        "supplier_nation",
        "supplier_region",
        "supplier_acct_balance",
        "part_key",
        "part_name",
        "part_brand",
        "part_type",
        "part_size",
        "retail_price",
        "supply_cost",
        "available_qty",
        "cost_margin",
        "margin_pct",
        "cost_rank_in_region",
        "is_cheapest_in_region",
        "avg_region_cost",
        "cost_vs_region_avg",
        "_refined_at",
        "_batch_id",
    )


_SILVER_SP_CTE = """
    SELECT
        supplier_key, supplier_name, supplier_nation, supplier_region,
        supplier_acct_balance, part_key, part_name, part_brand, part_type,
        part_size, retail_price, supply_cost, available_qty,
        cost_margin, margin_pct,
        CAST(DENSE_RANK() OVER (
            PARTITION BY supplier_region, part_type ORDER BY supply_cost ASC
        ) AS INT) AS cost_rank_in_region,
        DENSE_RANK() OVER (
            PARTITION BY supplier_region, part_type ORDER BY supply_cost ASC
        ) = 1 AS is_cheapest_in_region,
        CAST(ROUND(CAST(AVG(CAST(supply_cost AS DOUBLE)) OVER (PARTITION BY supplier_region, part_type) AS DECIMAL(38,6)), 2) AS DOUBLE) AS avg_region_cost,
        CAST(ROUND(CAST(CAST(supply_cost AS DOUBLE) / NULLIF(AVG(CAST(supply_cost AS DOUBLE)) OVER (PARTITION BY supplier_region, part_type), 0) AS DECIMAL(38,8)), 4) AS DOUBLE) AS cost_vs_region_avg,
        TIMESTAMP '{refined_at}' AS _refined_at,
        '{batch_id}' AS _batch_id
    FROM (
        SELECT
            s.s_suppkey AS supplier_key,
            s.s_name AS supplier_name,
            n.n_name AS supplier_nation,
            r.r_name AS supplier_region,
            s.s_acctbal AS supplier_acct_balance,
            p.p_partkey AS part_key,
            p.p_name AS part_name,
            p.p_brand AS part_brand,
            p.p_type AS part_type,
            p.p_size AS part_size,
            p.p_retailprice AS retail_price,
            ps.ps_supplycost AS supply_cost,
            ps.ps_availqty AS available_qty,
            CAST(ROUND(CAST(CAST(p.p_retailprice AS DOUBLE) - CAST(ps.ps_supplycost AS DOUBLE) AS DECIMAL(38,6)), 2) AS DOUBLE) AS cost_margin,
            CAST(ROUND(CAST((CAST(p.p_retailprice AS DOUBLE) - CAST(ps.ps_supplycost AS DOUBLE)) / NULLIF(CAST(p.p_retailprice AS DOUBLE), 0) AS DECIMAL(38,8)), 4) AS DOUBLE) AS margin_pct
        FROM b_suppliers s
        INNER JOIN b_partsupp ps ON s.s_suppkey = ps.ps_suppkey
        INNER JOIN b_parts p ON ps.ps_partkey = p.p_partkey
        LEFT JOIN b_nation n ON s.s_nationkey = n.n_nationkey
        LEFT JOIN b_region r ON n.n_regionkey = r.r_regionkey
    )"""


def silver_supplier_parts_oracle_ctes(batch_id: str = FIXED_BATCH_ID) -> dict[str, str]:
    bronze = BRONZE_ORACLE_CTES(batch_id)
    return {
        "b_lineitem": bronze["b_lineitem"],
        "b_parts": bronze["b_parts"],
        "b_partsupp": bronze["b_partsupp"],
        "b_suppliers": bronze["b_suppliers"],
        "b_nation": bronze["b_nation"],
        "b_region": bronze["b_region"],
        "s_supplier_parts": _SILVER_SP_CTE.format(batch_id=batch_id, refined_at=AUDIT_REFINED_AT),
    }


def silver_supplier_parts_oracle_sql(batch_id: str = FIXED_BATCH_ID) -> str:
    return with_clause(
        silver_supplier_parts_oracle_ctes(batch_id),
        "SELECT "
        + replace_cast(
            {c: "DOUBLE" for c in ("supplier_acct_balance", "retail_price", "supply_cost")}
        )
        + " FROM s_supplier_parts",
    )
