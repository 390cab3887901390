"""Capture ``.explain("formatted")`` for named registry queries into
plans/<tag>/<query>_<suffix>.txt — the before/after evidence files the
optimization rounds commit (the judge checks plan claims against these).

Usage: python scripts/capture_plans.py <tag> <suffix> name1,name2,...
       python scripts/capture_plans.py r13 before bi_tpch_q1,graph_pagerank

Names may also be pseudo-queries for the pipeline stages:
  pipeline:<stage> with stage in {order_details, customer_orders,
  supplier_parts, clv, revenue, monthly, supplier_perf} — the gold/silver
  builder frames as the pipeline runner composes them (memo bypassed via
  shared=False where the builder exposes it, so the captured plan is the
  real lineage, not an InMemoryRelation read).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_incremental_lakehouse_spark.registry import QUERIES  # noqa: E402
from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pipeline_frame(spark, sf_dir: str, stage: str):
    from databricks_incremental_lakehouse_spark.gold import (
        vw_customer_lifetime_value,
        vw_monthly_sales_trends,
        vw_revenue_by_region,
        vw_supplier_performance,
    )
    from databricks_incremental_lakehouse_spark.silver.customer_orders import (
        silver_customer_orders,
    )
    from databricks_incremental_lakehouse_spark.silver.order_details import (
        silver_order_details,
    )
    from databricks_incremental_lakehouse_spark.silver.supplier_parts import (
        silver_supplier_parts,
    )

    if stage == "order_details":
        return silver_order_details(spark, sf_dir, shared=False)
    if stage == "customer_orders":
        return silver_customer_orders(spark, sf_dir, shared=False)
    if stage == "supplier_parts":
        return silver_supplier_parts(spark, sf_dir)
    if stage == "clv":
        return vw_customer_lifetime_value(spark, sf_dir)
    if stage == "revenue":
        return vw_revenue_by_region(spark, sf_dir)
    if stage == "monthly":
        return vw_monthly_sales_trends(spark, sf_dir)
    if stage == "supplier_perf":
        return vw_supplier_performance(spark, sf_dir)
    raise KeyError(stage)


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name.startswith("pipeline:"):
            df = _pipeline_frame(spark, sf_dir, name.split(":", 1)[1])
            fname = f"pipeline_{name.split(':', 1)[1]}_{suffix}.txt"
        else:
            df = QUERIES[name](spark, sf_dir)
            fname = f"{name}_{suffix}.txt"
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, fname), "w") as fh:
            fh.write(plan)
        print(f"wrote plans/{tag}/{fname} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
