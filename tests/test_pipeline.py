"""End-to-end pipeline runs: both DAGs materialize and QC passes."""

import os

from databricks_incremental_lakehouse_spark.pipelines import (
    LakehouseConfig,
    create_gold_views,
    database_name,
    register_warehouse,
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

    # catalog DDL surface: every materialized table queryable via spark.sql
    registered = register_warehouse(spark, cfg)
    assert len(registered) == 15  # 8 bronze + 3 silver + 4 gold
    bronze_db = database_name(cfg, "extract")
    n = spark.sql(f"SELECT count(*) AS n FROM {bronze_db}.orders").first().n
    assert n == spark.read.parquet(cfg.table_path("extract", "orders")).count()
    gold_db = database_name(cfg, "views")
    assert (
        spark.sql(f"SELECT * FROM {gold_db}.vw_monthly_sales_trends").count() > 0
    )
    # the PARTITIONED silver fact must be queryable through the catalog —
    # registration without partition recovery yields an empty table
    silver_db = database_name(cfg, "refined")
    n_sql = spark.sql(f"SELECT count(*) AS n FROM {silver_db}.order_details").first().n
    assert n_sql == spark.read.parquet(od_dir).count() and n_sql > 0
    # idempotent re-registration
    assert len(register_warehouse(spark, cfg)) == 15

    # catalog statistics persisted for the cost-based optimizer: rowCount
    # must match the data (size-only stats would leave rowCount absent)
    det = spark.sql(f"DESCRIBE TABLE EXTENDED {bronze_db}.orders").collect()
    stats = next(r.data_type for r in det if r.col_name == "Statistics")
    assert f"{n} rows" in stats
    # with stats + CBO on, the dimension side of a catalog-table join is
    # chosen for broadcast without any hint
    plan = (
        spark.sql(
            f"SELECT * FROM {bronze_db}.orders o JOIN {bronze_db}.customers c "
            "ON o.o_custkey = c.c_custkey"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan

    # reference-shaped NON-materialized gold views (CREATE OR REPLACE VIEW,
    # vw_revenue_by_region.py:20-23): recompute lazily from silver, match
    # the materialized snapshot, and write nothing
    view_names = create_gold_views(spark, cfg)
    assert "vw_monthly_sales_trends" in view_names
    live = spark.sql("SELECT * FROM vw_monthly_sales_trends")
    mat = spark.read.parquet(views).drop("_refined_at")
    assert live.count() == mat.count()
    assert sorted(c for c in live.columns) == sorted(
        c for c in mat.columns if c != "_refined_at"
    )


def test_stage_retry_and_run_summary():
    """max_retries/retry_delay_seconds from the config are honored (the
    reference declares but never wires them), and the formatted summary
    mirrors run_sales_analytics.py:146-160."""
    from databricks_incremental_lakehouse_spark.pipelines.runner import (
        _run_stage,
        format_run_summary,
    )

    results = {}
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")

    _run_stage(results, "flaky_stage", flaky, max_retries=3, retry_delay=0)
    assert results["flaky_stage"]["status"] == "SUCCESS"
    assert results["flaky_stage"]["attempts"] == 3

    def always_fails():
        raise RuntimeError("boom")

    _run_stage(results, "bad_stage", always_fails, max_retries=1, retry_delay=0)
    assert results["bad_stage"]["status"] == "FAILED"
    assert results["bad_stage"]["attempts"] == 2
    assert "boom" in results["bad_stage"]["error"]

    out = format_run_summary("sales_analytics", results, env="dev")
    assert "PIPELINE SUMMARY: sales_analytics" in out
    assert "flaky_stage" in out and "OK" in out
    assert "bad_stage" in out and "FAIL" in out
    assert "FAILED (1 failures)" in out


def test_revenue_anomaly_zscore(spark, sf_correct):
    """z-scores must match a python recomputation over daily totals and
    the flag must fire on this corpus (and only above the threshold)."""
    import statistics

    from databricks_incremental_lakehouse_spark.quality.checks import (
        ANOMALY_Z,
        qc_revenue_anomaly,
    )

    rows = qc_revenue_anomaly(spark, sf_correct).collect()
    totals = {r.order_date: float(r.daily_revenue) for r in rows}
    mu = statistics.fmean(totals.values())
    sd = statistics.stdev(totals.values())
    flagged = 0
    for r in rows:
        z = (totals[r.order_date] - mu) / sd
        assert abs(r.z_score - z) < 1e-3
        assert r.is_anomaly == (abs(r.z_score) > ANOMALY_Z)
        flagged += r.is_anomaly
    assert 0 < flagged < len(rows)


def test_fused_qc_equals_family_union(spark, sf_correct):
    """The fused one-aggregate-per-table QC plan must emit exactly the
    per-family union's labeled rows (pinned `now` so freshness values
    cannot straddle a wall-clock second between the two computations)."""
    from functools import reduce

    from pyspark.sql import DataFrame

    from databricks_incremental_lakehouse_spark.constants import QC_AS_OF_NOW
    from databricks_incremental_lakehouse_spark.quality.checks import (
        _fused_report,
        qc_business_rules,
        qc_freshness,
        qc_null_checks,
        qc_referential_integrity,
        qc_row_counts,
        qc_sources,
    )

    src = qc_sources(spark, sf_correct)
    union = reduce(
        DataFrame.unionAll,
        [
            qc_row_counts(spark, sf_correct, src),
            qc_null_checks(spark, sf_correct, src),
            qc_referential_integrity(spark, sf_correct, src),
            qc_business_rules(spark, sf_correct, src),
            qc_freshness(spark, sf_correct, src, now=QC_AS_OF_NOW),
        ],
    )
    fused = _fused_report(spark, sf_correct, src, now=QC_AS_OF_NOW)
    u = {tuple(r) for r in union.collect()}
    f = {tuple(r) for r in fused.collect()}
    assert f == u
    assert len(f) == len(union.collect())
