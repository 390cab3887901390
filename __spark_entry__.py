"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``databricks_incremental_lakehouse_spark.registry``; this
module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the monthly sales trend view
    (exercises bronze dedup -> silver order_details -> full window battery)."""
    from databricks_incremental_lakehouse_spark.gold import vw_monthly_sales_trends
    from databricks_incremental_lakehouse_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return vw_monthly_sales_trends(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from databricks_incremental_lakehouse_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    from databricks_incremental_lakehouse_spark.registry import ORACLE

    return dict(ORACLE)
