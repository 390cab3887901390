"""Bronze layer: structure + DuckDB-oracle parity (driver-style)."""

import pytest

from databricks_incremental_lakehouse_spark.bronze import (
    BRONZE_BUILDERS,
    bronze_lineitem,
    bronze_oracle_sql,
)
from tests.parity import compare

TABLES = list(BRONZE_BUILDERS)


@pytest.mark.parametrize("table", TABLES)
def test_bronze_parity(spark, sf_correct, table):
    df = BRONZE_BUILDERS[table](spark, sf_correct)
    compare(df, bronze_oracle_sql(table), sf_correct, name=f"bronze_{table}")


def test_lineitem_dedup_removes_duplicates(spark, sf_correct):
    df = bronze_lineitem(spark, sf_correct)
    n = df.count()
    keys = df.select("l_orderkey", "l_linenumber").distinct().count()
    assert n == keys, "dedup must leave exactly one row per composite key"
    assert n == 45832  # known distinct-key count at sf0.01
