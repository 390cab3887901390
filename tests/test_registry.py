"""Full driver-contract simulation: every queries() entry vs its oracle."""

import pytest

import __spark_entry__ as entry_mod
from tests.parity import compare

NAMES = sorted(entry_mod.queries())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


@pytest.mark.parametrize("name", NAMES)
def test_query_oracle_parity(spark, sf_correct, name):
    q = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    df = q(spark, sf_correct)
    if oracle is None:
        # driver falls back to a rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
    else:
        compare(df, oracle, sf_correct, name=name)
