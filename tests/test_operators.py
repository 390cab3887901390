"""Shared operator primitives: skew tools are semantics-preserving, and
keep-latest dedup honors its contract on adversarial input (hypothesis)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_incremental_lakehouse_spark.operators import (
    dedup_latest,
    salted_count_distinct,
    salted_join,
)
from databricks_incremental_lakehouse_spark.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_smoke):
    """Salted fact-dim join == plain join on a real skewed-ish key
    (orders.o_custkey), for inner and left."""
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    for how in ("inner", "left"):
        plain = orders.join(cust, ["o_custkey"], how)
        salted = salted_join(orders, cust, ["o_custkey"], n_salts=4, how=how)
        assert sorted(salted.columns) == sorted(plain.columns)
        assert salted.count() == plain.count()
        assert (
            salted.exceptAll(plain).count() == 0
            and plain.exceptAll(salted).count() == 0
        )


def test_salted_count_distinct_matches_exact(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    exact = {
        r.l_orderkey: r.d
        for r in li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_partkey").alias("d"))
        .collect()
    }
    salted = {
        r.l_orderkey: r.distinct_l_partkey
        for r in salted_count_distinct(
            li, ["l_orderkey"], "l_partkey", n_salts=4
        ).collect()
    }
    assert salted == exact


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=0, max_value=3),  # version
            st.text(alphabet="abc", max_size=3),  # payload
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_latest_property(spark, rows):
    """Exactly one survivor per key; the survivor is the minimal row under
    the ASC (version, payload) tiebreak ordering."""
    df = spark.createDataFrame(rows, "k int, v int, p string")
    out = dedup_latest(df, keys=["k"], tiebreak_cols=["v", "p"]).collect()
    by_key = {}
    for k, v, p in rows:
        by_key.setdefault(k, []).append((v, p))
    assert len(out) == len(by_key)
    for r in out:
        assert (r.v, r.p) == min(by_key[r.k])
