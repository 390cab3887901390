"""Classic TPC-H analyst queries (Q1, Q3, Q5, Q6, Q10, Q12, Q14) over the
raw tables.

Beyond the reference's own four BI queries: the warehouse should answer the
standard analyst suite unchanged, so seven canonical TPC-H shapes are
registered as first-class oracle-checked queries — Q1 (scan-heavy grouped
aggregate battery), Q3 (selective 3-way join + top-k), Q5 (6-way
star join with a cross-dimension equality), Q6 (pure scan-filter
single-row aggregate), Q10 (returned-item top-k over a 4-way join),
Q12 (conditional two-way priority counts), Q14 (promo revenue ratio).
Adaptations to the driver corpus, FIXTURES.md-style: the date domain is
1995-2001 (cutoffs shifted accordingly), ``orders`` carries
``o_orderpriority`` instead of TPC-H's ``o_shippriority``, customer has
no address/phone/comment (Q10 drops them), and lineitem has no
``l_shipmode``/``l_commitdate``/``l_receiptdate`` — Q12 groups by
``l_linestatus`` with the date predicate on ``l_shipdate`` instead,
keeping the join + conditional-aggregation shape.

Parity discipline: SUM over raw DOUBLE columns is addition-order-dependent
and therefore NOT portable across engines; every summed measure is cast
per-row to the DECIMAL(38,10) grid (wide enough to hold the double's value
exactly as both engines render it — the ``operators.rounding`` contract),
summed exactly in decimal, rounded to the cent grid (scale 2), and only
then cast to DOUBLE: a DECIMAL(38,10) sum in the 1e8 range carries an
int128 payload beyond double's 53-bit mantissa, and the engines' decimal
-> double conversions round that excess differently (DuckDB divides a
lossy int128->double by 1e10); at scale 2 the payload is exactly
representable and both conversions agree bit-for-bit. Averages divide the
boundary doubles with mirrored operand order and round through the
portable grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import round_dbl, round_dbl_sql
from .tables import load_table

_DEC = "decimal(38,10)"

Q1_CUTOFF = "2001-09-02"  # classic: 1998-09-02, shifted into the data's domain
Q3_DATE = "1997-03-15"  # classic: 1995-03-15
Q5_LO, Q5_HI = "1997-01-01", "1998-01-01"  # classic: 1994 window
Q5_REGION = "ASIA"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


_DISC_SQL = "l_extendedprice * (1.0 - l_discount)"


def bi_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report — the scan-dominated grouped
    aggregate battery. One pass, map-side partial aggregation, group count
    bounded by the 2x2 flag domain."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
    )
    charge = _disc_price() * (F.lit(1.0) + F.col("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("sum_base_price"),
        F.sum(_disc_price().cast(_DEC)).alias("sum_disc_price"),
        F.sum(charge.cast(_DEC)).alias("sum_charge"),
        F.sum(F.col("l_discount").cast(_DEC)).alias("sum_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    cnt = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).cast("double").alias("sum_qty"),
        F.round("sum_base_price", 2).cast("double").alias("sum_base_price"),
        F.round("sum_disc_price", 2).cast("double").alias("sum_disc_price"),
        F.round("sum_charge", 2).cast("double").alias("sum_charge"),
        round_dbl(F.col("sum_qty").cast("double") / cnt, 6).alias("avg_qty"),
        round_dbl(F.col("sum_base_price").cast("double") / cnt, 6).alias("avg_price"),
        round_dbl(F.col("sum_disc").cast("double") / cnt, 6).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


TPCH_Q1_ORACLE = f"""
WITH agg AS (
    SELECT l_returnflag, l_linestatus,
        SUM(CAST(l_quantity AS DECIMAL(38,10))) AS sum_qty,
        SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS sum_base_price,
        SUM(CAST({_DISC_SQL} AS DECIMAL(38,10))) AS sum_disc_price,
        SUM(CAST({_DISC_SQL} * (1.0 + l_tax) AS DECIMAL(38,10))) AS sum_charge,
        SUM(CAST(l_discount AS DECIMAL(38,10))) AS sum_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
    CAST(ROUND(sum_qty, 2) AS DOUBLE) AS sum_qty,
    CAST(ROUND(sum_base_price, 2) AS DOUBLE) AS sum_base_price,
    CAST(ROUND(sum_disc_price, 2) AS DOUBLE) AS sum_disc_price,
    CAST(ROUND(sum_charge, 2) AS DOUBLE) AS sum_charge,
    {round_dbl_sql("CAST(sum_qty AS DOUBLE) / CAST(count_order AS DOUBLE)", 6)}
        AS avg_qty,
    {round_dbl_sql("CAST(sum_base_price AS DOUBLE) / CAST(count_order AS DOUBLE)", 6)}
        AS avg_price,
    {round_dbl_sql("CAST(sum_disc AS DOUBLE) / CAST(count_order AS DOUBLE)", 6)}
        AS avg_disc,
    CAST(count_order AS BIGINT) AS count_order
FROM agg
ORDER BY l_returnflag, l_linestatus"""


def bi_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: shipping-priority top-10 — selective filters on all three
    inputs, two equi-joins, order-grain revenue aggregate, exact top-k on
    the decimal revenue (TakeOrderedAndProject; ties broken by date then
    order key on both engines)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price().cast(_DEC)).alias("revenue"))
    )
    return (
        agg.orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round("revenue", 2).cast("double").alias("revenue"),
        )
    )


TPCH_Q3_ORACLE = f"""
WITH agg AS (
    SELECT l_orderkey, o_orderdate, o_orderpriority,
        SUM(CAST({_DISC_SQL} AS DECIMAL(38,10))) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l_shipdate > TIMESTAMP '{Q3_DATE}'
    GROUP BY 1, 2, 3
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
    CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue
FROM agg
ORDER BY agg.revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10"""


def bi_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier volume per nation — the 6-way star join
    with the cross-dimension ``s_nationkey = c_nationkey`` equality. The
    geo dimensions broadcast; the supplier join key includes the nation
    equality so Catalyst plans one hash join, not a filter over a wider
    join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_HI).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price().cast(_DEC)).alias("revenue"))
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("n_name").asc()).select(
        "n_name", F.round("revenue", 2).cast("double").alias("revenue")
    )


TPCH_Q5_ORACLE = f"""
WITH agg AS (
    SELECT n_name, SUM(CAST({_DISC_SQL} AS DECIMAL(38,10))) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_LO}'
      AND o_orderdate < TIMESTAMP '{Q5_HI}'
    GROUP BY 1
)
SELECT n_name, CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue
FROM agg
ORDER BY agg.revenue DESC, n_name ASC"""


Q6_LO, Q6_HI = "1997-01-01", "1998-01-01"  # classic: 1994 window
Q6_DISC_LO, Q6_DISC_HI, Q6_QTY = 0.05, 0.07, 24.0
Q10_LO, Q10_HI = "1996-10-01", "1997-01-01"  # classic: 1993-10 quarter
Q12_LO, Q12_HI = "1997-01-01", "1998-01-01"  # classic: 1994, on l_receiptdate
Q14_LO, Q14_HI = "1997-09-01", "1997-10-01"  # classic: 1995-09


def bi_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting revenue change — pure scan-filter-aggregate,
    zero joins, one output row. The plan to want at 100 TB: every
    predicate pushed to the parquet scan, map-side partial sum, a single
    1-row exchange (tests/test_plans.py locks no-exchange-before-partial-
    agg and the pushed filters)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_HI).cast("timestamp"))
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY)
    )
    return li.agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC)), 2
        )
        .cast("double")
        .alias("revenue")
    )


TPCH_Q6_ORACLE = f"""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,10))), 2)
       AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}' AND l_shipdate < TIMESTAMP '{Q6_HI}'
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}"""


def bi_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item reporting — top-20 customers by revenue
    lost to returns in one quarter. Order-quarter filter prunes orders
    before the fact join; nation broadcasts; exact top-k via
    TakeOrderedAndProject (plan-locked). Adaptation: customer
    address/phone/comment columns don't exist in the driver corpus and
    are dropped from the classic output list; c_custkey breaks revenue
    ties deterministically on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_HI).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price().cast(_DEC)).alias("revenue"))
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("revenue", 2).cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


TPCH_Q10_ORACLE = f"""
WITH agg AS (
    SELECT c_custkey, c_name, c_acctbal, n_name,
        SUM(CAST({_DISC_SQL} AS DECIMAL(38,10))) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{Q10_LO}'
      AND o_orderdate < TIMESTAMP '{Q10_HI}'
    GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, c_name,
    CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue,
    CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
FROM agg
ORDER BY agg.revenue DESC, c_custkey ASC
LIMIT 20"""


def bi_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: priority distribution of shipments — orders ⋈ lineitem
    with a year predicate, conditional counts of high- vs low-priority
    orders. Adaptation (module docstring): the corpus has no
    ``l_shipmode``/``l_commitdate``/``l_receiptdate``, so the group key is
    ``l_linestatus`` and the date window sits on ``l_shipdate`` — same
    join + CASE-aggregation shape, integer outputs (no float portability
    surface at all)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_HI).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


TPCH_Q12_ORACLE = f"""
SELECT l_linestatus,
    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_LO}' AND l_shipdate < TIMESTAMP '{Q12_HI}'
GROUP BY 1
ORDER BY 1"""


def bi_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion effect — one month of lineitem joined to part,
    ratio of PROMO revenue to total. Both sums accumulate on the exact
    decimal grid; the final percentage divides the cent-rounded doubles
    with mirrored operand order (module parity discipline) so the 6-dp
    result is bit-identical across engines. Single-row output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_HI).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("p_type").startswith("PROMO"), _disc_price()
                    )
                    .otherwise(F.lit(0.0))
                    .cast(_DEC)
                ),
                2,
            )
            .cast("double")
            .alias("promo"),
            F.round(F.sum(_disc_price().cast(_DEC)), 2)
            .cast("double")
            .alias("total"),
        )
    )
    return agg.select(
        round_dbl(F.lit(100.0) * F.col("promo") / F.col("total"), 6).alias(
            "promo_revenue_pct"
        )
    )


TPCH_Q14_ORACLE = f"""
WITH agg AS (
    SELECT
        CAST(ROUND(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC_SQL}
                            ELSE 0.0 END AS DECIMAL(38,10))), 2) AS DOUBLE) AS promo,
        CAST(ROUND(SUM(CAST({_DISC_SQL} AS DECIMAL(38,10))), 2) AS DOUBLE) AS total
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_LO}' AND l_shipdate < TIMESTAMP '{Q14_HI}'
)
SELECT {round_dbl_sql("CAST(100.0 AS DOUBLE) * promo / total", 6)} AS promo_revenue_pct
FROM agg"""


def register_all(register) -> None:
    register("bi_tpch_q1", bi_tpch_q1, TPCH_Q1_ORACLE)
    register("bi_tpch_q3", bi_tpch_q3, TPCH_Q3_ORACLE)
    register("bi_tpch_q5", bi_tpch_q5, TPCH_Q5_ORACLE)
    register("bi_tpch_q6", bi_tpch_q6, TPCH_Q6_ORACLE)
    register("bi_tpch_q10", bi_tpch_q10, TPCH_Q10_ORACLE)
    register("bi_tpch_q12", bi_tpch_q12, TPCH_Q12_ORACLE)
    register("bi_tpch_q14", bi_tpch_q14, TPCH_Q14_ORACLE)
