"""Classic TPC-H analyst queries (Q1, Q3, Q4, Q5, Q6, Q10, Q12, Q13, Q14,
Q15, Q17, Q18) over the raw tables.

Beyond the reference's own four BI queries: the warehouse should answer the
standard analyst suite unchanged, so twelve canonical TPC-H shapes are
registered as first-class oracle-checked queries — Q1 (scan-heavy grouped
aggregate battery), Q3 (selective 3-way join + top-k), Q4 (EXISTS
semi-join + priority counts), Q5 (6-way star join with a cross-dimension
equality), Q6 (pure scan-filter single-row aggregate), Q10 (returned-item
top-k over a 4-way join), Q12 (conditional two-way priority counts), Q13
(left-outer double aggregation / order-count distribution), Q14 (promo
revenue ratio), Q15 (top supplier via exact-decimal global max), Q17
(correlated per-part average as aggregate + join), Q18
(large-volume customers: HAVING semi-join + top-100).
Adaptations to the driver corpus, FIXTURES.md-style: the date domain is
1995-2001 (cutoffs shifted accordingly), ``orders`` carries
``o_orderpriority`` instead of TPC-H's ``o_shippriority``, customer has
no address/phone/comment (Q10 drops them; Q13's comment exclusion becomes
a priority exclusion), and lineitem has no
``l_shipmode``/``l_commitdate``/``l_receiptdate`` — Q12 groups by
``l_linestatus`` with the date predicate on ``l_shipdate`` instead, and
Q4's "problem line" becomes shipped >90 days after the order date —
keeping each query's join/aggregation shape.

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

from .constants import (
    AVAILQTY_BASE,
    AVAILQTY_MOD,
    SUPPLY_COST_BASE_PCT,
    SUPPLY_COST_PCT_MOD,
    SUPPLY_COST_PCT_SQL,
)
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


Q4_LO, Q4_HI = "1997-07-01", "1997-10-01"  # classic: 1993-07 quarter
Q4_LATE_DAYS = 90  # adapted lateness predicate (no commit/receipt dates)
Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"  # stands in for the comment filter
Q15_LO, Q15_HI = "1997-10-01", "1998-01-01"  # classic: 1996-01 quarter
Q18_QTY = 300.0  # classic threshold; non-vacuous at every driver SF


def bi_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking — orders in one quarter having at
    least one problem line, counted by priority. Adaptation (module
    docstring): the corpus has no ``l_commitdate``/``l_receiptdate``, so
    the EXISTS predicate is "a line shipped more than 90 days after the
    order date" — same shape: quarter-pruned orders scan, EXISTS as a
    LEFT SEMI join with a cross-table inequality, 5-group integer counts
    (fully portable, no float surface)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), Q4_LATE_DAYS)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_LO}' AND o_orderdate < TIMESTAMP '{Q4_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      -- date-cast mirrors Spark's date_add (which truncates a timestamp
      -- to its date before adding days); without it a time-of-day
      -- component would shift the boundary on one engine only
      AND l.l_shipdate > CAST(o.o_orderdate AS DATE) + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY 1
ORDER BY 1"""


def bi_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join with
    an ON-clause filter (customers with zero qualifying orders must appear
    as c_count=0), then a second aggregation over the first. Adaptation:
    the excluded-comment predicate becomes "priority <> '4-NOT
    SPECIFIED'" (no o_comment in the corpus). Integer outputs only."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


TPCH_Q13_ORACLE = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""


def bi_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier — quarter revenue per supplier, keep the
    supplier(s) achieving the global maximum. The max is computed on the
    EXACT decimal sum (bit-identical across engines) and joined back as a
    broadcast single row — no single-partition window over the supplier
    aggregate. Revenue rounds to cents only at the output boundary."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_disc_price().cast(_DEC)).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TPCH_Q15_ORACLE = f"""
WITH rev AS (
    SELECT l_suppkey, SUM(CAST({_DISC_SQL} AS DECIMAL(38,10))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_LO}' AND l_shipdate < TIMESTAMP '{Q15_HI}'
    GROUP BY 1
)
SELECT s_suppkey, s_name,
    CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM rev
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey"""


def bi_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers — orders whose total quantity
    exceeds 300, with customer context, top-100 by order value. The
    IN-subquery-with-HAVING is one aggregate + semi join; quantities are
    integral doubles, so their sums are exact in ANY addition order (no
    decimal grid needed; asserted against the corpus). Top-k plans as
    TakeOrderedAndProject with (o_totalprice desc, o_orderdate,
    o_orderkey) a deterministic total order."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


TPCH_Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
    CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
FROM (
    SELECT l_orderkey, SUM(l_quantity) AS total_qty
    FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {Q18_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100"""


Q17_BRAND = "Brand#4"  # classic Brand#23 + MED BOX container (no container col)


def bi_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — average yearly revenue
    lost if small orders (below 20% of a part's average order quantity)
    were not filled. The correlated scalar subquery becomes a per-part
    aggregate joined back to the brand-filtered lines. Adaptation: no
    ``p_container`` in the corpus, so the brand predicate alone selects
    the part population. Portability: quantities are integral doubles, so
    the per-part threshold ``0.2 * (sum/count)`` is bit-exact in any
    addition order on both engines; revenue sums on the decimal grid.

    At 100 TB: the per-part average aggregates the FULL lineitem (the
    classic query's semantics), one map-side-combined shuffle on
    l_partkey; the brand side prunes to ~1/25 of parts before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    thr = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2) * (F.sum("l_quantity") / F.count("l_quantity"))
        ).alias("qty_thr")
    )
    picked = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
    )
    total = picked.agg(
        F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2)
        .cast("double")
        .alias("t")
    )
    return total.select(
        round_dbl(F.col("t") / F.lit(7.0), 6).alias("avg_yearly")
    )


TPCH_Q17_ORACLE = f"""
WITH thr AS (
    SELECT l_partkey, 0.2 * (SUM(l_quantity) / COUNT(l_quantity)) AS qty_thr
    FROM lineitem GROUP BY 1
),
total AS (
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(38,10))), 2)
           AS DOUBLE) AS t
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thr a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}' AND l.l_quantity < a.qty_thr
)
SELECT {round_dbl_sql("t / CAST(7.0 AS DOUBLE)", 6)} AS avg_yearly FROM total"""


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_LO, Q7_HI = "1997-01-01", "1998-12-31"  # classic: 1995-01-01..1996-12-31
Q8_REGION = "AMERICA"  # r_regionkey 1 -> customer nations 1,6,11,16,21
Q8_NATION = "NATION_1"  # the market-share (supplier) nation; classic: BRAZIL
Q8_TYPE = "ECONOMY"  # corpus p_type domain is 6 plain values, no trigraphs
Q8_LO, Q8_HI = "1997-01-01", "1998-12-31"  # classic: 1995..1996


def bi_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: volume shipping between two nations — the one join shape
    the suite lacked: TWO independent nation dimensions (supplier's and
    customer's) with a cross-pair disjunction. Each nation dim broadcasts
    pre-filtered to the two names, so the disjunction filters a 2x2
    post-join space — never a cartesian; the fact-side work is the usual
    lineitem⋈orders⋈customer chain with the ship-date window pushed to
    the scan. Revenue sums on the exact decimal grid per the module
    parity discipline."""
    both = [Q7_NATION_A, Q7_NATION_B]
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit(Q7_HI).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.filter(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    shipped = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == Q7_NATION_A)
                & (F.col("cust_nation") == Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == Q7_NATION_B)
                & (F.col("cust_nation") == Q7_NATION_A)
            )
        )
    )
    agg = shipped.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(_disc_price().cast(_DEC)), 2).cast("double").alias("revenue"))
    return agg.orderBy("supp_nation", "cust_nation", "l_year").select(
        "supp_nation", "cust_nation", "l_year", "revenue"
    )


TPCH_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
    CAST(ROUND(SUM(CAST(volume AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(YEAR(l_shipdate) AS INT) AS l_year, {_DISC_SQL} AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
        OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
      AND l_shipdate >= TIMESTAMP '{Q7_LO}'
      AND l_shipdate <= TIMESTAMP '{Q7_HI}'
)
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


def bi_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — of all ECONOMY-part revenue sold
    into the AMERICA region's customers over two years, the fraction
    supplied by one nation, per order year. The 8-way join keeps every
    dimension broadcast (part is pre-filtered to 1/6 of the type domain
    and only p_partkey survives the projection; both nation copies and
    region are tiny); the share divides two cent-rounded decimal sums
    with mirrored operand order (the Q14 ratio discipline), so the 6-dp
    result is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q8_LO).cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit(Q8_HI).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    agg = vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == Q8_NATION, F.col("volume"))
                .otherwise(F.lit(0.0))
                .cast(_DEC)
            ),
            2,
        )
        .cast("double")
        .alias("nation_volume"),
        F.round(F.sum(F.col("volume").cast(_DEC)), 2)
        .cast("double")
        .alias("total_volume"),
    )
    return agg.orderBy("o_year").select(
        "o_year",
        "nation_volume",
        "total_volume",
        round_dbl(F.col("nation_volume") / F.col("total_volume"), 6).alias(
            "mkt_share"
        ),
    )


TPCH_Q8_ORACLE = f"""
WITH vol AS (
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
        {_DISC_SQL} AS volume, n2.n_name AS supp_nation
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
      AND o_orderdate >= TIMESTAMP '{Q8_LO}'
      AND o_orderdate <= TIMESTAMP '{Q8_HI}'
),
agg AS (
    SELECT o_year,
        CAST(ROUND(SUM(CAST(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume
                            ELSE 0.0 END AS DECIMAL(38,10))), 2) AS DOUBLE)
            AS nation_volume,
        CAST(ROUND(SUM(CAST(volume AS DECIMAL(38,10))), 2) AS DOUBLE)
            AS total_volume
    FROM vol GROUP BY 1
)
SELECT o_year, nation_volume, total_volume,
    {round_dbl_sql("nation_volume / total_volume", 6)} AS mkt_share
FROM agg ORDER BY o_year"""


Q9_NAME_PART = "red"  # classic: '%green%'; this corpus's color vocabulary
# ps_supplycost has no source table (FIXTURES.md:65-67); the declared cost
# basis is bronze_partsupp's per-(part, supplier) derivation (constants.py):
# round(p_retailprice * ((pk*3 + sk*11) % 41 + 50) / 100, 2). lineitem
# carries both keys, so Q9 computes the cost inline after the part join.


def bi_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit measure — the biggest join in the
    classic suite: name-filtered part ⋈ lineitem ⋈ supplier ⋈ orders ⋈
    nation, profit summed per supplier nation per order year. Adaptation:
    ``ps_supplycost`` uses the declared derivation above (no partsupp
    source). The filtered part dim and nation broadcast; profit terms
    accumulate on the exact decimal grid (each term is a product of
    grid-exact doubles, rounded per-row to the cent grid before the
    decimal SUM so both engines add identical decimals)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(Q9_NAME_PART))
        .select("p_partkey", "p_retailprice")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    supply_cost = round_dbl(
        F.col("p_retailprice")
        * (
            (F.col("l_partkey") * 3 + F.col("l_suppkey") * 11)
            % SUPPLY_COST_PCT_MOD
            + SUPPLY_COST_BASE_PCT
        ).cast("double")
        / F.lit(100.0),
        2,
    )
    profit = round_dbl(_disc_price() - supply_cost * F.col("l_quantity"), 2)
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(profit.cast(_DEC)), 2).cast("double").alias("sum_profit")
        )
    )
    return agg.orderBy(F.col("nation").asc(), F.col("o_year").desc()).select(
        "nation", "o_year", "sum_profit"
    )


TPCH_Q9_ORACLE = f"""
SELECT nation, o_year,
    CAST(ROUND(SUM(CAST(amount AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_profit
FROM (
    SELECT n.n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
        {round_dbl_sql(
            _DISC_SQL
            + " - "
            + round_dbl_sql(
                "p.p_retailprice * CAST((l_partkey * 3 + l_suppkey * 11)"
                f" % {SUPPLY_COST_PCT_MOD} + {SUPPLY_COST_BASE_PCT}"
                " AS DOUBLE) / 100.0",
                2,
            )
            + " * l_quantity",
            2,
        )} AS amount
    FROM lineitem
    JOIN part p ON l_partkey = p.p_partkey
    JOIN supplier s ON l_suppkey = s.s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%{Q9_NAME_PART}%'
)
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC"""


# Three (brand, quantity-band, size-band) disjuncts; classic Q19's
# container/shipmode predicates are absent from the corpus, so p_size
# carries the second per-branch dimension — same OR-of-ANDs shape.
Q19_BRANCHES = (
    ("Brand#1", 1.0, 11.0, 1, 15),
    ("Brand#2", 10.0, 20.0, 1, 25),
    ("Brand#3", 20.0, 30.0, 1, 35),
)


def bi_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: discounted revenue under a disjunction of conjunctive
    branch predicates — the OR-of-ANDs pushdown shape: the part-side
    brand/size disjunction prunes the broadcast dim, the lineitem
    quantity bounds ride the join filter, and the whole thing is ONE
    join + single-row aggregate (never three unioned scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = None
    for brand, qlo, qhi, slo, shi in Q19_BRANCHES:
        cond = (
            (F.col("p_brand") == brand)
            & F.col("l_quantity").between(qlo, qhi)
            & F.col("p_size").between(slo, shi)
        )
        branch = cond if branch is None else (branch | cond)
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.round(F.sum(_disc_price().cast(_DEC)), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    return agg


def _q19_branch_sql() -> str:
    parts = [
        f"(p_brand = '{b}' AND l_quantity BETWEEN {qlo} AND {qhi}"
        f" AND p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in Q19_BRANCHES
    ]
    return " OR ".join(parts)


TPCH_Q19_ORACLE = f"""
SELECT CAST(ROUND(SUM(CAST({_DISC_SQL} AS DECIMAL(38,10))), 2) AS DOUBLE)
    AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_q19_branch_sql()}"""


Q22_CUTOFF = "1999-01-01"  # "recent" orders start here; classic: 7-year window


def bi_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: global sales opportunity — customers with
    above-average positive account balance and NO recent orders, counted
    per nation. Adaptation: the corpus has no ``c_phone``, so the
    country-code grouping becomes the customer's nation (same shape: a
    1-row scalar average broadcast into the filter, an anti-join against
    recent orders, then a grouped count/sum). The scalar subquery
    broadcasts; the anti-join is the NOT EXISTS shape Q4 covers as
    EXISTS; balances sum on the exact decimal grid."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    # the scalar threshold goes through the exact decimal sum + portable
    # grid (a raw double AVG is addition-order-dependent across engines,
    # and a balance landing within an ulp of it would flip membership)
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        round_dbl(
            F.round(F.sum(F.col("c_acctbal").cast(_DEC)), 6).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_bal")
    )
    picked = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        picked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(_DEC)), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("nation")
    )


TPCH_Q22_ORACLE = f"""
SELECT n.n_name AS nation, COUNT(*) AS numcust,
    CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE)
        AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (
        SELECT {round_dbl_sql(
            "CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,10))), 6) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE)",
            6,
        )}
        FROM customer WHERE c_acctbal > 0.0
    )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}'
    )
GROUP BY 1
ORDER BY nation"""


# --- the partsupp-backed queries (Q2 / Q11 / Q16 / Q20 / Q21) -------------
#
# There is no partsupp source table (FIXTURES.md:65-67); the engine's
# declared derivation (constants.py:45-49) is the bridge. bronze_partsupp
# applies the SAME formulas to the CLEANED bronze lineitem for the pipeline
# path; this module applies them to the RAW tables, because the analyst
# suite — like every other TPC-H query here — reads raw sources. Both
# implementations reference the constants; a derivation change must touch
# constants.py, which is the single declared definition. The bridge:
# distinct (l_partkey, l_suppkey) pairs observed in lineitem,
#   cost_pct      = (ps_partkey*3 + ps_suppkey*11) % 41 + 50    [50..90]
#   ps_supplycost = round(p_retailprice * cost_pct/100, 2)  [portable grid]
#   ps_availqty   = (ps_partkey*7 + ps_suppkey*13) % 9901 + 50
# Under this derivation Q2/Q11/Q16/Q20/Q21 are fully non-degenerate: the
# cost varies per (part, supplier) — 11 is invertible mod 41, so two
# suppliers of one part tie only when their keys differ by a multiple of
# 41 — which makes Q2's correlated per-part MIN select a real minimum-cost
# supplier (VERDICT r6 #3; before r7 the cost was constant per part and Q2
# kept the whole tie set).


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived supplier-part bridge over raw tables; the distinct-pair
    scan of lineitem is shared session-wide (memo persist mode) so the
    five partsupp-bridge queries (Q2/Q9 aside, Q11/Q16/Q20 and their
    oracles' common CTE) pay the lineitem distinct once per session."""
    from .memo import shared_frame

    return shared_frame(
        spark, ("tpch_partsupp", sf_dir), lambda: _partsupp_build(spark, sf_dir)
    )


def _partsupp_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    return pairs.join(part, pairs.ps_partkey == F.col("p_partkey")).select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % AVAILQTY_MOD
            + AVAILQTY_BASE
        )
        .cast("int")
        .alias("ps_availqty"),
        round_dbl(
            F.col("p_retailprice")
            * (
                (F.col("ps_partkey") * 3 + F.col("ps_suppkey") * 11)
                % SUPPLY_COST_PCT_MOD
                + SUPPLY_COST_BASE_PCT
            ).cast("double")
            / F.lit(100.0),
            2,
        ).alias("ps_supplycost"),
    )


_PS_CTE = f"""
    SELECT ps_partkey, ps_suppkey,
        CAST((ps_partkey * 7 + ps_suppkey * 13) % {AVAILQTY_MOD}
             + {AVAILQTY_BASE} AS INT) AS ps_availqty,
        {round_dbl_sql(
            "p_retailprice * CAST(" + SUPPLY_COST_PCT_SQL + " AS DOUBLE) / 100.0",
            2,
        )}
            AS ps_supplycost
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) pairs
    JOIN part ON ps_partkey = p_partkey"""


Q2_SIZE, Q2_TYPE, Q2_REGION = 10, "STANDARD", "EUROPE"


def bi_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: minimum-cost supplier — the correlated per-part MIN
    joined back over the supplier bridge. The per-(part, supplier) cost
    derivation (module note above) makes the MIN select a real
    minimum-cost supplier per part; residual ties (suppkeys congruent
    mod 41) are resolved by the deterministic ordering."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE)
    ).select("p_partkey", "p_name")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q2_REGION
    )
    eu = (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    min_cost = eu.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eu.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", F.col("ps_partkey").alias("p_partkey"),
            "p_name", "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


TPCH_Q2_ORACLE = f"""
WITH ps AS ({_PS_CTE}),
eu AS (
    SELECT ps.ps_partkey, ps.ps_supplycost, p.p_name,
           s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{Q2_REGION}' AND p.p_size = {Q2_SIZE}
      AND p.p_type = '{Q2_TYPE}'
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, p_name, ps_supplycost
FROM eu
WHERE ps_supplycost = (
    SELECT MIN(ps_supplycost) FROM eu e2 WHERE e2.ps_partkey = eu.ps_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey ASC
LIMIT 100"""


Q11_NATION, Q11_FRACTION = "NATION_3", 0.001


def bi_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: important stock identification — per-part stock value
    for one nation's suppliers, kept where the value exceeds a fraction
    of the nation's total. The scalar total broadcasts back over the
    per-part aggregate; each product ``supplycost x availqty`` is an
    exact IEEE multiply (2-dp double x int), summed on the decimal
    grid."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION
    )
    scoped = (
        ps.join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    value = scoped.groupBy("ps_partkey").agg(
        F.round(
            F.sum((F.col("ps_supplycost") * F.col("ps_availqty")).cast(_DEC)), 2
        )
        .cast("double")
        .alias("value")
    )
    total = value.agg(
        round_dbl(
            F.round(F.sum(F.col("value").cast(_DEC)), 2).cast("double")
            * F.lit(Q11_FRACTION),
            6,
        ).alias("threshold")
    )
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .orderBy(F.col("value").desc(), F.col("ps_partkey").asc())
        .select("ps_partkey", "value")
    )


TPCH_Q11_ORACLE = f"""
WITH ps AS ({_PS_CTE}),
value AS (
    SELECT ps_partkey,
        CAST(ROUND(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,10))), 2)
             AS DOUBLE) AS value
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = '{Q11_NATION}'
    GROUP BY 1
)
SELECT ps_partkey, value FROM value
WHERE value > (
    SELECT {round_dbl_sql(
        "CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) * "
        + repr(Q11_FRACTION), 6)}
    FROM value
)
ORDER BY value DESC, ps_partkey ASC"""


Q16_EXCL_BRAND, Q16_EXCL_TYPE = "Brand#5", "PROMO"
Q16_SIZES = (1, 5, 10, 15, 20, 25)


def bi_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: parts/supplier relationship — distinct supplier count
    per (brand, type, size) over the bridge, excluding one brand, one
    type, and suppliers with a negative account balance (the corpus has
    no s_comment, so the classic complaints filter becomes the balance
    predicate — same anti-join shape). The filtered part dim broadcasts;
    the exclusion list is a broadcast anti-join."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", F.col("p_size").asc()
        )
    )


TPCH_Q16_ORACLE = f"""
WITH ps AS ({_PS_CTE})
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size ASC"""


Q20_NATION, Q20_NAME_PREFIX = "NATION_4", "red"
Q20_LO, Q20_HI = "1997-01-01", "1998-01-01"


def bi_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: potential part promotion — suppliers in one nation
    holding excess stock (availqty > half the quantity they shipped of
    that part in the year) of name-prefixed parts. The nested IN
    subqueries become semi-joins; half-quantities are exact (integral
    doubles x 0.5). Classic NULL semantics kept: a pair that shipped
    nothing in the window has no half-qty row and is excluded (inner
    join), exactly as ``> NULL`` excludes in SQL."""
    ps = _partsupp(spark, sf_dir)
    red_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    ).select("p_partkey")
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_HI).cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("sp_partkey"),
            F.col("l_suppkey").alias("sp_suppkey"),
        )
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    excess = (
        ps.join(F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("sp_partkey"))
            & (F.col("ps_suppkey") == F.col("sp_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == Q20_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        supp.join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


TPCH_Q20_ORACLE = f"""
WITH ps AS ({_PS_CTE})
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM ps
    WHERE ps_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
    )
    AND ps_availqty > (
        SELECT 0.5 * SUM(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '{Q20_LO}'
          AND l_shipdate < TIMESTAMP '{Q20_HI}'
    )
  )
ORDER BY s_name"""


Q21_NATION = "NATION_5"


def bi_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who kept orders waiting — late lines (shipped
    > 90 days after the order date, the Q4 lateness adaptation) in
    multi-supplier 'F' orders where NO other supplier was late. The
    classic EXISTS + NOT-EXISTS pair over the same fact becomes two
    per-order aggregates joined back (distinct-supplier count and the
    late-supplier set size) — the aggregate rewrite every engine's
    optimizer aims for, here stated directly; the DuckDB oracle runs the
    textbook correlated form, making this a cross-implementation
    semantics check like the AS-OF join. ``numwait`` counts qualifying
    late LINES per supplier (classic COUNT(*) grain)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lines_f = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
    late = lines_f.filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), Q4_LATE_DAYS)
    )
    n_supp = lines_f.groupBy(F.col("l_orderkey").alias("ok1")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_supp = late.groupBy(F.col("l_orderkey").alias("ok2")).agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == Q21_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    waiting = (
        late.join(n_supp, F.col("l_orderkey") == F.col("ok1"))
        .join(late_supp, F.col("l_orderkey") == F.col("ok2"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


TPCH_Q21_ORACLE = f"""
SELECT s_name, numwait FROM (
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = '{Q21_NATION}'
      AND l1.l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
      )
    GROUP BY s_name
)
ORDER BY numwait DESC, s_name ASC
LIMIT 100"""


def register_all(register) -> None:
    register("bi_tpch_q1", bi_tpch_q1, TPCH_Q1_ORACLE)
    register("bi_tpch_q3", bi_tpch_q3, TPCH_Q3_ORACLE)
    register("bi_tpch_q5", bi_tpch_q5, TPCH_Q5_ORACLE)
    register("bi_tpch_q6", bi_tpch_q6, TPCH_Q6_ORACLE)
    register("bi_tpch_q10", bi_tpch_q10, TPCH_Q10_ORACLE)
    register("bi_tpch_q12", bi_tpch_q12, TPCH_Q12_ORACLE)
    register("bi_tpch_q14", bi_tpch_q14, TPCH_Q14_ORACLE)
    register("bi_tpch_q4", bi_tpch_q4, TPCH_Q4_ORACLE)
    register("bi_tpch_q13", bi_tpch_q13, TPCH_Q13_ORACLE)
    register("bi_tpch_q15", bi_tpch_q15, TPCH_Q15_ORACLE)
    register("bi_tpch_q17", bi_tpch_q17, TPCH_Q17_ORACLE)
    register("bi_tpch_q18", bi_tpch_q18, TPCH_Q18_ORACLE)
    register("bi_tpch_q7", bi_tpch_q7, TPCH_Q7_ORACLE)
    register("bi_tpch_q8", bi_tpch_q8, TPCH_Q8_ORACLE)
    register("bi_tpch_q9", bi_tpch_q9, TPCH_Q9_ORACLE)
    register("bi_tpch_q19", bi_tpch_q19, TPCH_Q19_ORACLE)
    register("bi_tpch_q22", bi_tpch_q22, TPCH_Q22_ORACLE)
    register("bi_tpch_q2", bi_tpch_q2, TPCH_Q2_ORACLE)
    register("bi_tpch_q11", bi_tpch_q11, TPCH_Q11_ORACLE)
    register("bi_tpch_q16", bi_tpch_q16, TPCH_Q16_ORACLE)
    register("bi_tpch_q20", bi_tpch_q20, TPCH_Q20_ORACLE)
    register("bi_tpch_q21", bi_tpch_q21, TPCH_Q21_ORACLE)
