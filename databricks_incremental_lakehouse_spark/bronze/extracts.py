"""Bronze layer — audited, null-filtered, deduplicated source ingests.

Re-expresses the reference's 6 extract notebooks (reference
``src/extract/extract_{orders,customers,lineitem,suppliers,parts,
nation_region}.py``) as pure DataFrame programs. Each follows the canonical
3-stage template (extract_orders.py:25-88):

    raw scan + audit columns  ->  null filter  ->  keep-latest window dedup

Adaptations to the driver test data (FIXTURES.md):

- Only the columns present in the parquet are carried (no ``o_clerk``,
  ``l_comment`` etc.).
- ``o_orderdate`` / ``l_shipdate`` arrive as TIMESTAMP and are cast to DATE
  to match the reference bronze DDL (create_extract_schemas.py:29, :80).
- No ``partsupp`` source exists; :func:`bronze_partsupp` derives
  supplier-part pairs from lineitem with declared deterministic
  cost/quantity functions (constants.py).
- The dedup ordering gains deterministic payload tiebreaks (operators/dedup.py).

``BRONZE_ORACLE_CTES`` holds the DuckDB-dialect CTE body equivalent to each
builder; silver/gold oracle SQL composes on top of these so the entire chain
is checkable end-to-end against the raw parquet.

Scale notes: bronze is a narrow scan -> project -> filter (all pushed to the
parquet reader) plus one shuffle for the PK-window dedup. At 100 TB the dedup
shuffle is the cost; it is the minimal shuffle any keyed dedup needs, and the
write partitions it produces are reused by downstream PK joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import (
    AVAILQTY_BASE,
    AVAILQTY_MOD,
    FIXED_BATCH_ID,
    SUPPLY_COST_BASE_PCT,
    SUPPLY_COST_PCT_MOD,
    SUPPLY_COST_PCT_SQL,
)
from ..operators import dedup_latest, round_dbl, with_audit_columns
from ..oracle_util import replace_cast
from ..tables import load_table

_AUDIT_ORACLE = (
    "TIMESTAMP '{ts}' AS _ingested_at, "
    "'tpch' AS _source_system, '{batch_id}' AS _batch_id"
)


def _audit_cte_cols(batch_id: str) -> str:
    from ..constants import AUDIT_INGESTED_AT

    return _AUDIT_ORACLE.format(ts=AUDIT_INGESTED_AT, batch_id=batch_id)


# ---------------------------------------------------------------------------
# orders  (reference extract_orders.py)
# ---------------------------------------------------------------------------


def bronze_orders(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    raw: DataFrame | None = None,
) -> DataFrame:
    """Bronze orders: project -> audit -> null filter -> dedup on o_orderkey.

    ``raw``: apply the same cleaning to an externally supplied orders
    DataFrame (the incremental streaming path cleans each micro-batch with
    exactly this logic inside ``foreachBatch``)."""
    raw = (raw if raw is not None else load_table(spark, sf_dir, "orders")).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    stamped = with_audit_columns(raw, batch_id=batch_id)
    cleaned = stamped.filter(
        F.col("o_orderkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    return dedup_latest(
        cleaned,
        keys=["o_orderkey"],
        tiebreak_cols=[
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )


def _orders_cte(batch_id: str) -> str:
    return f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS DECIMAL(15,2)) AS o_totalprice,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority,
           {_audit_cte_cols(batch_id)}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_orderkey
            ORDER BY o_custkey ASC NULLS LAST, o_orderstatus ASC NULLS LAST,
                     CAST(o_totalprice AS DOUBLE) ASC NULLS LAST,
                     CAST(o_orderdate AS DATE) ASC NULLS LAST,
                     o_orderpriority ASC NULLS LAST
        ) AS _rn
        FROM orders
        WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL
    ) WHERE _rn = 1"""


# ---------------------------------------------------------------------------
# customers  (reference extract_customers.py)
# ---------------------------------------------------------------------------


def bronze_customers(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    raw: DataFrame | None = None,
) -> DataFrame:
    raw = (raw if raw is not None else load_table(spark, sf_dir, "customer")).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(15,2)").alias("c_acctbal"),
        "c_mktsegment",
    )
    stamped = with_audit_columns(raw, batch_id=batch_id)
    cleaned = stamped.filter(
        F.col("c_custkey").isNotNull() & F.col("c_name").isNotNull()
    )
    return dedup_latest(
        cleaned,
        keys=["c_custkey"],
        tiebreak_cols=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )


def _customers_cte(batch_id: str) -> str:
    return f"""
    SELECT c_custkey, c_name, c_nationkey,
           CAST(c_acctbal AS DECIMAL(15,2)) AS c_acctbal, c_mktsegment,
           {_audit_cte_cols(batch_id)}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_custkey
            ORDER BY c_name ASC NULLS LAST, c_nationkey ASC NULLS LAST,
                     CAST(c_acctbal AS DOUBLE) ASC NULLS LAST,
                     c_mktsegment ASC NULLS LAST
        ) AS _rn
        FROM customer
        WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
    ) WHERE _rn = 1"""


# ---------------------------------------------------------------------------
# lineitem  (reference extract_lineitem.py; composite-key dedup :72-75)
# ---------------------------------------------------------------------------

_LINEITEM_TIEBREAKS = [
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def bronze_lineitem(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    raw: DataFrame | None = None,
    shared: bool = True,
) -> DataFrame:
    # The window-dedup over the largest fact is the costliest bronze stage
    # and THREE consumers build it inline (silver_order_details directly,
    # bronze_partsupp's pair enumeration, silver_supplier_parts through
    # partsupp) — the default build is shared session-wide (memo persist
    # mode; Spark's CacheManager substitutes it into every occurrence, so
    # even a single plan containing it twice computes it once).
    if shared and raw is None and batch_id == FIXED_BATCH_ID:
        from ..memo import shared_frame

        return shared_frame(
            spark,
            ("bronze_lineitem", sf_dir),
            lambda: bronze_lineitem(spark, sf_dir, shared=False),
        )
    raw = (raw if raw is not None else load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(15,2)").alias("l_quantity"),
        F.col("l_extendedprice").cast("decimal(15,2)").alias("l_extendedprice"),
        F.col("l_discount").cast("decimal(15,2)").alias("l_discount"),
        F.col("l_tax").cast("decimal(15,2)").alias("l_tax"),
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
    )
    stamped = with_audit_columns(raw, batch_id=batch_id)
    cleaned = stamped.filter(
        F.col("l_orderkey").isNotNull()
        & F.col("l_linenumber").isNotNull()
        & (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") > 0)
    )
    return dedup_latest(
        cleaned,
        keys=["l_orderkey", "l_linenumber"],
        tiebreak_cols=_LINEITEM_TIEBREAKS,
    )


def _lineitem_cte(batch_id: str) -> str:
    return f"""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
           CAST(l_quantity AS DECIMAL(15,2)) AS l_quantity,
           CAST(l_extendedprice AS DECIMAL(15,2)) AS l_extendedprice,
           CAST(l_discount AS DECIMAL(15,2)) AS l_discount,
           CAST(l_tax AS DECIMAL(15,2)) AS l_tax,
           l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS l_shipdate,
           {_audit_cte_cols(batch_id)}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY l_orderkey, l_linenumber
            ORDER BY l_partkey ASC NULLS LAST, l_suppkey ASC NULLS LAST,
                     CAST(l_quantity AS DOUBLE) ASC NULLS LAST,
                     CAST(l_extendedprice AS DOUBLE) ASC NULLS LAST,
                     CAST(l_discount AS DOUBLE) ASC NULLS LAST,
                     CAST(l_tax AS DOUBLE) ASC NULLS LAST,
                     l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST,
                     CAST(l_shipdate AS DATE) ASC NULLS LAST
        ) AS _rn
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
          AND l_quantity > 0 AND l_extendedprice > 0
    ) WHERE _rn = 1"""


# ---------------------------------------------------------------------------
# suppliers  (reference extract_suppliers.py)
# ---------------------------------------------------------------------------


def bronze_suppliers(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    raw: DataFrame | None = None,
) -> DataFrame:
    raw = (raw if raw is not None else load_table(spark, sf_dir, "supplier")).select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.col("s_acctbal").cast("decimal(15,2)").alias("s_acctbal"),
    )
    stamped = with_audit_columns(raw, batch_id=batch_id)
    cleaned = stamped.filter(
        F.col("s_suppkey").isNotNull() & F.col("s_name").isNotNull()
    )
    return dedup_latest(
        cleaned, keys=["s_suppkey"], tiebreak_cols=["s_name", "s_nationkey", "s_acctbal"]
    )


def _suppliers_cte(batch_id: str) -> str:
    return f"""
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(s_acctbal AS DECIMAL(15,2)) AS s_acctbal,
           {_audit_cte_cols(batch_id)}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY s_suppkey
            ORDER BY s_name ASC NULLS LAST, s_nationkey ASC NULLS LAST,
                     CAST(s_acctbal AS DOUBLE) ASC NULLS LAST
        ) AS _rn
        FROM supplier
        WHERE s_suppkey IS NOT NULL AND s_name IS NOT NULL
    ) WHERE _rn = 1"""


# ---------------------------------------------------------------------------
# parts  (reference extract_parts.py, first block)
# ---------------------------------------------------------------------------


def bronze_parts(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    raw: DataFrame | None = None,
) -> DataFrame:
    raw = (raw if raw is not None else load_table(spark, sf_dir, "part")).select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        "p_size",
        F.col("p_retailprice").cast("decimal(15,2)").alias("p_retailprice"),
    )
    stamped = with_audit_columns(raw, batch_id=batch_id)
    cleaned = stamped.filter(F.col("p_partkey").isNotNull())
    return dedup_latest(
        cleaned,
        keys=["p_partkey"],
        tiebreak_cols=["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )


def _parts_cte(batch_id: str) -> str:
    return f"""
    SELECT p_partkey, p_name, p_brand, p_type, p_size,
           CAST(p_retailprice AS DECIMAL(15,2)) AS p_retailprice,
           {_audit_cte_cols(batch_id)}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY p_partkey
            ORDER BY p_name ASC NULLS LAST, p_brand ASC NULLS LAST,
                     p_type ASC NULLS LAST, p_size ASC NULLS LAST,
                     CAST(p_retailprice AS DOUBLE) ASC NULLS LAST
        ) AS _rn
        FROM part
        WHERE p_partkey IS NOT NULL
    ) WHERE _rn = 1"""


# ---------------------------------------------------------------------------
# partsupp  (reference extract_parts.py second block :86-122; DERIVED here —
# the test data has no partsupp, FIXTURES.md documents this substitution)
# ---------------------------------------------------------------------------


def bronze_partsupp(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    lineitem: DataFrame | None = None,
    parts: DataFrame | None = None,
) -> DataFrame:
    """Derived supplier-part bridge.

    Distinct (l_partkey, l_suppkey) pairs observed in cleaned lineitem,
    joined to parts for the declared cost basis (constants.py):

        cost_pct      = (ps_partkey*3 + ps_suppkey*11) % 41 + 50
        ps_supplycost = round(p_retailprice * cost_pct / 100, 2)
        ps_availqty   = (ps_partkey*7 + ps_suppkey*13) % 9901 + 50

    The reference dedups partsupp on the same composite key
    (extract_parts.py:105-108); DISTINCT here is the degenerate equivalent
    since the derivation is already unique per pair.

    ``lineitem`` / ``parts``: pass the already-materialized bronze tables
    (the pipeline runner does) so the lineitem window-dedup is not recomputed
    just to enumerate pairs — at scale that is a second full pass over the
    largest fact.
    """
    li = (
        lineitem
        if lineitem is not None
        else bronze_lineitem(spark, sf_dir, batch_id=batch_id)
    )
    parts = (
        parts if parts is not None else bronze_parts(spark, sf_dir, batch_id=batch_id)
    )
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    return (
        pairs.join(
            parts.select("p_partkey", "p_retailprice"),
            pairs.ps_partkey == F.col("p_partkey"),
            "inner",
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % AVAILQTY_MOD
                + AVAILQTY_BASE
            )
            .cast("int")
            .alias("ps_availqty"),
            round_dbl(
                F.col("p_retailprice").cast("double")
                * (
                    (F.col("ps_partkey") * 3 + F.col("ps_suppkey") * 11)
                    % SUPPLY_COST_PCT_MOD
                    + SUPPLY_COST_BASE_PCT
                ).cast("double")
                / F.lit(100.0),
                2,
            )
            .cast("decimal(15,2)")
            .alias("ps_supplycost"),
        )
        .transform(lambda df: with_audit_columns(df, batch_id=batch_id))
    )


def _partsupp_cte(batch_id: str) -> str:
    return f"""
    SELECT ps_partkey, ps_suppkey,
           CAST((ps_partkey * 7 + ps_suppkey * 13) % {AVAILQTY_MOD} + {AVAILQTY_BASE} AS INT) AS ps_availqty,
           CAST(CAST(ROUND(CAST(CAST(p_retailprice AS DOUBLE) * CAST({SUPPLY_COST_PCT_SQL} AS DOUBLE) / 100.0 AS DECIMAL(38,6)), 2) AS DOUBLE) AS DECIMAL(15,2)) AS ps_supplycost,
           {_audit_cte_cols(batch_id)}
    FROM (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM b_lineitem
    ) pairs
    INNER JOIN (SELECT p_partkey, p_retailprice FROM b_parts) p
        ON pairs.ps_partkey = p.p_partkey"""


# ---------------------------------------------------------------------------
# nation & region  (reference extract_nation_region.py)
# ---------------------------------------------------------------------------


def bronze_nation(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    raw: DataFrame | None = None,
) -> DataFrame:
    raw = (raw if raw is not None else load_table(spark, sf_dir, "nation")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    stamped = with_audit_columns(raw, batch_id=batch_id)
    cleaned = stamped.filter(F.col("n_nationkey").isNotNull())
    return dedup_latest(
        cleaned, keys=["n_nationkey"], tiebreak_cols=["n_name", "n_regionkey"]
    )


def _nation_cte(batch_id: str) -> str:
    return f"""
    SELECT n_nationkey, n_name, n_regionkey, {_audit_cte_cols(batch_id)}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY n_nationkey
            ORDER BY n_name ASC NULLS LAST, n_regionkey ASC NULLS LAST
        ) AS _rn
        FROM nation WHERE n_nationkey IS NOT NULL
    ) WHERE _rn = 1"""


def bronze_region(
    spark: SparkSession,
    sf_dir: str,
    batch_id: str = FIXED_BATCH_ID,
    raw: DataFrame | None = None,
) -> DataFrame:
    raw = (raw if raw is not None else load_table(spark, sf_dir, "region")).select("r_regionkey", "r_name")
    stamped = with_audit_columns(raw, batch_id=batch_id)
    cleaned = stamped.filter(F.col("r_regionkey").isNotNull())
    return dedup_latest(cleaned, keys=["r_regionkey"], tiebreak_cols=["r_name"])


def _region_cte(batch_id: str) -> str:
    return f"""
    SELECT r_regionkey, r_name, {_audit_cte_cols(batch_id)}
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY r_regionkey ORDER BY r_name ASC NULLS LAST
        ) AS _rn
        FROM region WHERE r_regionkey IS NOT NULL
    ) WHERE _rn = 1"""


def BRONZE_ORACLE_CTES(batch_id: str = FIXED_BATCH_ID) -> dict[str, str]:
    """DuckDB CTE bodies, one per bronze table (keys are CTE names)."""
    return {
        "b_orders": _orders_cte(batch_id),
        "b_customers": _customers_cte(batch_id),
        "b_lineitem": _lineitem_cte(batch_id),
        "b_suppliers": _suppliers_cte(batch_id),
        "b_parts": _parts_cte(batch_id),
        "b_partsupp": _partsupp_cte(batch_id),
        "b_nation": _nation_cte(batch_id),
        "b_region": _region_cte(batch_id),
    }


# Money columns are DECIMAL(15,2) inside the CTEs (reference DDL fidelity,
# create_extract_schemas.py:28, :74-77); the driver-facing SELECT casts them
# to DOUBLE so the cross-engine value hash is stable (oracle_util.replace_cast).
_BRONZE_DOUBLE_COLS: dict[str, list[str]] = {
    "orders": ["o_totalprice"],
    "customers": ["c_acctbal"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "suppliers": ["s_acctbal"],
    "parts": ["p_retailprice"],
    "partsupp": ["ps_supplycost"],
}


def _bronze_select(table: str) -> str:
    cols = _BRONZE_DOUBLE_COLS.get(table)
    star = replace_cast({c: "DOUBLE" for c in cols}) if cols else "*"
    return f"SELECT {star} FROM b_{table}"


def bronze_oracle_sql(table: str, batch_id: str = FIXED_BATCH_ID) -> str:
    """Standalone DuckDB query for one bronze table (composes dependencies)."""
    ctes = BRONZE_ORACLE_CTES(batch_id)
    name = f"b_{table}"
    if table == "partsupp":
        body = ",\n".join(
            f"{n} AS ({ctes[n]})" for n in ("b_lineitem", "b_parts", "b_partsupp")
        )
        return f"WITH {body}\n{_bronze_select(table)}"
    return f"WITH {name} AS ({ctes[name]})\n{_bronze_select(table)}"
