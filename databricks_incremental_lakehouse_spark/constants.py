"""Deterministic parameters shared by the Spark engine and the DuckDB oracle.

The reference mints nondeterministic values at run time:

- ``batch_id = concat('batch_', date_format(current_timestamp(), ...))``
  (reference extract_orders.py:20)
- ``_ingested_at = current_timestamp()`` (extract_orders.py:37)
- ``days_since_last_order = DATEDIFF(current_date(), MAX(o_orderdate))``
  (refined_customer_orders.py:57)

For reproducible correctness checks those are pinned here (FIXTURES.md
"Harness notes"); the pipeline runner may override them per run.
"""

# Pinned stand-in for the reference's run-time batch id.
FIXED_BATCH_ID = "batch_00000000_000000"

# Source-system tag stamped on every bronze row (extract_orders.py:38).
SOURCE_SYSTEM = "tpch"

# Pinned stand-in for current_date() — just past the test data's max
# o_orderdate (2001-08-01), so recency math stays meaningful.
AS_OF_DATE = "2001-12-31"

# Pinned stand-ins for the reference's current_timestamp() audit stamps
# (``_ingested_at`` extract_orders.py:37 / create_extract_schemas.py:34;
# ``_refined_at`` create_refined_schemas.py:54) so the audit columns can
# live in the deterministic oracle-checked query surface. The pipeline
# runner overwrites them with wall-clock values on materialized tables.
AUDIT_INGESTED_AT = "2001-12-31 00:00:00"
AUDIT_REFINED_AT = "2001-12-31 00:00:00"

# Pinned "now" for the deterministic freshness check (10 h after the audit
# stamps — inside the 25 h SLO). The pipeline path uses real wall-clock.
QC_AS_OF_NOW = "2001-12-31 10:00:00"

# The test data lacks l_commitdate/l_receiptdate (FIXTURES.md), so the
# reference's ``is_late_shipment := ship_date > commit_date``
# (refined_order_details.py:86) is adapted to
# ``shipping_delay_days > LATE_SHIP_DAYS``.
LATE_SHIP_DAYS = 90

# The test data has no partsupp table (FIXTURES.md); supplier-part pairs are
# derived from lineitem with declared deterministic cost/qty functions:
#   cost_pct      = (ps_partkey * 3 + ps_suppkey * 11) % 41 + 50   -> [50, 90]
#   ps_supplycost = round(p_retailprice * cost_pct / 100, 2)
#   ps_availqty   = (ps_partkey * 7 + ps_suppkey * 13) % 9901 + 50
# The cost varies per (part, supplier) — not per part alone — so TPC-H Q2's
# correlated per-part MIN selects a real minimum-cost supplier instead of a
# degenerate whole-tie-set (VERDICT r6 #3; two suppliers of one part tie only
# when their suppkeys differ by a multiple of 41, since 11 is invertible
# mod 41). The pct is integer arithmetic and the cost an IEEE double
# multiply-divide mirrored operation-for-operation in the DuckDB oracles,
# so the derivation stays bit-identical across engines.
SUPPLY_COST_BASE_PCT = 50
SUPPLY_COST_PCT_MOD = 41
AVAILQTY_MOD = 9901
AVAILQTY_BASE = 50

# The (part, supplier) -> cost-percent mix, rendered once for SQL oracles.
SUPPLY_COST_PCT_SQL = (
    f"(ps_partkey * 3 + ps_suppkey * 11) % {SUPPLY_COST_PCT_MOD}"
    f" + {SUPPLY_COST_BASE_PCT}"
)

# Canonical table names present in every /root/testdata/sf*/ directory.
SOURCE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
