#!/usr/bin/env python
"""Generate the skewed 10x corpus for the skew-handling bench entries.

Synthesizes .bench/sfskew from the sf0.1 tables (VERDICT r6 #7):

- events replicate 10x with shifted event_ids, and 40% of the replicated
  rows are reassigned to ONE hot user (user_id 1) — the "one whale
  account" shape that serializes whole-partition windows keyed on
  user_id.
- customer / orders / lineitem replicate 10x exactly like make_sf1cust,
  except 30% of the replicated orders are reassigned to ONE hot customer
  (c_custkey 1) — a hot key on the orders->customer join/agg path.
- dimensions copy through unchanged.

The point is a corpus where the hottest key carries a constant fraction
of the fact (not 1/N) — at any scale one task owns that fraction unless
the operator is skew-aware. Used by bench.py's `ext.skew.*` rows and
tests/test_operators.py's skew-path plan locks.

Usage:  python scripts/make_sfskew.py [src] [dst]
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sfskew"
)
REPS = 10
HOT_USER = 1
HOT_CUST = 1
# deterministic routing: hash of the shifted key mod 10 < {4,3}
EVENT_HOT_PCT = 4   # 40% of events land on the hot user
ORDER_HOT_PCT = 3   # 30% of orders land on the hot customer


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({REPS})) AS rep)"
    con.execute(f"""
    COPY (
      SELECT (rep * 100000000 + event_id) AS event_id, ts,
             CASE WHEN hash(rep * 100000000 + event_id) % 10 < {EVENT_HOT_PCT}
                  THEN {HOT_USER} ELSE user_id END AS user_id,
             event_type, value, props
      FROM read_parquet('{SRC}/events.parquet'), {rep}
    ) TO '{DST}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT (rep * 10000000 + c_custkey) AS c_custkey,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM read_parquet('{SRC}/customer.parquet'), {rep}
    ) TO '{DST}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT (rep * 100000000 + o_orderkey) AS o_orderkey,
             CASE WHEN hash(rep * 100000000 + o_orderkey) % 10 < {ORDER_HOT_PCT}
                  THEN {HOT_CUST}
                  ELSE (rep * 10000000 + o_custkey) END AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'), {rep}
    ) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT (rep * 100000000 + l_orderkey) AS l_orderkey,
             l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{SRC}/lineitem.parquet'), {rep}
    ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")
    for t in ("nation", "region", "supplier", "part"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t, key in (("events", "user_id"), ("orders", "o_custkey")):
        total, top = con.sql(f"""
            SELECT SUM(n), MAX(n) FROM (
                SELECT count(*) AS n FROM read_parquet('{DST}/{t}.parquet')
                GROUP BY {key})""").fetchone()
        print(f"{t}: rows={total} top_key_share={top/total:.3f}")


if __name__ == "__main__":
    main()
