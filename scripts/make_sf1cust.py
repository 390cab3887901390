#!/usr/bin/env python
"""Regenerate the 10x-facts corpus used by the BASELINE.md scaling runs.

Synthesizes .bench/sf1cust from the sf0.1 tables: customer / orders /
lineitem replicate 10x with key shifts that keep every FK consistent
(custkey += rep*1e7, orderkey += rep*1e8); the dimensions copy through
unchanged. Used for the RFM global-vs-scoped, gold-view, incremental-
refresh and TPC-H scaling entries in BASELINE.md.

Usage:  python scripts/make_sf1cust.py [src] [dst]
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf1cust"
)
REPS = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({REPS})) AS rep)"
    con.execute(f"""
    COPY (
      SELECT (rep * 10000000 + c_custkey) AS c_custkey,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM read_parquet('{SRC}/customer.parquet'), {rep}
    ) TO '{DST}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT (rep * 100000000 + o_orderkey) AS o_orderkey,
             (rep * 10000000 + o_custkey) AS o_custkey,
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
    for t in ("customer", "orders", "lineitem"):
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
