"""Local replica of the driver's correctness gate, plus hash-stability lint.

For every entry in ``__spark_entry__.queries()`` this runs the Spark query
and its DuckDB oracle at sf0.01, compares row count / column set / exact
value tokens (tests/parity.py), and additionally flags any output type that
round 3 proved hash-unstable across engines: Spark DecimalType, DuckDB
DECIMAL/HUGEINT.  Writes one JSON line per query to stdout and a summary
at the end.

Usage:  python scripts/check_correctness.py [--only name1,name2] [--start N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from tests.parity import _rows_to_tokens, duck_connection  # noqa: E402

SF_DIR = os.environ.get("CC_SF_DIR", "/root/testdata/sf0.01")

UNSTABLE_DUCK = ("DECIMAL", "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")


def unstable_spark_types(df):
    """Types the driver's pandas canonicalizer cannot hash or hashes
    engine-dependently: DECIMAL (r3, 16 value-identical red rows) and
    ARRAY/MAP/STRUCT (r4, ``embedding_quantize`` — pandas ``sort_values``
    raises ``unhashable type: 'list'`` on array cells). Serialize such
    columns (array_join / to_json) before the registry boundary."""
    bad = []
    for f in df.schema.fields:
        t = f.dataType
        if isinstance(t, (T.DecimalType, T.ArrayType, T.MapType, T.StructType)):
            bad.append(f"{f.name}:{t.simpleString()}")
    return bad


def unstable_duck_types(con, sql):
    rel = con.sql(sql)
    bad = []
    for n, t in zip(rel.columns, [str(x) for x in rel.types]):
        ts = str(t).upper()
        if any(u in ts for u in UNSTABLE_DUCK) or "[]" in ts or ts.startswith(
            ("STRUCT", "MAP(", "LIST", "UNION")
        ):
            bad.append(f"{n}:{t}")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = list(queries)
    if args.only:
        names = [n for n in args.only.split(",") if n in queries]
    names = names[args.start:]
    if args.limit:
        names = names[: args.limit]

    summary = {"pass": 0, "fail": 0, "no_oracle": 0, "type_warn": 0}
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        rec = {"name": name, "i": i + args.start}
        try:
            df = queries[name](spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(s_rows)
            rec["spark_unstable"] = unstable_spark_types(df)

            sql = oracles.get(name)
            if sql is None:
                rec["status"] = "no_oracle"
            else:
                con = duck_connection(SF_DIR)
                rec["duck_unstable"] = unstable_duck_types(con, sql)
                cur = con.execute(sql)
                o_cols = [d[0] for d in cur.description]
                o_rows = cur.fetchall()
                rec["oracle_rows"] = len(o_rows)
                rec["cols_match"] = sorted(s_cols) == sorted(o_cols)
                rec["rows_match"] = len(s_rows) == len(o_rows)
                if rec["cols_match"] and rec["rows_match"]:
                    s_tok = _rows_to_tokens(s_cols, s_rows)
                    o_tok = _rows_to_tokens(o_cols, o_rows)
                    rec["values_match"] = s_tok == o_tok
                    if not rec["values_match"]:
                        diffs = [
                            (a, b) for a, b in zip(s_tok, o_tok) if a != b
                        ]
                        rec["n_diff"] = len(diffs)
                        rec["first_diff"] = [list(map(str, d)) for d in diffs[:2]]
                else:
                    rec["values_match"] = False
                    if not rec["cols_match"]:
                        rec["col_detail"] = {
                            "spark": sorted(s_cols),
                            "oracle": sorted(o_cols),
                        }
                ok = rec["cols_match"] and rec["rows_match"] and rec["values_match"]
                rec["status"] = "pass" if ok else "FAIL"
                con.close()
        except Exception:
            rec["status"] = "ERROR"
            rec["trace"] = traceback.format_exc()[-1500:]
        rec["sec"] = round(time.time() - t0, 2)
        if rec["status"] == "pass":
            summary["pass"] += 1
        elif rec["status"] == "no_oracle":
            # rows-only coverage by design (driver does the same) — not a
            # mismatch; keep it out of fail/failures (ADVICE r4).
            summary["no_oracle"] += 1
        else:
            summary["fail"] += 1
            failures.append(name)
        if rec.get("spark_unstable") or rec.get("duck_unstable"):
            summary["type_warn"] += 1
        print(json.dumps(rec), flush=True)

    print(json.dumps({"summary": summary, "failures": failures}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
