"""Spark-vs-DuckDB parity harness mirroring the driver's correctness gate.

The driver runs each ``queries()[name]`` and its ``oracle_sql()[name]`` twin
at sf0.01 and compares row count + schema + order-insensitive value hash
(``__spark_entry__.py`` docstring). This harness reproduces that check
locally with *exact* value comparison (floats must match to the last printed
digit after in-query rounding), so anything green here is green under any
reasonable driver hash.
"""

from __future__ import annotations

import math

import duckdb

from databricks_incremental_lakehouse_spark.constants import SOURCE_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in SOURCE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Normalize one value to a hashable, engine-neutral token."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # floats are expected to be identical post-ROUND; repr keeps full
        # precision so any genuine drift is caught.
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    # dates/timestamps/strings/ints: canonical string form
    return str(v)


def _rows_to_tokens(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def assert_hash_stable_schema(spark_df, name: str = "query") -> None:
    """Reject output types the driver's pandas canonicalizer can't hash:
    ARRAY/MAP/STRUCT cells raise ``unhashable type: 'list'``
    (CORRECTNESS_r04, ``embedding_quantize``). Local tuple comparison
    would silently accept these — this lint keeps the local gate honest
    about the driver contract. DECIMAL (the other unstable type,
    CORRECTNESS_r03) is NOT linted here: the registry's ``_hash_stable``
    wrapper casts it centrally, so raw view functions may return it."""
    from pyspark.sql import types as T

    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"[{name}] hash-unstable output columns at the registry boundary "
        f"(serialize via array_join/to_json): {bad}"
    )


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "query") -> None:
    """Assert spark_df matches the oracle; raises AssertionError with detail."""
    assert_hash_stable_schema(spark_df, name)
    con = duck_connection(sf_dir)
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"[{name}] column mismatch:\n  spark={sorted(s_cols)}\n  oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_tok = _rows_to_tokens(s_cols, s_rows)
    o_tok = _rows_to_tokens(o_cols, o_rows)
    if s_tok != o_tok:
        diffs = [
            (a, b) for a, b in zip(s_tok, o_tok) if a != b
        ][:5]
        raise AssertionError(
            f"[{name}] value mismatch ({sum(1 for a, b in zip(s_tok, o_tok) if a != b)}"
            f"/{len(s_tok)} rows differ); first diffs (spark vs oracle), "
            f"cols={sorted(s_cols)}:\n"
            + "\n".join(f"  S {a}\n  O {b}" for a, b in diffs)
        )
