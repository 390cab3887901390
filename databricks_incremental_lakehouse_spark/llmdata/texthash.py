"""Engine-portable text hashing and tokenization primitives.

Hashing must produce *identical* values in Spark and the DuckDB oracle, so
the conventional engine-native hashes (Spark murmur3/xxhash64, DuckDB hash)
are out. The portable 60-bit hash used across dedup/similarity operators:

    spark : conv(substr(md5(s), 1, 15), 16, 10) :: long
    duckdb: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

(15 hex chars = 60 bits, fits signed 64-bit in both engines.) Independent
hash families are derived by seed-prefixing the input (md5('<i>#' || s)) —
the textbook construction, portable because it needs no 64-bit modular
arithmetic (which would overflow-wrap in Spark but error in DuckDB).

Scale note: md5 costs ~3x xxhash64; on a production cluster swap
``hash60`` for ``F.xxhash64`` with integer salts — every operator here only
requires *a* stable hash family, not md5 specifically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: lowercase, split on whitespace runs. Both engines treat
# '\s+' identically on this corpus (plain space-separated words).
TOKENIZE_SQL = "regexp_split_to_array(trim(lower({c})), '\\s+')"


def tokenize(c: Column) -> Column:
    return F.split(F.trim(F.lower(c)), r"\s+")


def hash60(c: Column) -> Column:
    """Portable 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded_hash60(c: Column, seed: int) -> Column:
    """Seed-prefixed portable hash (independent family member ``seed``)."""
    return hash60(F.concat(F.lit(f"{seed}#"), c))


def seeded_hash60_sql(expr: str, seed_expr: str) -> str:
    return hash60_sql(f"concat(CAST({seed_expr} AS VARCHAR), '#', {expr})")
