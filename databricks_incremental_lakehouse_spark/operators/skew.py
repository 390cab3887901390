"""Skew-handling primitives: salted joins and two-phase distinct counts.

The reference relies on Catalyst defaults (SURVEY.md §4); these are the
explicit tools a 100-TB deployment reaches for when AQE's skew-join split
is not available (broadcast-ineligible skewed build side, or non-join
hotspots like count-distinct on a hot key):

- :func:`salted_join` — replicate the small side ``n_salts`` times and
  spread the big side's hot keys across ``(key, salt)`` partitions. The
  salt is a deterministic hash of the big side's row (never ``rand()`` —
  retries/speculative tasks must re-derive the same salt).
- :func:`salted_count_distinct` — two-phase exact distinct count: distinct
  on ``(keys, salted value)`` partial-aggregates before the final count,
  so one hot group does not serialize into a single reducer.

Both are semantics-preserving (asserted against the naive plans in
tests/test_operators.py) — they only change the exchange layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# join types whose output never contains an unmatched SMALL-side row;
# right/full outer would emit each unmatched small row once per salt
# replica (n_salts duplicates), so they are rejected rather than corrupted.
_SALT_SAFE_JOINS = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "semi", "left_anti", "leftanti", "anti"}
)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's keys salted ``n_salts`` ways.

    The small side is exploded ``n_salts`` x (acceptable when it is
    dimension-sized); the big side's salt is a deterministic hash over its
    full row so the same input always lands in the same bucket. Output
    columns match ``big.join(small, on, how)``.

    ``how`` must keep the big side on the preserved side (inner / left /
    semi / anti): salting replicates the small side, so any join type that
    emits unmatched small-side rows (right/full outer) would duplicate
    them ``n_salts`` x and is rejected.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALT_SAFE_JOINS
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            f"rows would be emitted once per salt replica; use one of "
            f"{sorted(_SALT_SAFE_JOINS)}"
        )
    salt_src: list[Column] = [F.col(c) for c in big.columns]
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)))
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")


def top_key_share(
    df: DataFrame,
    key: str,
    sample_fraction: float | None = 0.05,
) -> float:
    """Estimate the hottest key's share of ``df``'s rows — the histogram
    probe behind auto-salting decisions.

    One sampled groupBy-count (map-side combined) reduced to a single
    (max, total) row on the driver — the collect is 1 row regardless of
    data size, the same bounded-collect discipline as the k-means
    centroids. A constant-fraction hot key (the shape that breaks keyed
    operators at any scale) survives any sample rate; a 1/N key does not
    need salting in the first place. Returns 0.0 on an empty (sample of
    the) input."""
    probe = df.select(key) if sample_fraction is None else df.select(key).sample(
        fraction=sample_fraction, seed=42
    )
    row = (
        probe.groupBy(key)
        .count()
        .agg(F.max("count").alias("top"), F.sum("count").alias("total"))
        .collect()[0]
    )
    if not row.total:
        return 0.0
    return float(row.top) / float(row.total)


# a key carrying >= this share of the fact triggers the skew-aware plan;
# at 32 shuffle partitions a 10% key already makes one task ~3x the mean.
SKEW_SHARE_THRESHOLD = 0.10


def salted_count_distinct(
    df: DataFrame,
    group_keys: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per group, hot-key safe.

    Phase 1 dedups ``(group, value)`` pairs partitioned by
    ``(group, hash(value) % n_salts)`` — each hot group's values spread
    over ``n_salts`` reducers; phase 2 sums the per-salt distinct counts.
    Equivalent to ``groupBy(keys).agg(countDistinct(value))``.
    """
    salted = df.select(
        *group_keys,
        F.col(value_col),
        F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("_salt"),
    )
    partial = (
        salted.groupBy(*group_keys, "_salt")
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return partial.groupBy(*group_keys).agg(
        F.sum("_partial").alias(f"distinct_{value_col}")
    )
