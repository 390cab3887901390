"""Keep-latest window deduplication (reference operator W1/P5).

Reference pattern (extract_orders.py:57-67):

    ROW_NUMBER() OVER (PARTITION BY pk ORDER BY _ingested_at DESC) AS _rn
    ... WHERE _rn = 1

Within one batch every ``_ingested_at`` ties, which would make the kept row
nondeterministic (the test lineitem really does carry ~24% duplicate
composite keys whose payloads differ). We therefore extend the ordering with
a deterministic tiebreak over the payload columns — ASC NULLS LAST, mirrored
verbatim in the DuckDB oracle — so Spark and the oracle keep the same row.

Scale note: this is a single hash-partition shuffle on the dedup key followed
by an in-partition sort; at 100 TB it is the same shape as any groupBy on the
primary key. AQE skew-join/partition-coalescing handles moderate key skew;
a genuinely hot key would be salted upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    recency_col: str | None = None,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key combination.

    ``recency_col`` (e.g. ``_ingested_at``) sorts DESC first when present;
    ``tiebreak_cols`` (default: every other column, in schema order) sort
    ASC NULLS LAST to force a total order.
    """
    if tiebreak_cols is None:
        skip = set(keys) | ({recency_col} if recency_col else set())
        tiebreak_cols = [c for c in df.columns if c not in skip]
    order = []
    if recency_col is not None:
        order.append(F.col(recency_col).desc())
    order.extend(F.col(c).asc_nulls_last() for c in tiebreak_cols)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
