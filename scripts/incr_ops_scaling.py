#!/usr/bin/env python
"""10x scaling rows for the round-10 maintained operators.

- ``incr_hll_distinct_update_only``: arrival-batch fold + estimate at
  sf0.1 (1M events) vs .bench/sf1ext (10M events). The register table is
  bounded (n_types x 512) at BOTH scales — the fold scans the batch, so
  the row should scale with the batch, not the corpus.
- ``dedup_semantic_append``: arrival probe at sf0.1 (2k arrivals vs 18k
  base) vs sf1ext (20k vs 180k). Cell-bounded BLAS — the sqrt(N) nlist
  dial grows cells as sqrt, so the probe should scale well under 10x.

Usage: python scripts/incr_ops_scaling.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402
from databricks_incremental_lakehouse_spark import memo  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = {"1x": "/root/testdata/sf0.1", "10x": os.path.join(REPO, ".bench", "sf1ext")}
REPS = 3


def main() -> None:
    spark = build_spark(app_name="incr_ops_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    from databricks_incremental_lakehouse_spark.registry import QUERIES

    # the two fold-wave-fused queries (VERDICT r12 #7): re-confirm the
    # O(batch) growth class with the concurrent wave shipped in r12
    for name in (
        "incr_hll_distinct_update_only",
        "dedup_semantic_append",
        "incr_token_stats_update_only",
        "incr_cms_heavy_hitters_update_only",
    ):
        for label, sf in SFS.items():
            memo.clear()
            q = QUERIES[name]
            t0 = time.time()
            n = q(spark, sf).count()
            first = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                q(spark, sf).count()
                times.append(time.time() - t0)
            print(
                f"{name} {label}: rows={n} init_or_build={first:.2f}s "
                f"steady={statistics.median(times):.2f}s"
            )
    spark.stop()


if __name__ == "__main__":
    main()
