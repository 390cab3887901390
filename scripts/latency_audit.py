"""Latency audit of every registered query NOT covered by bench.py's
headline/ext lists — the r4 lesson: a query outside the bench can hide a
scale disaster (dedup_embedding_cosine sat at 130s for two rounds because
its 0-row driver result raised no flag). Times one noop-sink execution
per unlisted query at sf0.1 and prints any above a threshold.

Usage: python scripts/latency_audit.py [sf_dir] [threshold_sec]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import EXT_QUERIES, OTHER_TIMED_QUERIES  # noqa: E402
from databricks_incremental_lakehouse_spark.registry import QUERIES  # noqa: E402
from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    # the ACTUAL benched sets, imported from bench.py — an earlier cut
    # grepped quoted strings out of the bench source, which would have
    # silently excluded any future query whose name collided with any
    # quoted literal (the exact blind spot this audit exists to close)
    listed = set(EXT_QUERIES) | set(OTHER_TIMED_QUERIES)
    unlisted = [n for n in QUERIES if n not in listed]
    spark = build_spark(app_name="latency-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in unlisted:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    slow = {k: v for k, v in out.items() if v > thresh}
    print(json.dumps({"sf_dir": sf_dir, "n_audited": len(out), "timings": out}))
    print(json.dumps({"over_threshold": slow, "threshold": thresh}))
    spark.stop()


if __name__ == "__main__":
    main()
