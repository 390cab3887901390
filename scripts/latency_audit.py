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

from databricks_incremental_lakehouse_spark.registry import QUERIES  # noqa: E402
from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402

# keys bench.py times (headline components, ext list, split keys)
BENCH_COVERED_PREFIXES = ("incr_", "sim_ivf_topk_indexed", "stream_user_totals")


def bench_listed() -> set[str]:
    import re

    src = open("/root/repo/bench.py").read()
    return set(re.findall(r'"(\w+)"', src))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    listed = bench_listed()
    unlisted = [
        n
        for n in QUERIES
        if n not in listed and not n.startswith(BENCH_COVERED_PREFIXES)
    ]
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
