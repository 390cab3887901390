#!/usr/bin/env python
"""Stage-level attribution of the incremental update-only floor
(VERDICT r6 #4): wrap every sub-operation of apply_order_updates with
timers and run the benched 50-order replay at sf0.1.

Usage: python scripts/profile_incr.py [sf_dir]
"""

import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

from databricks_incremental_lakehouse_spark.session import build_spark
from databricks_incremental_lakehouse_spark.streaming import refresh as R

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

CALLS: dict[str, list[float]] = defaultdict(list)


def timed(label_fn):
    def deco(fn):
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            CALLS[label_fn(*a, **k)].append(round(time.time() - t0, 3))
            return out
        return wrap
    return deco


def main() -> None:
    spark = build_spark(app_name="profile_incr")
    spark.sparkContext.setLogLevel("ERROR")

    orig_merge = R.merge_upsert
    orig_read = R._read_keys_pruned

    R.merge_upsert = timed(
        lambda s, df, target, **k: "merge:" + "/".join(target.split("/")[-2:])
    )(orig_merge)
    R._read_keys_pruned = timed(
        lambda s, target, *a, **k: "read_pruned:" + "/".join(target.split("/")[-2:])
    )(orig_read)
    for name in ("_rewrite_trends", "_rewrite_customer_orders"):
        setattr(R, name, timed(lambda *a, _n=name, **k: _n)(getattr(R, name)))

    t0 = time.time()
    wh = R._refreshed_warehouse(spark, SF)  # init + first replay (once.)
    init_s = round(time.time() - t0, 2)

    reps = []
    for _ in range(3):
        CALLS.clear()
        t0 = time.time()
        R.apply_order_updates(spark, wh.root, orders_updates=R._replay_batch(spark, SF))
        reps.append(round(time.time() - t0, 2))
        last = {k: v for k, v in sorted(CALLS.items())}
    print(json.dumps({"init_s": init_s, "update_only_reps": reps}, indent=1))
    print(json.dumps({"last_rep_attribution": last}, indent=1))
    tracked = sum(sum(v) for v in last.values())
    print(f"tracked {tracked:.2f}s of {reps[-1]:.2f}s wall (chains overlap)")
    spark.stop()


if __name__ == "__main__":
    main()
