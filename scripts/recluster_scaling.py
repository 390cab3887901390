#!/usr/bin/env python
"""10x cost + recall rows for the ANN recluster lifecycle job
(VERDICT r11 #5): rebucket_store carries a measured 10x row; this gives
recluster_ivf_store the same treatment on BOTH embedding regimes —
the clustered 10x corpus (.bench/sfclust10x) and the structureless 10x
corpus (.bench/sf1ext). Per corpus:

1. build the frozen-codebook append index (one-time init, timed),
2. pre-recluster: append-face search latency (median of 3) + recall@5
   vs the exact brute force, and the store's calibrated serving mode,
3. recluster_ivf_store (the one-time retrain + store rebuild — the
   headline number), timed,
4. post-recluster: search latency + recall again, the regrown nlist,
   the sqrt width / scan fraction, and the re-calibrated mode.

Usage: python scripts/recluster_scaling.py [sf_dir ...]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_incremental_lakehouse_spark.llmdata import similarity as S  # noqa: E402
from databricks_incremental_lakehouse_spark.operators.layout import (  # noqa: E402
    read_store_meta,
)
from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIRS = sys.argv[1:] or [
    os.path.join(REPO, ".bench", "sfclust10x"),
    os.path.join(REPO, ".bench", "sf1ext"),
]
REPS = 3


def _search_stats(spark, sf, exact):
    xs = []
    res = None
    for _ in range(REPS):
        t0 = time.time()
        res = {
            (r.query_id, r.neighbor_id)
            for r in S.sim_ivf_append_search(spark, sf).collect()
        }
        xs.append(time.time() - t0)
    return round(statistics.median(xs), 2), round(
        len(res & exact) / len(exact), 3
    )


def main() -> None:
    spark = build_spark(app_name="recluster_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in DIRS:
        name = os.path.basename(sf.rstrip("/"))
        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.sim_topk_bruteforce(spark, sf).collect()
        }
        t0 = time.time()
        _cent, path, nlist0 = S._ivf_append_index(spark, sf)
        build_s = round(time.time() - t0, 2)
        pre_lat, pre_rec = _search_stats(spark, sf, exact)
        pre_mode = read_store_meta(path).get("nprobe_mode")

        t0 = time.time()
        _cent2, path2, nlist1 = S.recluster_ivf_store(spark, sf)
        recluster_s = round(time.time() - t0, 2)
        post_lat, post_rec = _search_stats(spark, sf, exact)
        meta = read_store_meta(path2)
        sq = S._sqrt_nprobe(nlist1)

        # calibration-alone cost (VERDICT r12 #6): the pass recluster pays
        # on top of the rebuild — now bounded to the CALIB_SAMPLE_MAX
        # candidate slice above the threshold (sidecar calib_sample_mod
        # records the derived modulus; 1 = full store). Idempotent re-run
        # (same sidecar values), median of REPS.
        cal_xs = []
        for _ in range(REPS):
            t0 = time.time()
            S._calibrate_store_nprobe(spark, path2, _cent2, nlist1)
            cal_xs.append(time.time() - t0)
        calibrate_s = round(statistics.median(cal_xs), 2)
        meta = read_store_meta(path2)
        print(
            json.dumps(
                {
                    "corpus": name,
                    "build_once_s": build_s,
                    "recluster_once_s": recluster_s,
                    "nlist_before": nlist0,
                    "nlist_after": nlist1,
                    "search_s_before": pre_lat,
                    "search_s_after": post_lat,
                    "recall_before": pre_rec,
                    "recall_after": post_rec,
                    "mode_before": pre_mode,
                    "mode_after": meta.get("nprobe_mode"),
                    "calib_recall_sqrt_after": meta.get("calib_recall_sqrt"),
                    "sqrt_nprobe_after": sq,
                    "sqrt_scan_frac_after": round(sq / nlist1, 3),
                    "calibrate_once_s": calibrate_s,
                    "calib_sample_mod": meta.get("calib_sample_mod"),
                }
            )
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
