#!/usr/bin/env python
"""Recall-vs-nprobe curves on clustered vs structureless corpora
(VERDICT r10 #5). For each corpus dir: train the auto-dial IVF
(nlist = clamp(isqrt(N))), then sweep nprobe over a RELATIVE grid —
sqrt-family widths (the sub-linear candidates) up to the shipped 5/8
fraction — reporting recall vs the exact top-k, the scanned cell
fraction, and search-only seconds. Also replays the APPEND face (frozen
base-trained codebook, arrivals assigned post-hoc) at the sqrt width on
the clustered corpora, since a frozen codebook is where reduced probes
are most at risk.

Usage: python scripts/clustered_recall_sweep.py [sf_dir ...]
Defaults to the two clustered dirs plus the structureless sf0.1.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_incremental_lakehouse_spark.llmdata import similarity as S  # noqa: E402
from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIRS = sys.argv[1:] or [
    os.path.join(REPO, ".bench", "sfclust1x"),
    os.path.join(REPO, ".bench", "sfclust10x"),
    "/root/testdata/sf0.1",
]


def _grid(nlist: int) -> list[int]:
    rt = math.isqrt(nlist) + (math.isqrt(nlist) ** 2 < nlist)  # ceil sqrt
    auto = max(S.N_PROBE_MIN, (nlist * 5 + 7) // 8)
    widths = sorted(
        {
            max(1, rt // 2),
            rt,
            2 * rt,
            max(S.N_PROBE_MIN, nlist // 4),
            auto,
        }
    )
    return [min(nlist, w) for w in widths]


def main() -> None:
    spark = build_spark(app_name="clustered_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in DIRS:
        emb = S._emb(spark, sf)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.sim_topk_bruteforce(spark, sf).collect()
        }
        cent_rows, cells, nlist = S._kmeans_cells(emb)
        cells = cells.localCheckpoint(eager=True)
        for np_ in _grid(nlist):
            t0 = time.time()
            ivf = {
                (r.query_id, r.neighbor_id)
                for r in S._ivf_search(spark, sf, cent_rows, cells, np_).collect()
            }
            print(
                json.dumps(
                    {
                        "corpus": os.path.basename(sf.rstrip("/")),
                        "nlist": nlist,
                        "nprobe": np_,
                        "scan_frac": round(np_ / nlist, 3),
                        "recall": round(len(ivf & exact) / len(exact), 3),
                        "search_s": round(time.time() - t0, 2),
                    }
                )
            )
        if "sfclust" in sf:
            # append face at the sqrt width: frozen base-trained codebook,
            # arrivals assigned post-hoc — recall over the FULL corpus
            base = emb.filter(F.col("vec_id") % S.ARRIVAL_MOD != 0)
            arrivals = emb.filter(F.col("vec_id") % S.ARRIVAL_MOD == 0)
            cent_b, cells_b, nl_b = S._kmeans_cells(base)
            allc = cells_b.unionByName(
                S._assign_to(arrivals, cent_b)
            ).localCheckpoint(eager=True)
            rt = math.isqrt(nl_b) + (math.isqrt(nl_b) ** 2 < nl_b)
            for np_ in (rt, 2 * rt):
                ivf = {
                    (r.query_id, r.neighbor_id)
                    for r in S._ivf_search(
                        spark, sf, cent_b, allc, min(nl_b, np_)
                    ).collect()
                }
                print(
                    json.dumps(
                        {
                            "corpus": os.path.basename(sf.rstrip("/")),
                            "face": "append_frozen_codebook",
                            "nlist": nl_b,
                            "nprobe": min(nl_b, np_),
                            "recall": round(len(ivf & exact) / len(exact), 3),
                        }
                    )
                )
    spark.stop()


if __name__ == "__main__":
    main()
