#!/usr/bin/env python
"""Generate CLUSTERED embedding corpora for the ANN recall sweeps
(VERDICT r10 #5): the driver corpus's embeddings are structureless
(recall == scanned fraction in every r10 sweep), so the IVF family's
recall locks never demonstrated what cell pruning buys on data that HAS
neighborhoods. This writes deterministic mixture-of-Gaussians embedding
tables at the sf0.1 size (2000 x 64) and 10x (20000 x 64):

- K_TRUE centers drawn from N(0, I_64) with a fixed seed;
- each vector = its center + NOISE_STD * N(0, I) (cosine-separable:
  with ||center|| ~ 8 and noise sigma 0.25, within-cluster cosine is
  ~0.99+ while cross-cluster cosine centers on 0);
- vec_id sequential (so the N_QUERIES/ARRIVAL_MOD conventions apply
  unchanged), label = mixture component.

Only embeddings.parquet is written — these dirs feed the sweep scripts,
not the registry (the driver's correctness corpora stay untouched).

Usage: python scripts/make_sfclust.py
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIM = 64
K_TRUE = 32
NOISE_STD = 0.25
SEED = 20260816

SIZES = {"sfclust1x": 2000, "sfclust10x": 20000}


def main() -> None:
    rng = np.random.RandomState(SEED)
    centers = rng.standard_normal((K_TRUE, DIM))
    for name, n in SIZES.items():
        comp = rng.randint(0, K_TRUE, size=n)
        vecs = centers[comp] + NOISE_STD * rng.standard_normal((n, DIM))
        dst = os.path.join(REPO, ".bench", name)
        os.makedirs(dst, exist_ok=True)
        table = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(comp.astype(np.int32)),
            }
        )
        pq.write_table(table, os.path.join(dst, "embeddings.parquet"))
        print(f"{dst}: {n} x {DIM}, {K_TRUE} true clusters")


if __name__ == "__main__":
    main()
