#!/usr/bin/env python
"""O(batch) proof + scaling rows for the maintained near-dup index.

Two measurements (BASELINE.md round-10 rows):

1. FIXED-BATCH proof: probe the SAME sf0.1 arrival batch (500 docs)
   against a band index built from the sf0.1 base corpus (4.5k docs)
   vs one built from the 10x sf1ext base corpus (45k docs). O(batch)
   maintenance means the probe cost tracks the BATCH, not the index —
   the incrstats proof shape.
2. 10x row: the registered query end-to-end at sf0.1 vs .bench/sf1ext
   (both the batch and the index scale 10x) — steady-state probe-only
   median after the build, the bench `ext.` key at two SFs.

Usage: python scripts/dedup_append_scaling.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402
from databricks_incremental_lakehouse_spark import memo  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = "/root/testdata/sf0.1"
SF10 = os.path.join(REPO, ".bench", "sf1ext")
REPS = 3


def _probe(spark, index_sf: str, batch_sf: str) -> float:
    """Median probe time of batch_sf's arrival bands against an index
    built from index_sf's base corpus (build untimed; the probe re-runs
    the bucket-pruned join + candidate verify each rep, the steady-state
    ext key shape). Uses the module's own machinery with the arrival
    bands swapped in."""
    import tempfile

    from databricks_incremental_lakehouse_spark.llmdata.dedup import (
        JACCARD_THRESHOLD,
        _doc_shingles,
        minhash_bands,
    )
    from databricks_incremental_lakehouse_spark.llmdata.incrdedup import (
        _bucketed,
    )
    from databricks_incremental_lakehouse_spark.llmdata.incrstats import (
        DOC_ARRIVAL_MOD,
    )
    from databricks_incremental_lakehouse_spark.operators.rounding import (
        round_dbl,
    )
    from databricks_incremental_lakehouse_spark.tables import load_table

    base = load_table(spark, index_sf, "documents").filter(
        F.col("doc_id") % DOC_ARRIVAL_MOD != 0
    )
    arrivals = load_table(spark, batch_sf, "documents").filter(
        F.col("doc_id") % DOC_ARRIVAL_MOD == 0
    )
    path = os.path.join(tempfile.mkdtemp(prefix="dedup_sc_"), "bands")
    _bucketed(minhash_bands(base)).write.partitionBy("bucket").parquet(path)
    arr_bands = _bucketed(minhash_bands(arrivals)).localCheckpoint(eager=True)
    arr_bands.write.mode("append").partitionBy("bucket").parquet(path)

    def run() -> int:
        buckets = sorted(
            r["bucket"] for r in arr_bands.select("bucket").distinct().collect()
        )
        store = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, f"bucket={b}") for b in buckets]
        )
        cand = (
            arr_bands.alias("p")
            .join(store.alias("s"), ["band", "band_key"])
            .filter(F.col("p.doc_id") != F.col("s.doc_id"))
            .select(
                F.least("p.doc_id", "s.doc_id").alias("doc_a"),
                F.greatest("p.doc_id", "s.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        cand_ids = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        docs = load_table(spark, index_sf, "documents").unionByName(
            load_table(spark, batch_sf, "documents")
        ).dropDuplicates(["doc_id"]) if index_sf != batch_sf else load_table(
            spark, index_sf, "documents"
        )
        cand_docs = docs.join(cand_ids, "doc_id", "left_semi")
        ds = _doc_shingles(docs=cand_docs)
        a = ds.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
        b = ds.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
        verified = (
            cand.join(a, "doc_a")
            .join(b, "doc_b")
            .withColumn("n_common", F.size(F.array_intersect("sa", "sb")))
        )
        jac = F.col("n_common") / (
            F.size("sa") + F.size("sb") - F.col("n_common")
        ).cast("double")
        return (
            verified.select(
                "doc_a", "doc_b", round_dbl(jac, 6).alias("jaccard")
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .count()
        )

    n = run()  # warm-up
    times = []
    for _ in range(REPS):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    med = statistics.median(times)
    print(
        f"  index={index_sf.split('/')[-1]} batch={batch_sf.split('/')[-1]}: "
        f"pairs={n} probe_median={med:.2f}s"
    )
    return med


def main() -> None:
    spark = build_spark(app_name="dedup_append_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    print("fixed-batch proof (sf0.1 arrival batch, 1x vs 10x index):")
    memo.clear()
    _probe(spark, SF1, SF1)
    memo.clear()
    _probe(spark, SF10, SF1)

    print("registered-query 10x row (batch and index both scale):")
    from databricks_incremental_lakehouse_spark.registry import QUERIES

    for sf in (SF1, SF10):
        memo.clear()
        q = QUERIES["dedup_minhash_append"]
        t0 = time.time()
        n = q(spark, sf).count()
        build = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            q(spark, sf).count()
            times.append(time.time() - t0)
        print(
            f"  {sf.split('/')[-1]}: pairs={n} "
            f"build_ingest_probe={build:.2f}s "
            f"probe_only={statistics.median(times):.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
