#!/usr/bin/env python
"""Round-14 plan evidence dumps into plans/r14/.

Most of this round's changes are PROCEDURAL (merge/init internals that
run several jobs), so alongside the registry-query captures
(scripts/capture_plans.py) this script dumps the .explain("formatted")
of the internal frames the changes rewired, constructing the r13 lineage
and the r14 lineage side by side in one session over the same inputs:

- pair_init_exact_edges_{before,after}: the base exact-edge frame as the
  r13 init derived it (fresh tokenize of the base corpus) vs the r14 init
  (read-back of the just-written shingle store).
- pair_init_lsh_edges_{before,after}: the base LSH edge frame as the r13
  init derived it (full dedup_minhash_lsh over a fresh base tokenize) vs
  the r14 init (exact∩band semi-join over the paired-doc slice of the
  stored shingles).

Usage: python scripts/capture_plans_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "plans", "r14")


def _dump(df, name: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}.txt"), "w") as fh:
        fh.write(plan)
    print(f"wrote plans/r14/{name}.txt ({len(plan)} bytes)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = build_spark(app_name="capture-plans-r14")
    spark.sparkContext.setLogLevel("ERROR")

    from databricks_incremental_lakehouse_spark.llmdata import incrdedup as ID
    from databricks_incremental_lakehouse_spark.llmdata.dedup import (
        _exploded_shingles,
        _jaccard_from_counts,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        lsh_band_candidates,
    )
    from databricks_incremental_lakehouse_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % ID.DOC_ARRIVAL_MOD != 0)

    # r13 lineage (fresh tokenize per product)
    base_ex = _exploded_shingles(base)
    _dump(
        dedup_ngram_jaccard(spark, sf_dir, shingles_ex=base_ex).select(
            "doc_a", "doc_b"
        ),
        "pair_init_exact_edges_before",
    )
    _dump(
        dedup_minhash_lsh(spark, sf_dir, shingles_ex=base_ex).select(
            "doc_a", "doc_b"
        ),
        "pair_init_lsh_edges_before",
    )

    # r14 lineage: build the store once (runs the new init), then read back
    sh_path, edges_path, _lsh, _cc, _arr = ID._exact_pair_index(spark, sf_dir)
    stored = spark.read.parquet(sh_path).select(
        "doc_id", "shingle", "n_shingles"
    )
    _dump(
        _jaccard_from_counts(stored).select("doc_a", "doc_b"),
        "pair_init_exact_edges_after",
    )
    base_edges = spark.read.parquet(edges_path)
    paired_docs = (
        base_edges.select(F.col("doc_a").alias("doc_id"))
        .unionByName(base_edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ex_paired = stored.select("doc_id", "shingle").join(
        F.broadcast(paired_docs), "doc_id", "left_semi"
    )
    _dump(
        base_edges.join(
            lsh_band_candidates(shingles_ex=ex_paired),
            ["doc_a", "doc_b"],
            "left_semi",
        ),
        "pair_init_lsh_edges_after",
    )
    spark.stop()


if __name__ == "__main__":
    main()
