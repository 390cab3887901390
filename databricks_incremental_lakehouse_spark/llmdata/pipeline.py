"""Operated corpus-curation pipeline — the LLM-data counterpart of the
sales/supplier DAGs.

``run_corpus_curation`` materializes the full curation funnel as staged
parquet outputs with the same stage capture, fail-fast gates, retry
hooks, and run summary the relational pipelines use
(:mod:`..pipelines.runner`):

1. ``curate_flags``   : the per-document gate flags of ``corpus_curate``
   (every drop explainable — the audit artifact of a curated release).
2. ``curated_corpus`` + ``gate_report`` (concurrent): the kept documents
   with their text, and the per-gate survivor counts a release note
   quotes.
3. ``packed_sequences``: context-window packing over the KEPT corpus
   only (two-phase distributed prefix sum).

Stage shapes are the operators' own; this module only sequences,
materializes, and gates them — at 100 TB each stage is one job chain
over the curated subsets, and the flags/report tables are tiny next to
the corpus.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipelines.runner import (
    _gate,
    _run_stage,
    _run_stages_parallel,
    format_run_summary,
)
from ..tables import load_table
from .curation import corpus_curate, pack_sequences

GATES = (
    "pass_exact",
    "pass_neardup",
    "pass_decontam",
    "pass_quality",
    "pass_sample",
)


def run_corpus_curation(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """Run the curation DAG; returns per-stage results (status/elapsed)."""
    results: dict = {}
    flags_path = os.path.join(out_dir, "flags")
    corpus_path = os.path.join(out_dir, "corpus")
    report_path = os.path.join(out_dir, "report")
    packed_path = os.path.join(out_dir, "packed")

    _run_stage(
        results,
        "curate_flags",
        lambda: corpus_curate(spark, sf_dir)
        .write.mode("overwrite")
        .parquet(flags_path),
    )
    _gate(results, ["curate_flags"], "curation flags")

    def _corpus() -> None:
        kept = (
            spark.read.parquet(flags_path)
            .filter(F.col("is_kept"))
            .select("doc_id")
        )
        (
            load_table(spark, sf_dir, "documents")
            .join(kept, "doc_id")
            .write.mode("overwrite")
            .parquet(corpus_path)
        )

    def _report() -> None:
        flags = spark.read.parquet(flags_path)
        (
            flags.agg(
                F.count(F.lit(1)).alias("n_docs"),
                *[
                    F.sum(F.col(g).cast("long")).alias(f"n_{g}")
                    for g in GATES
                ],
                F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(report_path)
        )

    _run_stages_parallel(
        results, {"curated_corpus": _corpus, "gate_report": _report}
    )
    _gate(results, ["curated_corpus", "gate_report"], "curated corpus")

    _run_stage(
        results,
        "packed_sequences",
        lambda: pack_sequences(
            spark, sf_dir, docs=spark.read.parquet(corpus_path)
        )
        .write.mode("overwrite")
        .parquet(packed_path),
    )

    print(
        format_run_summary("corpus_curation", results),
        file=sys.stderr,
    )
    failed = {k: v for k, v in results.items() if v["status"] != "SUCCESS"}
    if failed:
        raise RuntimeError(f"curation pipeline completed with failures: {failed}")
    return results
