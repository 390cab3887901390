#!/usr/bin/env python
"""Fresh-process workload runner for round-14 alternating-process A/Bs.

This sandbox drifts in waves (OPTIMIZATION_r13.md), so every comparison
runs as A/B/A/B... across two git worktrees (pre-change vs HEAD), one
fresh process per sample, and medians are compared per side.

Usage: python scripts/ab_workload_r14.py <workload> [sf_dir]

Workloads (each prints ONE JSON line):
  incrstats — token-stats warehouse init (timed once) + 3 update cycles
              (apply the arrival batch; timed each) + Spark job count of
              the 3rd cycle (statusTracker job-group count).
  curate    — curation-rollup warehouse init + 3 update cycles.
  pairinit  — the maintained exact-pair index build + pagerank
              (once.pair_index_build_and_pagerank body) in this fresh
              session, then one steady-state probe rep.
  bandinit  — the banded minhash store build + probe
              (once.dedup_index_build_ingest_and_probe body).
  drains    — the 11 stream drain once-keys (state-store/committer A/Bs:
              flip SPARK_GRAFT_STATESTORE / SPARK_GRAFT_COMMITTER_V in
              the env per side).
  pipeline  — one sales + supplier pipeline rep (after one untimed
              warm-up rep), plus per-stage seconds.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    workload = sys.argv[1]
    spark = build_spark(app_name=f"ab_r14_{workload}")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"workload": workload}
    # session warm-up (the bench convention): codegen + parquet I/O classes
    spark.range(1_000_000).select("id").summary("count").collect()
    with tempfile.TemporaryDirectory() as warm:
        spark.read.parquet(os.path.join(SF, "region.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(warm, "w"))

    if workload in ("incrstats", "curate"):
        from pyspark.sql import functions as F

        from databricks_incremental_lakehouse_spark.llmdata import incrstats as I
        from databricks_incremental_lakehouse_spark.tables import load_table

        kind = "token" if workload == "incrstats" else "curate"
        apply_fn = (
            I.apply_doc_updates if kind == "token" else I.apply_curation_docs
        )
        root = tempfile.mkdtemp(prefix=f"ab_{kind}_wh_")
        docs = load_table(spark, SF, "documents")
        base = docs.filter(F.col("doc_id") % I.DOC_ARRIVAL_MOD != 0)
        arrivals = docs.filter(F.col("doc_id") % I.DOC_ARRIVAL_MOD == 0)
        t0 = time.time()
        apply_fn(spark, root, base)
        out["init_sec"] = round(time.time() - t0, 3)
        cycles = []
        sc = spark.sparkContext
        tracker = sc.statusTracker()

        def _all_jobs() -> int:
            # thread-pool jobs carry no group (local properties are not
            # inherited by plain Python threads), so count group-None plus
            # any grouped jobs from the calling thread
            return len(tracker.getJobIdsForGroup(None)) + len(
                tracker.getJobIdsForGroup("cycle")
            )

        for i in range(int(os.environ.get("AB_CYCLES", "3"))):
            sc.setJobGroup("cycle", f"{kind} update cycle {i}")
            n0 = _all_jobs()
            t0 = time.time()
            apply_fn(spark, root, arrivals)
            cycles.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
            out[f"jobs_cycle{i}"] = _all_jobs() - n0
        out["cycles_sec"] = cycles

    elif workload == "pairinit":
        from databricks_incremental_lakehouse_spark.registry import QUERIES

        # bench once-chain warmers (tokenize/shingle codegen) minus the
        # store-building ones, to mirror the chain's session warmth
        for w in ("text_stats", "dedup_minhash_lsh", "graph_pagerank"):
            _noop(QUERIES[w](spark, SF))
        t0 = time.time()
        _noop(QUERIES["graph_pagerank_update_only"](spark, SF))
        out["build_and_pagerank_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        _noop(QUERIES["graph_pagerank_update_only"](spark, SF))
        out["steady_rep_sec"] = round(time.time() - t0, 3)

    elif workload == "bandinit":
        from databricks_incremental_lakehouse_spark.registry import QUERIES

        for w in ("text_stats", "dedup_minhash_lsh"):
            _noop(QUERIES[w](spark, SF))
        t0 = time.time()
        _noop(QUERIES["dedup_minhash_append"](spark, SF))
        out["build_ingest_probe_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        _noop(QUERIES["dedup_minhash_append"](spark, SF))
        out["steady_probe_sec"] = round(time.time() - t0, 3)

    elif workload == "drains":
        from databricks_incremental_lakehouse_spark.registry import QUERIES

        for q in (
            "stream_user_totals",
            "stream_view_purchase_join",
            "stream_view_purchase_left_join",
            "stream_session_windows",
            "stream_tumbling_hourly",
            "stream_funnel",
            "stream_sliding_windows",
            "stream_retention",
            "stream_scd2_history",
            "stream_dedup_redelivery",
            "stream_attribution_last_touch",
        ):
            t0 = time.time()
            _noop(QUERIES[q](spark, SF))
            out[q] = round(time.time() - t0, 3)
        out["statestore"] = os.environ.get("SPARK_GRAFT_STATESTORE", "hdfs")
        out["committer"] = os.environ.get("SPARK_GRAFT_COMMITTER_V", "2")

    elif workload == "pipeline":
        from databricks_incremental_lakehouse_spark.pipelines.runner import (
            LakehouseConfig,
            run_sales_analytics,
            run_supplier_analytics,
        )

        for rep in range(2):  # rep 0 untimed warm-up
            with tempfile.TemporaryDirectory() as tmp:
                cfg = LakehouseConfig.from_env_file(
                    sf_dir=SF, warehouse_dir=os.path.join(tmp, "warehouse")
                )
                t0 = time.time()
                sales = run_sales_analytics(spark, cfg)
                sales_sec = round(time.time() - t0, 3)
                t0 = time.time()
                supplier = run_supplier_analytics(spark, cfg)
                supplier_sec = round(time.time() - t0, 3)
                if rep:
                    out["pipeline_sales_sec"] = sales_sec
                    out["pipeline_supplier_sec"] = supplier_sec
                    out["sales_stages"] = {
                        k: round(v["elapsed"], 3) for k, v in sales.items()
                    }
                    out["supplier_stages"] = {
                        k: round(v["elapsed"], 3) for k, v in supplier.items()
                    }
    else:
        raise SystemExit(f"unknown workload {workload!r}")

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
