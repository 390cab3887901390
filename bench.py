#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

The LAST stdout line is ONE compact JSON object:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``queries`` holds only the headline components (pipelines + 4 BI queries),
so the line stays well under any tail-buffer limit — round 3 lost its
BENCH record because the full ~60-key per-query dict pushed the leading
fields out of the driver's tail window. The complete per-query timing dict
is printed on an EARLIER stdout line (``bench_detail``) and written to
``BENCH_DETAIL.json`` next to this script.

Workload (BASELINE.md plan): the full sales + supplier pipelines (bronze x8,
silver x3, gold x4 materialized through the warehouse, QC suite) — i.e. the
reference's daily/weekly jobs — plus the 4 README BI queries executed
against the materialized views. Query timings force full computation with a
noop sink (no driver collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databricks_incremental_lakehouse_spark.pipelines import (  # noqa: E402
    LakehouseConfig,
    run_sales_analytics,
    run_supplier_analytics,
)
from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_spark(app_name="dbx-lakehouse-bench")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # JVM/session warmup outside any stage timing, so the first pipeline
    # stage measures its own work rather than executor startup. The
    # range-summary warms codegen; the 5-row parquet round-trip warms the
    # parquet reader/writer + committer classes, which otherwise cost the
    # first extract stage ~5s of one-time class loading at any data size.
    t0 = time.time()
    spark.range(1_000_000).select("id").summary("count").collect()
    with tempfile.TemporaryDirectory() as warm:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(warm, "w"))
    timings["session_warmup"] = round(time.time() - t0, 3)

    with tempfile.TemporaryDirectory() as tmp:
        cfg = LakehouseConfig.from_env_file(
            sf_dir=sf_dir, warehouse_dir=os.path.join(tmp, "warehouse")
        )

        t0 = time.time()
        sales = run_sales_analytics(spark, cfg)
        timings["pipeline_sales"] = round(time.time() - t0, 3)
        for stage, res in sales.items():
            timings[f"sales.{stage}"] = round(res["elapsed"], 3)

        t0 = time.time()
        supplier = run_supplier_analytics(spark, cfg)
        timings["pipeline_supplier"] = round(time.time() - t0, 3)
        for stage, res in supplier.items():
            timings[f"supplier.{stage}"] = round(res["elapsed"], 3)

        # README BI queries over the materialized gold views
        from pyspark.sql import functions as F

        clv = spark.read.parquet(cfg.table_path("views", "vw_customer_lifetime_value"))
        rbr = spark.read.parquet(cfg.table_path("views", "vw_revenue_by_region"))
        spf = spark.read.parquet(cfg.table_path("views", "vw_supplier_performance"))
        mst = spark.read.parquet(cfg.table_path("views", "vw_monthly_sales_trends"))
        bi = {
            "bi_regional_revenue_1998": lambda: _noop(
                rbr.filter(F.col("order_year") == 1998)
            ),
            "bi_top_platinum_clv": lambda: _noop(
                clv.filter(F.col("value_tier") == "Platinum")
                .select("customer_name", "estimated_3yr_clv", "customer_segment")
                .orderBy(F.col("estimated_3yr_clv").desc())
                .limit(20)
            ),
            "bi_strategic_suppliers": lambda: _noop(
                spf.filter(F.col("supplier_tier") == "Tier 1 - Strategic").select(
                    "supplier_name",
                    "supplier_region",
                    "performance_score",
                    "on_time_delivery_rate",
                )
            ),
            "bi_monthly_trend_series": lambda: _noop(
                mst.select(
                    "order_year",
                    "order_month",
                    "total_revenue",
                    "revenue_3mo_moving_avg",
                    "mom_revenue_growth_pct",
                )
            ),
        }
        for name, fn in bi.items():
            t0 = time.time()
            fn()
            timings[name] = round(time.time() - t0, 3)

    # Extension operators (LLM-data + streaming-batch) — timed for the
    # record but kept out of the headline total so `value` stays comparable
    # across rounds (BASELINE.md).
    from databricks_incremental_lakehouse_spark.registry import QUERIES

    ext = [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_ngram_jaccard_capped",
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
        "sim_topk_bruteforce",
        "sim_topk_vectorized",
        "sim_ivf_topk",
        "sim_ivf_topk_indexed",
        "sim_hyperplane_lsh",
        "text_stats",
        "text_langid",
        "sketch_hll_distinct",
        "sketch_cms_heavy_hitters",
        "multimodal_feature_stats",
        "multimodal_frame_sample",
        "events_tumbling_hourly",
        "events_sliding_windows",
        "events_session_windows",
        "events_deduped",
        "events_asof_join",
        "events_rolling_5min",
        "events_funnel",
        "events_retention",
        "sketch_histogram_quantiles",
        "dedup_clusters",
        "dedup_semantic",
        "dedup_substring_spans",
        "dedup_substring_clean",
        "text_decontamination",
        "text_quality_gopher",
        "sample_stratified",
        "sample_temperature",
        "vocab_topk",
        "text_length_quantiles",
        "text_unigram_logprob",
        "text_ccnet_buckets",
        "embedding_quantize",
        "pack_sequences",
        "text_chunk_overlap",
        "vocab_pmi_topk",
        "stream_user_totals",
        "bi_tpch_q1",
        "bi_tpch_q3",
        "bi_tpch_q5",
        "qc_revenue_anomaly",
        "incr_monthly_trends_refresh",
        "incr_customer_orders_refresh",
    ]
    for name in ext:
        t0 = time.time()
        _noop(QUERIES[name](spark, sf_dir))
        timings[f"ext.{name}"] = round(time.time() - t0, 3)

    # the operated curation DAG (flags -> corpus || report -> packing)
    from databricks_incremental_lakehouse_spark.llmdata.pipeline import (
        run_corpus_curation,
    )

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        run_corpus_curation(spark, sf_dir, os.path.join(tmp, "curated"))
        timings["ext.pipeline_curation"] = round(time.time() - t0, 3)

    # steady-state refresh cost: the first incr_* call above paid the full
    # warehouse init; the warehouse is cached per sf_dir and every call
    # re-applies the 50-order update batch, so a second timed call isolates
    # the per-micro-batch cost — the number that matters for the
    # incremental-vs-daily-rebuild comparison.
    t0 = time.time()
    _noop(QUERIES["incr_monthly_trends_refresh"](spark, sf_dir))
    timings["ext.incr_monthly_trends_update_only"] = round(time.time() - t0, 3)

    # same isolation for the ANN index: the first sim_ivf_topk_indexed call
    # above built + persisted the index; a second timed call is the
    # steady-state search-only cost over the cl-partitioned cell store.
    t0 = time.time()
    _noop(QUERIES["sim_ivf_topk_indexed"](spark, sf_dir))
    timings["ext.sim_ivf_search_only"] = round(time.time() - t0, 3)

    total = timings["pipeline_sales"] + timings["pipeline_supplier"] + sum(
        timings[n] for n in bi
    )
    # Full per-query detail: side file + an early stdout line. Neither is the
    # driver's parse target, so their size is unconstrained.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump({"sf": sf, "queries": timings}, fh, indent=1, sort_keys=True)
    print(json.dumps({"bench_detail": timings, "sf": sf}))
    sys.stdout.flush()
    spark.stop()

    headline = {
        "metric": "full_pipeline_plus_bi_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {
            k: timings[k]
            for k in ("pipeline_sales", "pipeline_supplier", *bi)
        },
        "sf": sf,
    }
    # LAST stdout line, compact (~300 bytes): the driver's parse target.
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
