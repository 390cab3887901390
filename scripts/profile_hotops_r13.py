"""Round-13 micro-attribution of the top steady-state ext keys.

Times the internal stages of the graph/cc/canonical family and the gold
views with separate wall clocks (one warm-up + N timed reps each), so the
optimization round can attribute seconds to loop iterations / exchanges
instead of guessing from the aggregate bench key.

Usage: python scripts/profile_hotops_r13.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_incremental_lakehouse_spark.session import build_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(out: dict, key: str, fn, reps: int = REPS) -> None:
    fn()  # warm-up
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    out[key] = round(ts[len(ts) // 2], 3)


def main() -> None:
    spark = build_spark(app_name="profile-hotops-r13")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    from databricks_incremental_lakehouse_spark.llmdata.curation import (
        connected_components,
    )
    from databricks_incremental_lakehouse_spark.llmdata.dedup import (
        _exploded_shingles,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )
    from databricks_incremental_lakehouse_spark.llmdata.graph import (
        pagerank_from_pairs,
    )
    from databricks_incremental_lakehouse_spark.tables import load_table

    docs = load_table(spark, SF, "documents")

    # stage 1: the exploded-shingle scan (shared upstream of everything)
    timed(out, "shingles_explode", lambda: _noop(_exploded_shingles(docs)))

    # stage 2: exact-jaccard pair discovery (inverted index + verify)
    timed(out, "ngram_jaccard_pairs", lambda: _noop(dedup_ngram_jaccard(spark, SF)))

    # stage 3: LSH pair discovery
    timed(out, "minhash_lsh_pairs", lambda: _noop(dedup_minhash_lsh(spark, SF)))

    # pin the pair set once so the loop timings below measure ONLY the loop
    pairs = (
        dedup_ngram_jaccard(spark, SF)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_pairs = pairs.count()
    out["n_pairs"] = n_pairs

    # stage 4: the CC min-label loop alone (over pinned pairs)
    timed(
        out,
        "cc_loop_only",
        lambda: _noop(connected_components(docs.select("doc_id"), pairs)),
    )

    # stage 5: the pagerank body alone (over pinned pairs)
    timed(out, "pagerank_body_only", lambda: _noop(pagerank_from_pairs(pairs)))

    # gold views, each from the memoized silver layer (the registry path)
    from databricks_incremental_lakehouse_spark.gold import (
        vw_customer_lifetime_value,
        vw_monthly_sales_trends,
        vw_revenue_by_region,
    )
    from databricks_incremental_lakehouse_spark.silver.order_details import (
        silver_order_details,
    )

    _noop(silver_order_details(spark, SF))  # materialize the shared memo
    timed(out, "gold_clv_from_memo", lambda: _noop(vw_customer_lifetime_value(spark, SF)))
    timed(out, "gold_revenue_from_memo", lambda: _noop(vw_revenue_by_region(spark, SF)))
    timed(out, "gold_monthly_from_memo", lambda: _noop(vw_monthly_sales_trends(spark, SF)))

    # TPC-H Q1 decimal-grid aggregate vs a count-only control over the
    # same filtered scan (attributes q1's cost to the decimal sums)
    from databricks_incremental_lakehouse_spark.analytics import bi_tpch_q1

    li = load_table(spark, SF, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    timed(out, "q1_full", lambda: _noop(bi_tpch_q1(spark, SF)))
    timed(
        out,
        "q1_count_control",
        lambda: _noop(
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.count(F.lit(1)).alias("c")
            )
        ),
    )
    timed(
        out,
        "q1_double_sums_control",
        lambda: _noop(
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity").alias("s1"),
                F.sum("l_extendedprice").alias("s2"),
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("s3"),
                F.sum("l_discount").alias("s4"),
            )
        ),
    )

    print(json.dumps({"sf": SF, "reps": REPS, "timings": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
