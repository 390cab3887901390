"""Incrementally-maintained near-duplicate index (round 10).

:func:`..llmdata.dedup.dedup_minhash_lsh` is batch recompute: every run
re-shingles and re-signs the whole corpus. At 100 TB the steady state is
a MAINTAINED index — the banded MinHash signatures live as a bucketed
table, and a batch of newly-arrived documents is deduplicated against
the existing corpus by probing only the buckets its band keys hash to,
in O(batch + matched buckets), never rescanning the corpus. This is the
dedup-family twin of the ANN family's ingest-without-retrain
(:func:`..llmdata.similarity.sim_ivf_append_search`) and the text
family's maintained statistics (:mod:`.incrstats`) — MinHash needs no
trained state at all (signatures are per-document), so the maintained
index is exact: the probe's verified pairs hash-equal the full batch
recompute restricted to arrival-involving pairs, which is precisely what
the registry oracle asserts.

Layout: band rows ``(doc_id, band, band_key)`` stored partitioned by
``bucket = hash(band_key) % NUM_INDEX_BUCKETS``. A probe computes the
arrival batch's band rows (shingle + 16 min-hashes over the BATCH only),
collects the distinct bucket ids it touches (driver-bounded by
``NUM_INDEX_BUCKETS``), reads just those partitions, and joins on
``(band, band_key)``. Exact-Jaccard verification re-shingles ONLY the
candidate documents (a semi-join prune into ``documents`` — at
deployment scale the table is clustered by ``doc_id``, see
operators/layout.py, so the verify reads O(candidates) rows). New-vs-new
pairs fall out of the same probe because arrivals are appended to the
store before probing; the least/greatest normalization + distinct
collapses the double match.

Reference: the reference maintains refined tables incrementally
(src/refined/refined_customer_orders.py); it has no dedup surface — this
is part of the LLM-training-data extension brief.
"""

from __future__ import annotations

import os
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rounding import round_dbl
from ..tables import load_table
from .dedup import (
    DEDUP_MINHASH_ORACLE,
    JACCARD_THRESHOLD,
    _doc_shingles,
    minhash_bands,
)
from .incrstats import DOC_ARRIVAL_MOD

# store partitions; a probe prunes to the buckets its band keys hash to.
# A deployment scales this with index size (the incrstats num_buckets
# posture) so probe reads stay batch-bounded as the corpus grows.
NUM_INDEX_BUCKETS = 64

# the _CENT_MEMO discipline: lock (concurrent first calls must not build
# twice) + stale-session eviction (a dead session's entries never pile up)
_IDX_MEMO: dict[tuple, tuple[str, DataFrame]] = {}
_IDX_LOCK = threading.Lock()


def _bucketed(bands: DataFrame) -> DataFrame:
    return bands.withColumn(
        "bucket", F.pmod(F.xxhash64("band_key"), F.lit(NUM_INDEX_BUCKETS))
    )


def _dedup_band_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, DataFrame]:
    """(store_path, pinned arrival band rows): build the banded-signature
    store from the base corpus (``doc_id % DOC_ARRIVAL_MOD != 0`` — the
    append-family split), then ingest the arrival batch by APPENDING its
    band rows to the store (O(batch): only the arrivals are shingled and
    signed; the base corpus is not re-read). Session-memoized per
    ``sf_dir`` so the build is a one-time cost and repeated probes time
    the steady state."""
    skey = id(spark)
    with _IDX_LOCK:
        got = _IDX_MEMO.get((skey, sf_dir))
    if got is None:
        with _IDX_LOCK:
            for stale in [k for k in _IDX_MEMO if k[0] != skey]:
                _IDX_MEMO.pop(stale)
            got = _IDX_MEMO.get((skey, sf_dir))
        if got is None:
            docs = load_table(spark, sf_dir, "documents")
            base = docs.filter(F.col("doc_id") % DOC_ARRIVAL_MOD != 0)
            arrivals = docs.filter(F.col("doc_id") % DOC_ARRIVAL_MOD == 0)
            path = os.path.join(tempfile.mkdtemp(prefix="dedup_idx_"), "bands")
            _bucketed(minhash_bands(base)).write.partitionBy("bucket").parquet(
                path
            )
            # ingest: the arrival batch's band rows, pinned (the probe
            # re-uses them every search) and appended to the store (so
            # later batches would see these docs as index members too)
            arr_bands = (
                _bucketed(minhash_bands(arrivals))
                .localCheckpoint(eager=True)
            )
            arr_bands.write.mode("append").partitionBy("bucket").parquet(path)
            got = (path, arr_bands)
            with _IDX_LOCK:
                _IDX_MEMO[(skey, sf_dir)] = got
    return got


def _clear_idx_memo() -> None:
    with _IDX_LOCK:
        _IDX_MEMO.clear()


from .. import memo as _memo  # noqa: E402 — registration, not a cycle

_memo.register_aux_clear(_clear_idx_memo)


def dedup_minhash_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs introduced by the arrival batch — the maintained
    index's steady-state probe. Candidates come from joining the arrival
    band rows against ONLY the store buckets they hash to (the
    ``basePath`` pruned read — the corpus-sized store is never scanned);
    verification re-shingles only candidate documents. Output matches
    :func:`..llmdata.dedup.dedup_minhash_lsh` restricted to pairs with at
    least one arrival side (MinHash has no trained state, so maintained
    and batch signatures are identical — the exactness contract the
    oracle checks)."""
    path, arr_bands = _dedup_band_index(spark, sf_dir)
    buckets = sorted(
        r["bucket"] for r in arr_bands.select("bucket").distinct().collect()
    )  # driver-bounded by NUM_INDEX_BUCKETS
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
    # verify with exact shingle Jaccard over ONLY the candidate docs: a
    # semi-join prune into documents, then the shared per-doc shingle-set
    # derivation — O(candidates), not O(corpus)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = load_table(spark, sf_dir, "documents").join(
        cand_ids, "doc_id", "left_semi"
    )
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
    return verified.select(
        "doc_a", "doc_b", round_dbl(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


# MinHash signatures are train-free, so the maintained index IS the batch
# recompute on the same corpus: the oracle replays the full banded LSH
# declaratively and restricts to arrival-involving pairs — the probe must
# hash-equal it exactly (no recall relaxation anywhere in this family).
DEDUP_MINHASH_APPEND_ORACLE = f"""
SELECT doc_a, doc_b, jaccard FROM ({DEDUP_MINHASH_ORACLE})
WHERE doc_a % {DOC_ARRIVAL_MOD} = 0 OR doc_b % {DOC_ARRIVAL_MOD} = 0"""


def register_all(register) -> None:
    register(
        "dedup_minhash_append", dedup_minhash_append, DEDUP_MINHASH_APPEND_ORACLE
    )
