"""Sketch aggregates — approximate distinct counts and heavy hitters that
are *deterministically replayable* in the DuckDB oracle.

A 100-TB engine needs one-pass, fixed-memory, mergeable summaries:

- ``sketch_hll_distinct``     : HyperLogLog distinct-user estimate per
  event type (Flajolet et al. 2007), m=512 registers, alongside the exact
  count so the error is visible in the output.
- ``sketch_cms_heavy_hitters``: count-min sketch (Cormode & Muthukrishnan
  2005) over document tokens, d=4 rows x w=256 buckets, top-20 tokens by
  estimated frequency with the exact count and the overestimate.

Why these are oracle-checkable at all: engine-native sketches
(``approx_count_distinct``, datasketches) hash differently per engine, so
their outputs can never hash-match DuckDB. Here every random choice is
derived from the portable md5-based ``hash60`` family (texthash.py), and
all register/bucket arithmetic is integer (bit masks, shifts, binary-string
lengths, integer sums) — the only floating-point steps are one final
multiply/divide (IEEE, correctly rounded, identical across engines) and the
HLL linear-counting ``ln`` (both engines round the estimate to a whole
count, so a last-ulp libm difference cannot surface).

Scale notes (the whole point of sketches):

- HLL registers aggregate as ``groupBy(group, idx).max(rho)`` — partial
  aggregation runs map-side, so the shuffle carries at most
  ``groups x m`` rows no matter how many billions of events scanned, and
  register maxes merge associatively across any partitioning (the
  streaming/cube-friendly property the exact ``COUNT(DISTINCT)`` lacks).
- The CMS table is a constant ``d x w`` cells; the heavy-hitter candidate
  join broadcasts it. The one O(corpus) shuffle is the exact-count
  comparison column, which exists only to exhibit the sketch error — drop
  it and the operator is a pure scan + fixed-size reduce.

The reference has no sketch surface; this extends SURVEY.md §2.4 the same
way the streaming module extends §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import round_dbl
from ..operators.rounding import round_dbl_sql
from ..tables import load_table
from .texthash import (
    TOKENIZE_SQL,
    hash60,
    hash60_sql,
    seeded_hash60_sql,
)
from .tokmemo import doc_token_tf

# --- HyperLogLog ----------------------------------------------------------

HLL_P = 9                      # register-index bits
HLL_M = 1 << HLL_P             # 512 registers
HLL_W = 60 - HLL_P             # 51 bits feed the rank (hash60 is 60-bit)
# alpha_m * m^2 (Flajolet et al. 2007 eq. for m >= 128); embedded as the
# same decimal literal in Spark and DuckDB so both parse the same double
HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M
# register sums are kept as exact integers scaled by 2^(W+1): double
# addition is order-sensitive once the terms span > 53 bits, and Spark's
# partition order differs from DuckDB's
HLL_SCALE = 1 << (HLL_W + 1)   # 2^52


def hll_rho_rows(events: DataFrame) -> DataFrame:
    """(event_type, idx, rho) — one row per event: the register index and
    the rank of the first 1-bit in the 51-bit hash suffix. rho is computed
    from the *binary-string length* of the suffix — ``bin()`` is exact and
    identical in both engines, unlike floating ``log2`` at exact powers of
    two. Exposed so the maintained register warehouse (incrsketch.py)
    sketches a BATCH with the exact lineage the batch operator uses."""
    h = hash60(F.col("user_id").cast("string"))
    return events.select(
        "event_type",
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
        F.shiftright(h, HLL_P).alias("rest"),
    ).withColumn(
        "rho",
        F.when(F.col("rest") == 0, F.lit(HLL_W + 1)).otherwise(
            F.lit(HLL_W + 1) - F.length(F.bin("rest"))
        ),
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(event_type, registers_hit, est_distinct) from a register table
    ``(event_type, idx, m_j)`` — the estimator half of the sketch, shared
    by the batch query and the maintained warehouse (whose registers are
    max-merged incrementally but estimate identically)."""
    groups = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("v"),
        # sum of 2^(52 - m_j) as exact integers (see HLL_SCALE note)
        F.sum(F.expr(f"shiftleft(1L, {HLL_W + 1} - m_j)")).alias("s_hit"),
    )
    s_total = (
        F.col("s_hit") + (F.lit(HLL_M) - F.col("v")) * F.lit(HLL_SCALE)
    ).cast("double")
    raw = F.lit(HLL_ALPHA_M2 * float(HLL_SCALE)) / s_total
    zeros = F.lit(HLL_M) - F.col("v")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return groups.select(
        "event_type",
        F.col("v").cast("int").alias("registers_hit"),
        round_dbl(est, 0).cast("bigint").alias("est_distinct"),
    )


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL distinct-``user_id`` estimate vs the exact
    count (the error-exhibiting comparison column)."""
    events = load_table(spark, sf_dir, "events")
    # map-side partial max per register, then the fixed-size register table
    regs = hll_rho_rows(events).groupBy("event_type", "idx").agg(
        F.max("rho").alias("m_j")
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        hll_estimate(regs)
        .join(exact, "event_type")
        .select(
            "event_type",
            "registers_hit",
            "est_distinct",
            "exact_distinct",
            # ratio of integers can land exactly on a .005 tie — route
            # through the portable decimal grid, not raw double ROUND
            round_dbl(
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct").cast("double")
                * 100,
                2,
            ).alias("rel_error_pct"),
        )
    )


SKETCH_HLL_ORACLE = f"""
WITH h AS (
    SELECT event_type,
           {hash60_sql("CAST(user_id AS VARCHAR)")} AS h
    FROM events
),
r AS (
    SELECT event_type,
           h & {HLL_M - 1} AS idx,
           h >> {HLL_P} AS rest
    FROM h
),
rho AS (
    SELECT event_type, idx,
           CASE WHEN rest = 0 THEN {HLL_W + 1}
                ELSE {HLL_W + 1} - length(bin(rest)) END AS rho
    FROM r
),
regs AS (
    SELECT event_type, idx, max(rho) AS m_j FROM rho GROUP BY 1, 2
),
g AS (
    SELECT event_type,
           count(*) AS v,
           CAST(sum(1::BIGINT << ({HLL_W + 1} - m_j)) AS BIGINT) AS s_hit
    FROM regs GROUP BY 1
),
e AS (
    SELECT event_type,
           CAST({HLL_ALPHA_M2 * float(HLL_SCALE)!r} AS DOUBLE)
               / CAST(s_hit + ({HLL_M} - v) * {HLL_SCALE}::BIGINT AS DOUBLE) AS raw,
           {HLL_M} - v AS zeros,
           v
    FROM g
),
est AS (
    SELECT event_type, v,
           CASE WHEN raw <= {2.5 * HLL_M!r} AND zeros > 0
                THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(zeros AS DOUBLE))
                ELSE raw END AS est_d
    FROM e
),
x AS (
    SELECT event_type, count(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY 1
)
SELECT est.event_type,
       CAST(v AS INT) AS registers_hit,
       CAST({round_dbl_sql("est_d", 0)} AS BIGINT) AS est_distinct,
       exact_distinct,
       {round_dbl_sql(
           "(CAST(" + round_dbl_sql("est_d", 0) + " AS BIGINT) - exact_distinct)"
           " / CAST(exact_distinct AS DOUBLE) * 100", 2)} AS rel_error_pct
FROM est JOIN x ON est.event_type = x.event_type"""


# --- count-min sketch -----------------------------------------------------

CMS_D = 4        # hash rows
CMS_W = 256      # buckets per row
CMS_TOPK = 20


def _cms_bucket(token_col, seed_col, w: int = CMS_W):
    # seed-prefixed member of the portable hash family, folded to a bucket
    return F.pmod(
        hash60(F.concat(seed_col.cast("string"), F.lit("#"), token_col)),
        F.lit(w),
    ).alias("bucket")


def cms_token_estimates(
    spark: SparkSession, sf_dir: str, w: int = CMS_W
) -> DataFrame:
    """Count-min frequency estimate for every distinct document token.

    The counter table equals the streamed sketch — every (token, seed)
    occurrence increments one of d x w counters — but it is built from the
    (token, count) aggregate, incrementing each bucket by the token's
    weight: same-token occurrences always hit the same bucket, so the
    counters are identical while the md5 hash family evaluates once per
    DISTINCT token x seed instead of once per occurrence. (The
    per-occurrence form cost 8.9x at a 10x corpus: md5 + base-16 conv per
    token occurrence was the entire runtime. At stream time the same
    rewrite is the micro-batch's map-side combine.) The estimate for a
    token is the min over its d counters — an overestimate by construction
    (collisions only add), so ``est_count >= exact_count`` always; the
    exact count is carried purely to exhibit that error. ``w`` is a
    parameter so tests can force the collision regime (the synthetic
    corpus vocabulary is smaller than the default row width).
    """
    seeds = F.array(*[F.lit(s) for s in range(CMS_D)])
    # vocabulary-sized aggregate over the shared (doc, token, tf) memo
    # frame (tokmemo.py): SUM(tf) == per-occurrence COUNT(*), the corpus
    # scan is shared session-wide, and both the counter build and the
    # point-query pass re-derive from the cached tf cheaply (the bare
    # .persist() this replaces leaked for the session lifetime)
    tokens = (
        doc_token_tf(spark, sf_dir)
        .groupBy("token")
        .agg(F.sum("tf").alias("exact_count"))
    )
    probes = tokens.select(
        "token", "exact_count", F.explode(seeds).alias("seed")
    ).select(
        "token",
        "exact_count",
        "seed",
        _cms_bucket(F.col("token"), F.col("seed"), w),
    )
    # the d x w counter table (fixed size regardless of corpus size)
    sketch = probes.groupBy("seed", "bucket").agg(
        F.sum("exact_count").alias("c")
    )
    # point-query every distinct token against the broadcast sketch
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document tokens by count-min-estimated frequency (the token
    distribution is the corpus's Zipf-like head — the data shape CMS is
    built for; the deterministic (est desc, token asc) order pins the
    LIMIT boundary for the oracle)."""
    est = cms_token_estimates(spark, sf_dir)
    return (
        est.select(
            "token",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overcount"),
        )
        .orderBy(F.col("est_count").desc(), F.col("token").asc())
        .limit(CMS_TOPK)
    )


def _cms_bucket_sql(tok: str, seed: str) -> str:
    return f"{seeded_hash60_sql(tok, seed)} % {CMS_W}"


SKETCH_CMS_ORACLE = f"""
WITH tok AS (
    SELECT unnest({TOKENIZE_SQL.format(c="text")}) AS token FROM documents
),
seeds(seed) AS (VALUES (0), (1), (2), (3)),
cells AS (
    SELECT seed, {_cms_bucket_sql("token", "seed")} AS bucket
    FROM tok CROSS JOIN seeds
),
sketch AS (
    SELECT seed, bucket, count(*) AS c FROM cells GROUP BY 1, 2
),
tokens AS (
    SELECT token, count(*) AS exact_count FROM tok GROUP BY 1
),
probes AS (
    SELECT token, exact_count, seed,
           {_cms_bucket_sql("token", "seed")} AS bucket
    FROM tokens CROSS JOIN seeds
),
est AS (
    SELECT token, exact_count, min(c) AS est_count
    FROM probes JOIN sketch USING (seed, bucket)
    GROUP BY 1, 2
)
SELECT token, est_count, exact_count, est_count - exact_count AS overcount
FROM est
ORDER BY est_count DESC, token ASC
LIMIT {CMS_TOPK}"""


# --- fixed-width histogram quantiles --------------------------------------

HIST_WIDTH = 5.0  # bucket width over events.value (range ~0-500)
HIST_QUANTILES = (0.5, 0.9, 0.99)


def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-width-histogram quantile estimates per event type,
    alongside the exact PERCENTILE_DISC values so the bucket-width error
    is visible in the output.

    The sketch state is (group, bucket) counts — bounded by the value
    domain / HIST_WIDTH regardless of event volume, built with one
    map-side-combined aggregation, and mergeable by simple addition
    (micro-batches, partitions, or days sum cell-wise; the exact
    quantile's sorted state does not). The estimate for quantile q is the
    UPPER edge of the first bucket whose cumulative count reaches
    ceil(q*n): always >= the exact value and within HIST_WIDTH of it.
    Bucketing is floor(value/width) — exact IEEE arithmetic in both
    engines, so the DuckDB oracle replays the sketch bit-for-bit. The
    exact columns reuse the cumulative distinct-value-count construction
    of ``text_length_quantiles`` (no per-group row sort)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    from pyspark.sql import Window

    b = ev.select(
        "event_type",
        "value",
        F.floor(F.col("value") / F.lit(HIST_WIDTH)).cast("long").alias("bkt"),
    )
    # sketch state: (group, bucket) counts
    hist = b.groupBy("event_type", "bkt").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bkt",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    est_cols = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("n")),
                (F.col("bkt") + 1) * F.lit(HIST_WIDTH),
            )
        ).alias(f"est_p{int(q * 100)}")
        for q in HIST_QUANTILES
    ]
    est = cum.groupBy("event_type").agg(
        F.max("n").alias("n_events"), *est_cols
    )

    # exact PERCENTILE_DISC via cumulative distinct-value counts
    vals = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wvcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vcum = vals.select(
        "event_type",
        "value",
        F.sum("c").over(wvcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    ex_cols = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("value")
            )
        ).alias(f"exact_p{int(q * 100)}")
        for q in HIST_QUANTILES
    ]
    exact = vcum.groupBy("event_type").agg(*ex_cols)
    return est.join(exact, "event_type")


_HQ_EST_SQL = ",\n    ".join(
    f"MIN(CASE WHEN cum >= CEIL({q} * n) THEN (bkt + 1) * {HIST_WIDTH} END)"
    f" AS est_p{int(q * 100)}"
    for q in HIST_QUANTILES
)
_HQ_EXACT_SQL = ",\n    ".join(
    f"MIN(CASE WHEN cum >= CEIL({q} * n) THEN value END) AS exact_p{int(q * 100)}"
    for q in HIST_QUANTILES
)

SKETCH_HISTOGRAM_ORACLE = f"""
WITH ev AS (
    SELECT event_type, CAST(value AS DOUBLE) AS value FROM events
),
hist AS (
    SELECT event_type, CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bkt,
        COUNT(*) AS c
    FROM ev GROUP BY 1, 2
),
cum AS (
    SELECT event_type, bkt,
        SUM(c) OVER (PARTITION BY event_type ORDER BY bkt
                     ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(c) OVER (PARTITION BY event_type) AS n
    FROM hist
),
est AS (
    SELECT event_type, MAX(n) AS n_events,
    {_HQ_EST_SQL}
    FROM cum GROUP BY event_type
),
vals AS (
    SELECT event_type, value, COUNT(*) AS c FROM ev GROUP BY 1, 2
),
vcum AS (
    SELECT event_type, value,
        SUM(c) OVER (PARTITION BY event_type ORDER BY value
                     ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(c) OVER (PARTITION BY event_type) AS n
    FROM vals
),
exact AS (
    SELECT event_type,
    {_HQ_EXACT_SQL}
    FROM vcum GROUP BY event_type
)
SELECT est.event_type, CAST(n_events AS BIGINT) AS n_events,
    CAST(est_p50 AS DOUBLE) AS est_p50, CAST(est_p90 AS DOUBLE) AS est_p90,
    CAST(est_p99 AS DOUBLE) AS est_p99, exact_p50, exact_p90, exact_p99
FROM est JOIN exact ON est.event_type = exact.event_type"""


# --- KMV (k minimum values) -----------------------------------------------

KMV_K = 64  # sketch size per group
KMV_DOMAIN = float(1 << 60)  # hash60 domain, exact as a double


def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between every pair of event types via KMV
    (k-minimum-values / bottom-k) sketches — the mergeable set-operation
    summary HLL lacks: two KMVs union by keeping the k smallest of the
    merged hash sets (associative, order-independent — which is why this
    sketch IS oracle-replayable while e.g. space-saving top-k, whose
    state depends on arrival order, is not).

    Estimators (Beyer et al. 2007): with ``m = min(k, |union|)`` kept
    values and ``h_m`` the largest kept hash, the union's distinct count
    is ``(m-1) * 2^60 / h_m``; Jaccard is the fraction of kept values
    present in both sides; the intersection estimate is their product.
    When ``m < k`` the sketch is NOT full — it holds the entire union, so
    ``m`` IS the exact distinct count and the tail estimator would bias
    low (degenerate at m=1: est_union=0 even with est_jaccard=1.0); per
    Beyer et al. the unfull sketch reports the exact count (ADVICE r5).
    Exact counterparts ride along so the error is visible.

    Scale: the per-type sketch is ``groupBy(type).top-k(hash)`` — the
    shuffle after map-side partial aggregation carries at most
    ``types x k`` rows; pair scoring touches only the tiny sketch table.
    The one O(data) shuffle is the exact-comparison column, as in the
    other sketches. Int64 -> double conversion of the same value rounds
    identically on both engines (IEEE round-to-nearest), so the
    estimator divisions are bit-portable."""
    events = load_table(spark, sf_dir, "events")
    uh = (
        events.select(
            "event_type", hash60(F.col("user_id").cast("string")).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kmv = uh.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    types = kmv.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .join(
            types.select(F.col("event_type").alias("tb")),
            F.col("ta") < F.col("tb"),
        )
    )
    ka = kmv.select(F.col("event_type").alias("ta"), "h")
    kb = kmv.select(F.col("event_type").alias("tb"), "h")
    merged = (
        pairs.join(ka, "ta")
        .select("ta", "tb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(kb, "tb").select(
                "ta", "tb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("ta", "tb", "h")
        .agg(F.max("in_a").alias("a"), F.max("in_b").alias("b"))
    )
    wm = Window.partitionBy("ta", "tb").orderBy("h")
    kept = merged.withColumn("rn", F.row_number().over(wm)).filter(
        F.col("rn") <= KMV_K
    )
    est = kept.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("a") * F.col("b")).alias("common"),
        F.max("h").alias("h_m"),
    )
    j = round_dbl(F.col("common").cast("double") / F.col("m").cast("double"), 6)
    u = F.when(F.col("m") < F.lit(KMV_K), F.col("m").cast("bigint")).otherwise(
        round_dbl(
            (F.col("m") - F.lit(1)).cast("double")
            * F.lit(KMV_DOMAIN)
            / F.col("h_m").cast("double"),
            0,
        ).cast("bigint")
    )
    est = est.select(
        "ta",
        "tb",
        j.alias("est_jaccard"),
        u.alias("est_union"),
        round_dbl(j * u.cast("double"), 0).cast("bigint").alias("est_common"),
    )
    du = events.select("event_type", "user_id").distinct()
    exact = (
        du.select(F.col("event_type").alias("ta"), "user_id")
        .join(
            du.select(F.col("event_type").alias("tb"), "user_id"),
            "user_id",
        )
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("exact_common"))
    )
    return est.join(exact, ["ta", "tb"], "left").select(
        "ta",
        "tb",
        "est_jaccard",
        "est_union",
        "est_common",
        F.coalesce(F.col("exact_common"), F.lit(0))
        .cast("bigint")
        .alias("exact_common"),
    )


SKETCH_KMV_ORACLE = f"""
WITH uh AS (
    SELECT DISTINCT event_type, {hash60_sql("CAST(user_id AS VARCHAR)")} AS h
    FROM events
),
kmv AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM uh
    ) WHERE rn <= {KMV_K}
),
pairs AS (
    SELECT x.event_type AS ta, y.event_type AS tb
    FROM (SELECT DISTINCT event_type FROM kmv) x
    JOIN (SELECT DISTINCT event_type FROM kmv) y ON x.event_type < y.event_type
),
merged AS (
    SELECT ta, tb, h, MAX(in_a) AS a, MAX(in_b) AS b FROM (
        SELECT p.ta, p.tb, k.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN kmv k ON k.event_type = p.ta
        UNION ALL
        SELECT p.ta, p.tb, k.h, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN kmv k ON k.event_type = p.tb
    ) GROUP BY 1, 2, 3
),
kept AS (
    SELECT ta, tb, h, a, b FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM merged
    ) WHERE rn <= {KMV_K}
),
est AS (
    SELECT ta, tb,
        {round_dbl_sql("CAST(SUM(a * b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 6)}
            AS est_jaccard,
        CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS BIGINT)
             ELSE CAST({round_dbl_sql(
                 "CAST(COUNT(*) - 1 AS DOUBLE) * " + repr(KMV_DOMAIN)
                 + " / CAST(MAX(h) AS DOUBLE)", 0)} AS BIGINT)
        END AS est_union
    FROM kept GROUP BY 1, 2
),
exact AS (
    SELECT x.ta, y.tb, COUNT(*) AS exact_common FROM
        (SELECT DISTINCT event_type AS ta, user_id FROM events) x
    JOIN (SELECT DISTINCT event_type AS tb, user_id FROM events) y
      ON x.user_id = y.user_id AND x.ta < y.tb
    GROUP BY 1, 2
)
SELECT e.ta, e.tb, e.est_jaccard, e.est_union,
    CAST({round_dbl_sql("e.est_jaccard * CAST(e.est_union AS DOUBLE)", 0)}
         AS BIGINT) AS est_common,
    CAST(COALESCE(x.exact_common, 0) AS BIGINT) AS exact_common
FROM est e LEFT JOIN exact x ON e.ta = x.ta AND e.tb = x.tb"""


# --- Bloom filter ---------------------------------------------------------

BLOOM_M = 1024  # filter bits
BLOOM_WORD = 32  # bits packed per BIGINT word (1<<31 stays positive signed)
BLOOM_K = 4  # hash functions (seed-prefixed portable family)
BLOOM_PROBES = 20  # doc_id < 20 are the membership probe set


def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-``source`` Bloom filters over document text + membership probes
    — the third mergeable-summary family (HLL counts distincts, CMS counts
    frequencies, Bloom answers set membership, e.g. "has this benchmark
    document been ingested from that source?").

    Build: each doc sets ``BLOOM_K`` seed-hashed bit positions in its
    source's ``BLOOM_M``-bit filter, materialized as 32 BIGINT words via a
    ``bit_or`` aggregate — map-side partial OR, so the shuffle carries at
    most ``sources x words`` rows regardless of corpus size, and filters
    merge associatively across any partitioning (the streaming/union
    property). Probe: the first ``BLOOM_PROBES`` docs test against EVERY
    source's filter; ``present`` requires all k bits set — Bloom's
    guarantee of no false negatives for the doc's own source, and the
    observed false-positive rate across other sources exhibits the
    m/k/n trade-off in the output (asserted in tests).

    All bit arithmetic is integer (portable); the only hashes are the
    seed-prefixed ``hash60`` family DuckDB replays exactly."""
    from .texthash import seeded_hash60

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    pos = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array(
                *[
                    (seeded_hash60(F.col("text"), s) % BLOOM_M).cast("int")
                    for s in range(BLOOM_K)
                ]
            )
        ).alias("pos"),
    ).select(
        "doc_id",
        "source",
        F.expr(f"pos div {BLOOM_WORD}").alias("word"),
        F.expr(f"shiftleft(1L, pos % {BLOOM_WORD})").alias("mask"),
    )
    filt = pos.groupBy("source", "word").agg(F.bit_or("mask").alias("bits"))
    probes = pos.filter(F.col("doc_id") < BLOOM_PROBES).select(
        F.col("doc_id").alias("probe_doc_id"), "word", "mask"
    )
    sources = docs.select("source").distinct()
    tested = (
        probes.crossJoin(F.broadcast(sources))
        .join(
            F.broadcast(filt).withColumnRenamed("source", "f_source"),
            (F.col("f_source") == F.col("source"))
            & (filt["word"] == probes["word"]),
            "left",
        )
        .select(
            "probe_doc_id",
            "source",
            F.when(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                != 0,
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
    )
    return tested.groupBy("probe_doc_id", "source").agg(
        F.sum("hit").cast("int").alias("n_hits"),
        (F.sum("hit") == F.lit(BLOOM_K)).alias("present"),
    )


SKETCH_BLOOM_ORACLE = f"""
WITH d AS (SELECT doc_id, source, text FROM documents),
pos AS (
    SELECT doc_id, source,
        CAST({seeded_hash60_sql("text", "seed")} % {BLOOM_M} AS INT) AS pos
    FROM d CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS seed)
),
bits AS (
    SELECT doc_id, source, pos // {BLOOM_WORD} AS word,
        CAST(1 AS BIGINT) << (pos % {BLOOM_WORD}) AS mask
    FROM pos
),
filt AS (
    SELECT source, word, bit_or(mask) AS bits
    FROM bits GROUP BY 1, 2
),
probe AS (
    SELECT doc_id AS probe_doc_id, word, mask FROM bits
    WHERE doc_id < {BLOOM_PROBES}
),
src AS (SELECT DISTINCT source FROM d)
SELECT probe_doc_id, s.source,
    CAST(SUM(CASE WHEN (COALESCE(f.bits, 0) & p.mask) <> 0 THEN 1 ELSE 0 END)
         AS INT) AS n_hits,
    SUM(CASE WHEN (COALESCE(f.bits, 0) & p.mask) <> 0 THEN 1 ELSE 0 END)
        = {BLOOM_K} AS present
FROM probe p
CROSS JOIN src s
LEFT JOIN filt f ON f.source = s.source AND f.word = p.word
GROUP BY 1, 2"""


def register_all(register) -> None:
    register(
        "sketch_bloom_membership", sketch_bloom_membership, SKETCH_BLOOM_ORACLE
    )
    register("sketch_kmv_overlap", sketch_kmv_overlap, SKETCH_KMV_ORACLE)
    register("sketch_hll_distinct", sketch_hll_distinct, SKETCH_HLL_ORACLE)
    register(
        "sketch_hll_rollup_daily", sketch_hll_rollup_daily, SKETCH_HLL_ROLLUP_ORACLE
    )
    register("sketch_cms_heavy_hitters", sketch_cms_heavy_hitters, SKETCH_CMS_ORACLE)
    register(
        "sketch_histogram_quantiles",
        sketch_histogram_quantiles,
        SKETCH_HISTOGRAM_ORACLE,
    )


def sketch_hll_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user estimates obtained by MERGING hour-grain HLL
    sketches — the mergeable-sketch rollup a 100-TB pipeline runs instead
    of rescanning the fact for every grain.

    Stage 1 materializes the hour-grain register table ((day, hour, idx)
    -> max rho): that is the sketch a production pipeline persists next
    to its hourly rollups. Stage 2 produces the DAY grain purely by
    register-wise MAX over that tiny table (HLL's merge operator —
    max is associative/commutative, so merging hour sketches equals
    sketching the day directly, exactly) and estimates from the merged
    registers. The fact is scanned ONCE for any number of coarser grains
    (day here; week/month are further max-merges of the same table).
    ``n_hours`` reports how many hourly sketches each day merged.

    Same portable fixed-point register arithmetic as
    :func:`sketch_hll_distinct`; the DuckDB oracle replays both stages."""
    events = load_table(spark, sf_dir, "events")
    h = hash60(F.col("user_id").cast("string"))
    reg = (
        events.select(
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hour"),
            h.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
            F.shiftright(h, HLL_P).alias("rest"),
        )
        .withColumn(
            "rho",
            F.when(F.col("rest") == 0, F.lit(HLL_W + 1)).otherwise(
                F.lit(HLL_W + 1) - F.length(F.bin("rest"))
            ),
        )
    )
    # the persisted hour-grain sketch table: O(days x 24 x m) rows max
    hourly = reg.groupBy("day", "hour", "idx").agg(F.max("rho").alias("m_j"))
    # day grain = register-wise merge of the hour sketches (no fact scan)
    daily_regs = hourly.groupBy("day", "idx").agg(F.max("m_j").alias("m_j"))
    n_hours = hourly.select("day", "hour").distinct().groupBy("day").agg(
        F.count(F.lit(1)).alias("n_hours")
    )
    groups = daily_regs.groupBy("day").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_W + 1} - m_j)")).alias("s_hit"),
    )
    s_total = (
        F.col("s_hit") + (F.lit(HLL_M) - F.col("v")) * F.lit(HLL_SCALE)
    ).cast("double")
    raw = F.lit(HLL_ALPHA_M2 * float(HLL_SCALE)) / s_total
    zeros = F.lit(HLL_M) - F.col("v")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    exact = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        groups.select(
            "day",
            F.col("v").cast("int").alias("registers_hit"),
            round_dbl(est, 0).cast("bigint").alias("est_distinct"),
        )
        .join(n_hours, "day")
        .join(exact, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "n_hours",
            "registers_hit",
            "est_distinct",
            "exact_distinct",
            round_dbl(
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct").cast("double")
                * 100,
                2,
            ).alias("rel_error_pct"),
        )
    )


SKETCH_HLL_ROLLUP_ORACLE = f"""
WITH h AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hour,
           {hash60_sql("CAST(user_id AS VARCHAR)")} AS h
    FROM events
),
r AS (
    SELECT day, hour,
           h & {HLL_M - 1} AS idx,
           h >> {HLL_P} AS rest
    FROM h
),
rho AS (
    SELECT day, hour, idx,
           CASE WHEN rest = 0 THEN {HLL_W + 1}
                ELSE {HLL_W + 1} - length(bin(rest)) END AS rho
    FROM r
),
hourly AS (
    SELECT day, hour, idx, max(rho) AS m_j FROM rho GROUP BY 1, 2, 3
),
daily AS (
    SELECT day, idx, max(m_j) AS m_j FROM hourly GROUP BY 1, 2
),
nh AS (
    SELECT day, count(DISTINCT hour) AS n_hours FROM hourly GROUP BY 1
),
g AS (
    SELECT day,
           count(*) AS v,
           CAST(sum(1::BIGINT << ({HLL_W + 1} - m_j)) AS BIGINT) AS s_hit
    FROM daily GROUP BY 1
),
e AS (
    SELECT day,
           CAST({HLL_ALPHA_M2 * float(HLL_SCALE)!r} AS DOUBLE)
               / CAST(s_hit + ({HLL_M} - v) * {HLL_SCALE}::BIGINT AS DOUBLE) AS raw,
           {HLL_M} - v AS zeros,
           v
    FROM g
),
est AS (
    SELECT day, v,
           CASE WHEN raw <= {2.5 * HLL_M!r} AND zeros > 0
                THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(zeros AS DOUBLE))
                ELSE raw END AS est_d
    FROM e
),
x AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           count(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY 1
)
SELECT CAST(est.day AS VARCHAR) AS day,
       nh.n_hours,
       CAST(v AS INT) AS registers_hit,
       CAST({round_dbl_sql("est_d", 0)} AS BIGINT) AS est_distinct,
       exact_distinct,
       {round_dbl_sql(
           "(CAST(" + round_dbl_sql("est_d", 0) + " AS BIGINT) - exact_distinct)"
           " / CAST(exact_distinct AS DOUBLE) * 100", 2)} AS rel_error_pct
FROM est
JOIN nh ON est.day = nh.day
JOIN x ON est.day = x.day"""
