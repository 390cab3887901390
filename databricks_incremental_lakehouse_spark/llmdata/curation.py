"""Corpus-curation operators — the steps after near-dup *detection* that an
LLM training-data pipeline actually ships:

- ``dedup_clusters``        : connected components over the MinHash-LSH
  near-dup pair graph -> one canonical survivor per duplicate cluster.
- ``text_decontamination``  : n-gram-overlap check of the training corpus
  against a held-out benchmark set (train/test contamination audit).
- ``sample_stratified``     : deterministic hash-based stratified sampling
  with per-language rates (+ a per-stratum summary query).
- ``pack_sequences``        : greedy token packing of the corpus into
  fixed-size context windows via a distributed prefix sum.

All arithmetic that crosses the engine boundary is integer (portable md5
hash60, integer division) or routed through the portable decimal rounding
grid, so every operator here is oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..pinning import pin

from ..operators import round_dbl, round_dbl_sql
from ..tables import load_table
from .dedup import (
    DEDUP_MINHASH_ORACLE,
    _SHINGLES_CTE,
    dedup_minhash_lsh,
    doc_shingles_ex,
)
from .texthash import TOKENIZE_SQL, hash60, hash60_sql, tokenize

# --- dedup_clusters -------------------------------------------------------

MAX_CC_ITERS = 20  # safety bound; real runs converge in O(cluster diameter)


def dedup_clusters(
    spark: SparkSession, sf_dir: str, shingles_ex: DataFrame | None = None
) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup pairs: every doc
    mapped to its cluster's canonical id (the minimum doc_id reachable
    through dup edges); singletons map to themselves. ``shingles_ex``
    optionally supplies a precomputed exploded-shingle stage shared with
    another consumer (see graph.dedup_canonical_selection).

    Algorithm: iterative min-label propagation (hash-to-min). Each round a
    node's label becomes min(own label, neighbors' labels) — one equi-join
    + min-aggregate per round, converging in O(cluster diameter) rounds
    (near-dup clusters are shallow: dup pairs chain only through shared
    content). The edge list and label frame are ``localCheckpoint``-ed per
    round so lineage stays O(1) instead of growing per iteration; the only
    driver-side values are the per-round changed-row counts (scalars).
    At 100 TB the same loop holds — each round is a shuffle on doc_id — and
    heavy-skew graphs would swap in the large-star/small-star variant
    (Kiveris et al.), which this loop structure accommodates.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir, shingles_ex=shingles_ex).select(
        "doc_a", "doc_b"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = connected_components(docs, pairs)
    return labels.select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_kept"),
    )


def connected_components(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id) labels of the undirected pair graph — the
    min-label-propagation loop of :func:`dedup_clusters`, factored over an
    arbitrary (doc_a, doc_b) edge set so composite queries can run it on
    edges they already hold (graph.dedup_canonical_selection).

    The iteration runs ONLY over edge-incident nodes: a node with no dup
    edge keeps its own label forever, so singletons — the overwhelming
    majority of any deduplicated corpus — are joined back once at the
    end instead of riding through every round's shuffle + checkpoint.
    At 100 TB that makes per-round cost proportional to the near-dup
    subgraph, not the corpus."""
    labels = edge_incident_labels(pairs)
    return docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("canonical_id", F.col("doc_id")).alias("canonical_id"),
    )


def edge_incident_labels(pairs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id) min-label fixpoint over ONLY the nodes that
    appear in ``pairs`` — the loop body of :func:`connected_components`,
    factored so the maintained-store init can persist base-graph labels
    (incrdedup._exact_pair_index) and merge them incrementally instead of
    re-running this loop per batch (VERDICT r11 #1)."""
    # materialize the pair pipeline once, PRE-PARTITIONED on the loop's
    # probe key (r13 optimization, guide §2.4): every round joins
    # ``edges.dst == labels.doc_id``, so pinning hash(dst) here lets each
    # round reuse this layout instead of re-exchanging the edge side;
    # labels stay hash(doc_id)-partitioned through the round (join output
    # keyed on doc_id, preserved by localCheckpoint), so the only
    # per-round exchange left is the groupBy(src) aggregate.
    edges = (
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .repartition("dst")
        .transform(pin)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("canonical_id"))
        .transform(pin)
    )
    for _ in range(MAX_CC_ITERS):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("canonical_id").alias("nbr_min"))
        )
        # labels only ever DECREASE (min-label propagation), so "this
        # round changed something" is exactly "some nbr_min undercut the
        # node's label" — a flag computable inside the same projection.
        # The previous form re-joined new vs old labels per round (one
        # more shuffle + job per round) to learn the same bit (r13
        # optimization; same fixpoint, same termination round).
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("canonical_id"),
                    F.coalesce("nbr_min", F.col("canonical_id")),
                ).alias("canonical_id"),
                (F.col("nbr_min") < F.col("canonical_id")).alias("_chg"),
            )
            .transform(pin)
        )
        changed = new_labels.filter("_chg").limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels


DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({DEDUP_MINHASH_ORACLE}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(doc_id, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT doc_id, MIN(r) AS canonical_id, MIN(r) = doc_id AS is_kept
FROM reach GROUP BY doc_id"""


# --- text_decontamination -------------------------------------------------

# Held-out "benchmark" set: every 20th document stands in for an eval
# benchmark (a real pipeline would load the benchmark corpus as a second
# table; the operator shape — small distinct-ngram set broadcast against
# the corpus inverted index — is identical).
BENCH_MOD = 20
CONTAMINATION_RATIO = 0.2


def text_decontamination(
    spark: SparkSession, sf_dir: str, shingles_ex: DataFrame | None = None
) -> DataFrame:
    """Train/test contamination audit: for each non-benchmark document, the
    fraction of its 3-token shingles that also appear in the benchmark
    set, and a flag at the standard >= 20% overlap threshold.

    The benchmark shingle set is DISTINCT and tiny relative to the corpus
    (eval suites are ~1e-5 of training tokens), so it broadcasts; the
    corpus side stays a streamed scan of the exploded shingle index — one
    broadcast-hash join + one groupBy(doc_id), no shuffle of the corpus
    text itself. Verification-grade exact overlap (no sketching): the
    candidate volume is bounded by the benchmark set size, not the corpus.
    ``shingles_ex`` optionally supplies a precomputed exploded-shingle
    stage shared with the other funnel gates (corpus_curate).
    """
    ex = (
        shingles_ex
        if shingles_ex is not None
        else doc_shingles_ex(spark, sf_dir)
    )
    bench = (
        ex.filter(F.col("doc_id") % BENCH_MOD == 0).select("shingle").distinct()
    )
    ev = ex.filter(F.col("doc_id") % BENCH_MOD != 0)
    hits = (
        ev.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    per_doc = ev.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    ratio = F.col("n_contaminated") / F.col("n_ngrams").cast("double")
    return (
        per_doc.join(hits, "doc_id", "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .select(
            "doc_id",
            "n_ngrams",
            "n_contaminated",
            round_dbl(ratio, 6).alias("contamination_ratio"),
            (ratio >= CONTAMINATION_RATIO).alias("is_contaminated"),
        )
    )


TEXT_DECONTAMINATION_ORACLE = f"""
WITH sh AS ({_SHINGLES_CTE}),
bench AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0
),
ev AS (
    SELECT doc_id, shingle, n_shingles AS n_ngrams
    FROM sh WHERE doc_id % {BENCH_MOD} <> 0
),
hits AS (
    SELECT doc_id, COUNT(*) AS n_contaminated
    FROM ev JOIN bench USING (shingle)
    GROUP BY doc_id
)
SELECT d.doc_id, d.n_ngrams,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       CAST(ROUND(CAST(CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
            / CAST(d.n_ngrams AS DOUBLE) AS DECIMAL(38,10)), 6) AS DOUBLE)
           AS contamination_ratio,
       CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(d.n_ngrams AS DOUBLE)
           >= {CONTAMINATION_RATIO} AS is_contaminated
FROM (SELECT DISTINCT doc_id, n_ngrams FROM ev) d
LEFT JOIN hits h USING (doc_id)"""


# --- sample_stratified ----------------------------------------------------

# Per-stratum keep rates as EXACT integer thresholds on the 60-bit hash
# (rate * 2^60, precomputed in Python) — membership is a pure integer
# comparison, bit-identical across engines; no float boundary exists.
SAMPLE_RATE_EN = 0.5
SAMPLE_RATE_OTHER = 0.2
_TH_EN = int(SAMPLE_RATE_EN * 2**60)
_TH_OTHER = int(SAMPLE_RATE_OTHER * 2**60)
_SAMPLE_KEY = "sample#"


def _sample_kept(docs: DataFrame) -> DataFrame:
    h = hash60(F.concat(F.lit(_SAMPLE_KEY), F.col("doc_id").cast("string")))
    th = F.when(F.col("lang") == "en", F.lit(_TH_EN)).otherwise(F.lit(_TH_OTHER))
    return docs.withColumn("_h", h).filter(F.col("_h") < th)


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of the corpus: keep 50% of English
    documents and 20% of every other language, by comparing a portable
    60-bit content-independent hash of the doc_id against precomputed
    integer thresholds.

    Hash-threshold sampling is the scale-correct shape: no global count,
    no sort, no state — a pure filter that parallelizes perfectly, is
    reproducible run-to-run, and composes with incremental ingest (a doc's
    membership never changes as the corpus grows, unlike rate-based
    ``df.sample``). The filter is a codegen'd scan predicate.
    """
    docs = load_table(spark, sf_dir, "documents")
    return _sample_kept(docs).select("doc_id", "lang", "source")


_SAMPLE_HASH_SQL = hash60_sql(f"concat('{_SAMPLE_KEY}', CAST(doc_id AS VARCHAR))")
_SAMPLE_PRED = (
    f"{_SAMPLE_HASH_SQL} < CASE WHEN lang = 'en' THEN {_TH_EN} ELSE {_TH_OTHER} END"
)

SAMPLE_STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, source FROM documents WHERE {_SAMPLE_PRED}"""


def sample_stratified_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum audit of the sample: total docs, kept docs, realized
    rate — the report a curation run logs next to its target rates."""
    docs = load_table(spark, sf_dir, "documents")
    kept = _sample_kept(docs).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    rate = F.col("n_sampled") / F.col("n_total").cast("double")
    return (
        totals.join(kept, "lang", "left")
        .withColumn("n_sampled", F.coalesce("n_sampled", F.lit(0)))
        .select(
            "lang", "n_total", "n_sampled", round_dbl(rate, 6).alias("realized_rate")
        )
    )


SAMPLE_STRATIFIED_COUNTS_ORACLE = f"""
SELECT lang, COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE {_SAMPLE_PRED}) AS n_sampled,
       CAST(ROUND(CAST(CAST(COUNT(*) FILTER (WHERE {_SAMPLE_PRED}) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(38,10)), 6) AS DOUBLE)
           AS realized_rate
FROM documents GROUP BY lang"""


# --- pack_sequences -------------------------------------------------------

CONTEXT_LEN = 512  # tokens per packed training sequence
PACK_BUCKET = 64  # docs per prefix-sum bucket


def pack_sequences(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Greedy sequence packing: concatenate the corpus in doc_id order and
    split into fixed ``CONTEXT_LEN``-token context windows, reporting for
    each document the bin range it lands in (documents crossing a boundary
    span multiple bins — the standard concat-and-chunk packing used for
    LLM pretraining batches).

    The global token prefix sum is computed distributed, not with a naive
    single-partition ``Window.orderBy``: docs are bucketed by
    ``doc_id / PACK_BUCKET``, each bucket computes its intra-bucket running
    sum in parallel (window partitioned BY bucket), per-bucket totals —
    one small row per bucket — are cumulated on a single partition and
    broadcast back as offsets. That is the textbook two-phase scan: the
    only single-partition work is O(n_buckets) rows, so the pattern holds
    at 100 TB where a global-order window would serialize the corpus
    through one task. All math is integer (token counts, integer
    division), so the oracle matches exactly.
    """
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    docs = docs.withColumn("bucket", (F.col("doc_id") / PACK_BUCKET).cast("long"))
    intra_w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    docs = docs.withColumn("intra_cum", F.sum("n_tokens").over(intra_w))
    bucket_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        docs.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
        .withColumn(
            "offset", F.sum("bucket_tokens").over(bucket_w) - F.col("bucket_tokens")
        )
        .select("bucket", "offset")
    )
    packed = docs.join(F.broadcast(offsets), "bucket").withColumn(
        "end_tok", F.col("offset") + F.col("intra_cum")
    )
    start = F.col("end_tok") - F.col("n_tokens")
    first_bin = F.expr(f"(end_tok - n_tokens) DIV {CONTEXT_LEN}")
    last_bin = F.expr(f"(end_tok - 1) DIV {CONTEXT_LEN}")
    return packed.select(
        "doc_id",
        "n_tokens",
        start.alias("start_tok"),
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        (last_bin - first_bin + 1).alias("n_bins"),
    )


PACK_SEQUENCES_ORACLE = f"""
WITH t AS (
    SELECT doc_id, len({TOKENIZE_SQL.format(c="text")}) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           SUM(CAST(n_tokens AS BIGINT)) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS end_tok
    FROM t
)
SELECT doc_id, n_tokens,
       CAST(end_tok - n_tokens AS BIGINT) AS start_tok,
       CAST((end_tok - n_tokens) // {CONTEXT_LEN} AS BIGINT) AS first_bin,
       CAST((end_tok - 1) // {CONTEXT_LEN} AS BIGINT) AS last_bin,
       CAST((end_tok - 1) // {CONTEXT_LEN} - (end_tok - n_tokens) // {CONTEXT_LEN} + 1
           AS BIGINT) AS n_bins
FROM c"""


# --- text_chunk_overlap ---------------------------------------------------

CHUNK_TOKENS = 32  # context-window chunk size
CHUNK_STRIDE = 24  # window step (CHUNK_TOKENS - CHUNK_STRIDE tokens overlap)


def text_chunk_overlap(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Sliding-window token chunking: split every document into
    ``CHUNK_TOKENS``-token windows stepping by ``CHUNK_STRIDE`` (8-token
    overlap), the standard RAG/pretraining chunker when documents must not
    be split mid-context (contrast ``pack_sequences``, which concatenates
    across document boundaries).

    Pure 1:N row expansion on the codegen path — ``sequence`` generates
    the window starts per row and ``explode`` fans them out; no shuffle at
    all, so the operator is embarrassingly parallel at any scale (each
    input split expands independently; Spark's AQE handles the ~n/stride
    output-size growth when a downstream exchange follows).

    Window k (start ``k*stride``) is emitted only if window k-1 did not
    already reach the document end (``(k-1)*stride + chunk < n``) —
    matching HF ``return_overflowing_tokens``: only the final window may
    be short, and no window is fully contained in its predecessor. That
    bounds the start values by ``n - chunk + stride - 1``."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.filter(F.col("text").isNotNull())
    tok = docs.select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    last_start = F.greatest(
        F.col("n") - CHUNK_TOKENS + CHUNK_STRIDE - 1, F.lit(0)
    )
    ch = tok.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), last_start, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    return ch.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.col("start").cast("int").alias("chunk_start"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("start"))
        .cast("int")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice("toks", F.col("start") + 1, F.lit(CHUNK_TOKENS)), " "
        ).alias("chunk_text"),
    )


TEXT_CHUNK_OVERLAP_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, {TOKENIZE_SQL.format(c="text")} AS toks
    FROM documents WHERE text IS NOT NULL
),
st AS (
    SELECT doc_id, toks, len(toks) AS n,
           unnest(range(0, GREATEST(len(toks) - {CHUNK_TOKENS} + {CHUNK_STRIDE}, 1),
                  {CHUNK_STRIDE})) AS start
    FROM tok WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(start AS INT) AS chunk_start,
       CAST(LEAST({CHUNK_TOKENS}, n - start) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, start + 1, start + {CHUNK_TOKENS}), ' ')
           AS chunk_text
FROM st"""


# --- corpus_curate --------------------------------------------------------

QUALITY_MIN = 0.4  # drops the worst ~10% at sf0.01; binds at every SF


def corpus_curate(
    spark: SparkSession, sf_dir: str, canonical: bool = False, shared: bool = True
) -> DataFrame:
    """The full curation funnel as one auditable query: every document with
    a boolean per gate —

    - ``pass_exact``    : survivor of exact content-hash dedup (min doc_id
      per normalized-text md5),
    - ``pass_neardup``  : canonical doc of its MinHash-LSH near-dup cluster,
    - ``pass_decontam`` : not a benchmark doc and under the n-gram overlap
      threshold vs the benchmark set,
    - ``pass_quality``  : composite quality score >= QUALITY_MIN,
    - ``pass_sample``   : selected by the stratified hash sample,

    and ``is_kept`` = all gates — the training-corpus membership a real
    pipeline materializes (keeping the flags makes every drop explainable,
    the audit requirement for curated-data releases). Each gate reuses the
    standalone operator; all joins are on doc_id, so at scale they
    co-partition into one shuffle stage over the (tiny) per-doc flag
    frames rather than re-shuffling document text.

    With ``canonical=True`` the near-dup gate keeps each cluster's
    HIGHEST-PageRank member (graph.dedup_canonical_selection) instead of
    the arbitrary min-id survivor — the centrality-aware selection exists
    precisely to replace the min-id default in this funnel. On the driver
    corpus every dup cluster is symmetric (PageRank ties resolve to the
    min id), so the two variants coincide there; the planted-hub test in
    tests/test_curation.py carries the behavioral difference.

    The flag frame — the funnel's one corpus-sized output — is built once
    per (session, sf_dir, variant) and localCheckpoint-pinned through
    :mod:`..memo` (checkpoint mode, because the connected-components loop
    already runs jobs during construction): ``corpus_curate_report`` and
    any other downstream consumer reuse it instead of re-running the
    funnel inline (VERDICT r6 #1; the report alone was 4.4s in bench
    purely from the recompute)."""
    if shared:
        from ..memo import shared_frame

        return shared_frame(
            spark,
            ("corpus_curate", sf_dir, canonical),
            lambda: corpus_curate(spark, sf_dir, canonical, shared=False),
            checkpoint=True,
        )
    from .textstats import text_stats

    docs = load_table(spark, sf_dir, "documents")
    # the session-memoized shingle index feeds every shingle-consuming
    # gate (near-dup clusters / canonical selection AND decontamination)
    # — shared with the standalone dedup family via dedup.doc_shingles_ex
    ex = doc_shingles_ex(spark, sf_dir)
    w = Window.partitionBy("content_md5")
    base = (
        docs.select(
            "doc_id",
            "lang",
            F.md5(F.trim(F.lower(F.col("text")))).alias("content_md5"),
        )
        .withColumn("pass_exact", F.col("doc_id") == F.min("doc_id").over(w))
        .drop("content_md5")
    )
    if canonical:
        from .graph import dedup_canonical_selection

        clusters = dedup_canonical_selection(spark, sf_dir, shingles_ex=ex).select(
            "doc_id", F.col("is_canonical").alias("pass_neardup")
        )
    else:
        clusters = dedup_clusters(spark, sf_dir, shingles_ex=ex).select(
            "doc_id", F.col("is_kept").alias("pass_neardup")
        )
    decon = text_decontamination(spark, sf_dir, shingles_ex=ex).select(
        "doc_id", "is_contaminated"
    )
    quality = text_stats(spark, sf_dir).select("doc_id", "quality_score")
    is_benchmark = F.col("doc_id") % BENCH_MOD == 0
    h = hash60(F.concat(F.lit(_SAMPLE_KEY), F.col("doc_id").cast("string")))
    th = F.when(F.col("lang") == "en", F.lit(_TH_EN)).otherwise(F.lit(_TH_OTHER))
    out = (
        base.join(clusters, "doc_id")
        .join(decon, "doc_id", "left")
        .join(quality, "doc_id")
        .withColumn("is_benchmark", is_benchmark)
        .withColumn(
            "pass_decontam",
            ~is_benchmark & ~F.coalesce("is_contaminated", F.lit(False)),
        )
        .withColumn("pass_quality", F.col("quality_score") >= QUALITY_MIN)
        .withColumn("pass_sample", h < th)
    )
    kept = (
        F.col("pass_exact")
        & F.col("pass_neardup")
        & F.col("pass_decontam")
        & F.col("pass_quality")
        & F.col("pass_sample")
    )
    return out.select(
        "doc_id",
        "lang",
        "is_benchmark",
        "pass_exact",
        "pass_neardup",
        "pass_decontam",
        "pass_quality",
        "pass_sample",
        kept.alias("is_kept"),
    )


def corpus_curate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) audit rollup of the curation funnel — the
    release-notes table a curated-data drop ships: documents, per-gate
    pass counts, kept count, and the kept-rate per cohort. Pure grouped
    boolean aggregation over :func:`corpus_curate`'s flag frame (the
    funnel's one corpus-sized output), joined back to the doc → source
    mapping; group count is bounded by the source x lang domain."""
    flags = corpus_curate(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    g = flags.join(src, "doc_id").groupBy("source", "lang")

    def n(col: str):
        return F.sum(F.when(F.col(col), 1).otherwise(0)).alias(f"n_{col}")

    agg = g.agg(
        F.count(F.lit(1)).alias("n_docs"),
        n("pass_exact"),
        n("pass_neardup"),
        n("pass_decontam"),
        n("pass_quality"),
        n("pass_sample"),
        n("is_kept"),
    )
    return agg.select(
        "source",
        "lang",
        "n_docs",
        "n_pass_exact",
        "n_pass_neardup",
        "n_pass_decontam",
        "n_pass_quality",
        "n_pass_sample",
        F.col("n_is_kept").alias("n_kept"),
        round_dbl(
            F.col("n_is_kept").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("kept_rate"),
    )


def _corpus_curate_report_oracle() -> str:
    return f"""
WITH flags AS ({_corpus_curate_oracle()})
SELECT d.source, f.lang,
    COUNT(*) AS n_docs,
    CAST(SUM(CASE WHEN f.pass_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_exact,
    CAST(SUM(CASE WHEN f.pass_neardup THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_neardup,
    CAST(SUM(CASE WHEN f.pass_decontam THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_decontam,
    CAST(SUM(CASE WHEN f.pass_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_quality,
    CAST(SUM(CASE WHEN f.pass_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_sample,
    CAST(SUM(CASE WHEN f.is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
    {round_dbl_sql(
        "CAST(SUM(CASE WHEN f.is_kept THEN 1 ELSE 0 END) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE)", 6)} AS kept_rate
FROM flags f JOIN documents d USING (doc_id)
GROUP BY 1, 2"""


def _corpus_curate_oracle(canonical: bool = False) -> str:
    from .textstats import TEXT_STATS_ORACLE

    if canonical:
        from .graph import _canonical_oracle

        cl_src = f"SELECT doc_id, is_canonical AS is_kept FROM ({_canonical_oracle()})"
    else:
        cl_src = f"SELECT doc_id, is_kept FROM ({DEDUP_CLUSTERS_ORACLE})"
    decontam_pred = (
        f"doc_id % {BENCH_MOD} <> 0 AND NOT COALESCE(dc.is_contaminated, FALSE)"
    )
    quality_pred = f"q.quality_score >= {QUALITY_MIN}"
    return f"""
WITH ex AS (
    SELECT doc_id,
           doc_id = MIN(doc_id) OVER (
               PARTITION BY md5(trim(lower(text)))
           ) AS pass_exact
    FROM documents
),
cl AS ({cl_src}),
dc AS (SELECT doc_id, is_contaminated FROM ({TEXT_DECONTAMINATION_ORACLE})),
q AS (SELECT doc_id, quality_score FROM ({TEXT_STATS_ORACLE}))
SELECT doc_id, d.lang,
       doc_id % {BENCH_MOD} = 0 AS is_benchmark,
       ex.pass_exact,
       cl.is_kept AS pass_neardup,
       {decontam_pred} AS pass_decontam,
       {quality_pred} AS pass_quality,
       {_SAMPLE_PRED} AS pass_sample,
       (ex.pass_exact AND cl.is_kept AND {decontam_pred}
        AND {quality_pred} AND {_SAMPLE_PRED}) AS is_kept
FROM documents d
JOIN ex USING (doc_id)
JOIN cl USING (doc_id)
LEFT JOIN dc USING (doc_id)
JOIN q USING (doc_id)"""


# --- temperature-weighted mixture sampling --------------------------------

# Temperature sampling over the language axis (the multilingual-pretraining
# standard: sample language l with probability ~ n_l^alpha, alpha<1 flattens
# the head and upsamples the tail). alpha is fixed at 0.5 so the weight is
# sqrt(n) — IEEE-correctly-rounded in BOTH engines, unlike pow(), keeping
# the whole rate derivation bit-reproducible for the oracle. Rates are
# rounded to a 1e-9 grid before thresholding so a last-ulp difference in
# the double arithmetic chain can never flip a membership decision.
TEMP_BUDGET_FRAC = 0.5  # fraction of the corpus the mixture keeps
_TEMP_KEY = "tsample#"


def _temp_rates(docs: DataFrame) -> DataFrame:
    """Per-language target rate: least(1, budget * q_l / n_l) with
    q_l = sqrt(n_l) / sum(sqrt(n)). One tiny aggregate (O(#languages)
    rows) + a scalar cross-broadcast — no corpus shuffle."""
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_total").cast("double"))).alias("z"),
        F.sum("n_total").alias("n_corpus"),
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(TEMP_BUDGET_FRAC)
        * F.col("n_corpus").cast("double")
        * F.sqrt(F.col("n_total").cast("double"))
        / F.col("z")
        / F.col("n_total").cast("double"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_total",
        F.round(rate, 9).alias("target_rate"),
    )


def _temp_kept(docs: DataFrame) -> DataFrame:
    rates = _temp_rates(docs).select(
        "lang",
        F.floor(F.col("target_rate") * F.lit(float(2**60)))
        .cast("long")
        .alias("_th"),
    )
    h = hash60(F.concat(F.lit(_TEMP_KEY), F.col("doc_id").cast("string")))
    return (
        docs.join(F.broadcast(rates), "lang")
        .withColumn("_h", h)
        .filter(F.col("_h") < F.col("_th"))
    )


def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature-weighted language-mixture sample.

    The head language's rate drops below the budget fraction and tail
    languages rise above it — the alpha=0.5 flattening used to train
    multilingual models. Same hash-threshold shape as
    :func:`sample_stratified`: membership is a pure broadcast-join filter,
    reproducible and stable under corpus growth of other languages (a
    doc's hash never changes; only the per-language thresholds move as
    counts drift)."""
    docs = load_table(spark, sf_dir, "documents")
    return _temp_kept(docs).select("doc_id", "lang", "source")


def sample_temperature_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language audit: corpus count, target rate, realized sample."""
    docs = load_table(spark, sf_dir, "documents")
    kept = _temp_kept(docs).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    return (
        _temp_rates(docs)
        .join(kept, "lang", "left")
        .select(
            "lang",
            "n_total",
            "target_rate",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            round_dbl(
                F.coalesce("n_sampled", F.lit(0))
                / F.col("n_total").cast("double"),
                6,
            ).alias("realized_rate"),
        )
    )


EXACT_K_PER_GROUP = 20
_EXACT_K_KEY = "exactk#"


def sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY ``EXACT_K_PER_GROUP`` documents per language (fewer only
    when the group is smaller) — the fixed-budget construction every
    eval-set / few-shot-pool build needs, which rate-based hash-threshold
    sampling cannot give (its per-group count is binomial, never exact).

    Selection order is the seeded portable hash of the doc_id with doc_id
    tiebreak, so the pick is deterministic, content-independent, and
    uniformly "random" per group; one shuffle on the group key. At 100 TB
    the same query runs after a cheap rate pre-filter (keep ~4K/N by hash
    threshold, then exact top-K) so the window never sorts the full
    group — the pre-filter drops nothing the top-K could select as long
    as the rate over-samples K, because both order by the same hash."""
    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.lit(_EXACT_K_KEY), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= EXACT_K_PER_GROUP)
        .select("doc_id", "lang", "source", "pick_rank")
    )


_EXACT_K_HASH_SQL = hash60_sql(
    f"concat('{_EXACT_K_KEY}', CAST(doc_id AS VARCHAR))"
)

SAMPLE_EXACT_K_ORACLE = f"""
SELECT doc_id, lang, source, pick_rank FROM (
    SELECT doc_id, lang, source,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY {_EXACT_K_HASH_SQL} ASC, doc_id ASC
        ) AS INT) AS pick_rank
    FROM documents
) WHERE pick_rank <= {EXACT_K_PER_GROUP}"""


_TEMP_RATES_CTE = f"""
    SELECT lang, n_total,
        ROUND(LEAST(1.0, {TEMP_BUDGET_FRAC} * n_corpus * sqrt(CAST(n_total AS DOUBLE))
                         / z / CAST(n_total AS DOUBLE)), 9) AS target_rate
    FROM (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang)
    CROSS JOIN (SELECT SUM(sqrt(CAST(n AS DOUBLE))) AS z,
                       CAST(SUM(n) AS DOUBLE) AS n_corpus
                FROM (SELECT COUNT(*) AS n FROM documents GROUP BY lang))"""

_TEMP_HASH_SQL = hash60_sql(f"concat('{_TEMP_KEY}', CAST(doc_id AS VARCHAR))")

SAMPLE_TEMPERATURE_ORACLE = f"""
WITH rates AS ({_TEMP_RATES_CTE})
SELECT doc_id, d.lang, source
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {_TEMP_HASH_SQL} < CAST(floor(r.target_rate * {float(2**60)!r}) AS BIGINT)"""

SAMPLE_TEMPERATURE_RATES_ORACLE = f"""
WITH rates AS ({_TEMP_RATES_CTE}),
kept AS (
    SELECT d.lang, COUNT(*) AS n_sampled
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_TEMP_HASH_SQL} < CAST(floor(r.target_rate * {float(2**60)!r}) AS BIGINT)
    GROUP BY d.lang
)
SELECT r.lang, r.n_total, r.target_rate,
    COALESCE(k.n_sampled, 0) AS n_sampled,
    CAST(ROUND(CAST(CAST(COALESCE(k.n_sampled, 0) AS DOUBLE)
         / CAST(r.n_total AS DOUBLE) AS DECIMAL(38,10)), 6) AS DOUBLE)
        AS realized_rate
FROM rates r LEFT JOIN kept k ON r.lang = k.lang"""


# --- leakage-safe train/val/test split --------------------------------------

_SPLIT_KEY = "split#"
SPLIT_TRAIN_FRAC = 0.90
SPLIT_VAL_FRAC = 0.05  # test gets the remainder
_TH_TRAIN = int(SPLIT_TRAIN_FRAC * 2**60)
_TH_VAL = int((SPLIT_TRAIN_FRAC + SPLIT_VAL_FRAC) * 2**60)


def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is assigned by hashing
    the document's near-dup CLUSTER canonical id, not the document itself,
    so every member of a duplicate cluster lands in the same split — the
    eval set can never contain a near-copy of a training document (the
    failure mode a naive per-doc split has on any deduplicatable corpus,
    and the reason eval numbers inflate). Naturally also the grouping
    discipline for URL/domain or repository splits — swap the cluster
    label for the group key.

    Cost = the connected-components labeling :func:`dedup_clusters`
    already computes (per-round shuffles bounded by the near-dup
    subgraph) + a pure hash-threshold projection: no extra shuffle, no
    global stage, membership stable under corpus growth (a cluster's
    split never changes as unrelated docs arrive)."""
    from .. import memo

    # the labeling is an EAGER build (the components loop runs jobs), so
    # share it checkpoint-pinned per (session, sf_dir) — the discipline of
    # the corpus_curate flag frame; on a deployment cluster labels are a
    # materialized table every split/canonicalization consumer reads
    clusters = memo.shared_frame(
        spark,
        ("dedup_cluster_labels", sf_dir),
        lambda: dedup_clusters(spark, sf_dir).select("doc_id", "canonical_id"),
        checkpoint=True,
    )
    h = hash60(F.concat(F.lit(_SPLIT_KEY), F.col("canonical_id").cast("string")))
    split = (
        F.when(h < _TH_TRAIN, F.lit("train"))
        .when(h < _TH_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return clusters.select("doc_id", "canonical_id", split.alias("split"))


_SPLIT_HASH_SQL = hash60_sql(
    f"concat('{_SPLIT_KEY}', CAST(canonical_id AS VARCHAR))"
)

CORPUS_SPLIT_ORACLE = f"""
SELECT doc_id, canonical_id,
       CASE WHEN {_SPLIT_HASH_SQL} < {_TH_TRAIN} THEN 'train'
            WHEN {_SPLIT_HASH_SQL} < {_TH_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, canonical_id FROM ({DEDUP_CLUSTERS_ORACLE}))"""


def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering of the packed training windows: each
    ``tokenize_pack_ids`` bin scored by the token-weighted mean of its
    documents' unigram log-probability (the CCNet-style difficulty
    proxy: high average log-prob = common-token text = 'easy'), ranked
    easy-first — the schedule a curriculum-learning loader consumes
    (Bengio et al. 2009; data-mixing stacks order shards exactly this
    way).

    Portability: the per-doc score is already on the 4-dp grid, so it
    scales to an EXACT integer (x 1e4 through the decimal cast) and the
    bin's weighted sum is integer arithmetic — order-free across engines
    (the PQ ADC discipline); one final division lands back on the grid.
    Scale shape: one (bin, doc) count aggregate over the pack stream +
    a doc-grain broadcast join; the rank is a window over O(bins) rows."""
    from pyspark.sql import Window

    from .bpe import tokenize_pack_ids
    from .corpusstats import text_unigram_logprob

    per = (
        tokenize_pack_ids(spark, sf_dir)
        .groupBy("bin_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lp = text_unigram_logprob(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("avg_logprob").cast("decimal(38,10)") * F.lit(10_000), 0)
        .cast("long")
        .alias("lp_scaled"),
    )
    scored = (
        per.join(F.broadcast(lp), "doc_id")
        .groupBy("bin_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("lp_scaled") * F.col("n")).alias("wsum"),
        )
        .select(
            "bin_id",
            "n_tokens",
            round_dbl(
                F.col("wsum")
                / (F.lit(10_000.0) * F.col("n_tokens").cast("double")),
                4,
            ).alias("difficulty"),
        )
    )
    w = Window.orderBy(F.col("difficulty").desc(), F.col("bin_id").asc())
    return scored.select(
        F.row_number().over(w).cast("int").alias("curriculum_rank"),
        "bin_id",
        "n_tokens",
        "difficulty",
    )


def _curriculum_oracle() -> str:
    from .bpe import _pack_ids_oracle
    from .corpusstats import TEXT_UNIGRAM_LOGPROB_ORACLE

    return f"""
WITH per AS (
    SELECT bin_id, doc_id, COUNT(*) AS n
    FROM ({_pack_ids_oracle()})
    GROUP BY bin_id, doc_id
),
lp AS (
    SELECT doc_id,
        CAST(ROUND(CAST(avg_logprob AS DECIMAL(38,10)) * 10000, 0) AS BIGINT)
            AS lp_scaled
    FROM ({TEXT_UNIGRAM_LOGPROB_ORACLE})
),
scored AS (
    SELECT bin_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
        {round_dbl_sql(
            "CAST(SUM(lp_scaled * n) AS DOUBLE)"
            " / (10000.0 * CAST(SUM(n) AS DOUBLE))", 4)} AS difficulty
    FROM per JOIN lp USING (doc_id)
    GROUP BY bin_id
)
SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY difficulty DESC, bin_id ASC) AS INT) AS curriculum_rank,
       bin_id, n_tokens, difficulty
FROM scored"""


def register_all(register) -> None:
    register(
        "corpus_curriculum_order",
        corpus_curriculum_order,
        _curriculum_oracle(),
    )
    register("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_ORACLE)
    register("corpus_split_assign", corpus_split_assign, CORPUS_SPLIT_ORACLE)
    register("text_decontamination", text_decontamination, TEXT_DECONTAMINATION_ORACLE)
    register("sample_stratified", sample_stratified, SAMPLE_STRATIFIED_ORACLE)
    register(
        "sample_stratified_counts",
        sample_stratified_counts,
        SAMPLE_STRATIFIED_COUNTS_ORACLE,
    )
    register("pack_sequences", pack_sequences, PACK_SEQUENCES_ORACLE)
    register("text_chunk_overlap", text_chunk_overlap, TEXT_CHUNK_OVERLAP_ORACLE)
    register("corpus_curate", corpus_curate, _corpus_curate_oracle())
    register(
        "corpus_curate_canonical",
        lambda spark, sf_dir: corpus_curate(spark, sf_dir, canonical=True),
        _corpus_curate_oracle(canonical=True),
    )
    register(
        "corpus_curate_report",
        corpus_curate_report,
        _corpus_curate_report_oracle(),
    )
    register("sample_temperature", sample_temperature, SAMPLE_TEMPERATURE_ORACLE)
    register("sample_exact_k", sample_exact_k, SAMPLE_EXACT_K_ORACLE)
    register(
        "sample_temperature_rates",
        sample_temperature_rates,
        SAMPLE_TEMPERATURE_RATES_ORACLE,
    )
