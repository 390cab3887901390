"""Graph analytics over the near-duplicate graph.

``dedup_clusters`` (curation.py) gives connected components — the
membership view of the dup graph. ``graph_pagerank`` adds the CENTRALITY
view: which documents sit at the hubs of near-duplication (canonical-copy
selection prefers the highest-centrality member of a dup cluster; a hub
shared by many templates is a stronger "boilerplate source" signal than
any pairwise score).

Portability is the interesting design point: floating-point PageRank is
NOT oracle-checkable — each iteration sums neighbor contributions, double
addition is order-sensitive, and Spark's partition order differs from
DuckDB's, so ulp drift compounds per iteration. The whole computation
therefore runs in FIXED-POINT INTEGER arithmetic: ranks are scaled by
10^12, contributions use integer division (``pr div deg``), and the
damping update is ``(15 * (SCALE div n)) div 100 + (85 * sum) div 100``.
Integer sums are exact in any order, so both engines produce the SAME
bigint rank at every iteration — bit-portable by construction, the same
trick the HLL register sums use (sketches.py). Deterministic truncation
error ~1e-12 per op is irrelevant at ranking granularity.

Scale: each iteration is one join of the rank vector with the edge list
(shuffles on src) plus one ``groupBy(dst).sum`` with map-side partial
aggregation — the standard distributed PageRank shape; ITERS is fixed, so
the plan is a statically unrolled chain (no driver loop over actions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..pinning import pin

from ..tables import load_table
from .dedup import DEDUP_NGRAM_ORACLE, dedup_ngram_jaccard

PR_SCALE = 10**12
PR_ITERS = 5


def graph_pagerank(
    spark: SparkSession, sf_dir: str, shingles_ex=None
) -> DataFrame:
    """Fixed-point PageRank over the exact near-dup graph (undirected
    edges = verified Jaccard>=0.8 pairs), 5 damped iterations, output
    ranked by scaled integer score. Nodes are the documents that appear
    in at least one near-dup pair (deg >= 1, so no dangling-mass term).
    ``shingles_ex`` optionally supplies a precomputed exploded-shingle
    stage shared with another consumer (dedup_canonical_selection)."""
    pairs = dedup_ngram_jaccard(
        spark, sf_dir, shingles_ex=shingles_ex
    ).select("doc_a", "doc_b")
    return pagerank_from_pairs(pairs)


def pagerank_from_pairs(pairs: DataFrame) -> DataFrame:
    """The fixed-point PageRank body over an arbitrary (doc_a, doc_b)
    undirected pair set — factored so composite queries can rank edges
    they already hold (dedup_canonical_selection)."""
    # pin the edge list once: the degree aggregate, the node set, and
    # every unrolled iteration all join against it, and without the
    # checkpoint each reuse would re-execute the whole shingle/verify
    # pair pipeline — the same localCheckpoint discipline as
    # dedup_clusters' iteration
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .transform(pin)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # pin the two loop-invariant frames once, PRE-PARTITIONED on their
    # iteration join keys (r13 optimization, guide §2.4): the statically
    # unrolled plan otherwise re-plans the edges⋈deg and nodes×n subtrees
    # inside every iteration — 80 Exchanges / 30 SortMergeJoins at 5
    # iterations (plans/r13/graph_pagerank_before.txt). localCheckpoint
    # preserves the hash partitioning, so each iteration now pays only the
    # rank-vector exchange + the contribution aggregate, not a rebuild of
    # the invariants. Values are untouched (exact integer fixed-point).
    edges_d = (
        edges.join(deg, "src").repartition("src").transform(pin)
    )
    nodes = deg.select(F.col("src").alias("doc_id"))
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = (
        nodes.crossJoin(F.broadcast(nn))
        .repartition("doc_id")
        .transform(pin)
    )
    pr = base.select(
        "doc_id", "n", F.expr(f"{PR_SCALE} div n").cast("long").alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            pr.join(edges_d, pr["doc_id"] == edges_d["src"])
            .select(F.col("dst").alias("doc_id"), F.expr("pr div deg").alias("c"))
            .groupBy("doc_id")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            base.join(contrib, "doc_id", "left")
            .select(
                "doc_id",
                "n",
                F.expr(
                    f"(15 * ({PR_SCALE} div n)) div 100"
                    " + (85 * coalesce(s, 0L)) div 100"
                )
                .cast("long")
                .alias("pr"),
            )
        )
    w = Window.orderBy(F.col("pr").desc(), F.col("doc_id").asc())
    return pr.select(
        "doc_id",
        F.col("pr").alias("pr_scaled"),
        F.row_number().over(w).alias("rank"),
    )


def graph_pagerank_update_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained PageRank (VERDICT r10 #6): the same fixed-point ranking
    as :func:`graph_pagerank`, but the EDGE DISCOVERY — the cost that
    dominates the from-scratch query (a corpus-wide shingle self-join) —
    comes from maintained tables: the init-time base edge list plus the
    arrival batch's pairs probed out of the maintained shingle inverted
    index (:func:`..llmdata.incrdedup.maintained_exact_pairs`,
    bucket-pruned, O(batch)). The edge set is IDENTICAL to the batch
    recompute's (base-base pairs from init, arrival-involving pairs from
    the probe — a disjoint partition), and the rank body is integer
    fixed-point, so the output hash-equals the from-scratch oracle
    exactly: no recall relaxation anywhere. The 5 damped iterations run
    over the near-dup node set (documents in >= 1 pair — graph-sized, not
    corpus-sized), which is the part that was never the bottleneck."""
    from .incrdedup import maintained_exact_pairs

    return pagerank_from_pairs(maintained_exact_pairs(spark, sf_dir))


def _pagerank_oracle() -> str:
    scale = PR_SCALE
    ctes = [
        f"pairs AS (SELECT doc_a, doc_b FROM ({DEDUP_NGRAM_ORACLE}))",
        """edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs)""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1)",
        "nodes AS (SELECT src AS doc_id FROM deg)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"""pr0 AS (
            SELECT doc_id, CAST({scale} // n AS BIGINT) AS pr
            FROM nodes CROSS JOIN nn)""",
    ]
    for i in range(PR_ITERS):
        ctes.append(f"""pr{i + 1} AS (
            SELECT nodes.doc_id,
                CAST((15 * ({scale} // n)) // 100
                     + (85 * COALESCE(t.s, 0)) // 100 AS BIGINT) AS pr
            FROM nodes CROSS JOIN nn
            LEFT JOIN (
                SELECT e.dst AS doc_id, SUM(p.pr // d.deg) AS s
                FROM pr{i} p
                JOIN edges e ON p.doc_id = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY 1
            ) t ON nodes.doc_id = t.doc_id)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT doc_id, pr AS pr_scaled,
    CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, doc_id ASC) AS INT) AS rank
FROM pr{PR_ITERS}"""
    )


GRAPH_PAGERANK_ORACLE = _pagerank_oracle()


def dedup_canonical_selection(
    spark: SparkSession, sf_dir: str, shingles_ex=None
) -> DataFrame:
    """Centrality-aware canonical-copy selection — the query the two graph
    views exist to answer together: every document mapped to its dup
    cluster (connected components, curation.dedup_clusters) and to the
    cluster member chosen as the canonical copy by HIGHEST PageRank
    (smallest doc_id on ties; singletons are their own canonical). A
    curation pipeline keeps ``is_canonical`` rows and drops the rest —
    preferring the hub copy over the arbitrary min-id copy the plain
    components view would keep.

    The LSH cluster edges are a subset of the exact-Jaccard pagerank
    edges (verification only removes pairs), so every non-singleton
    cluster member has a rank; the window partitions by cluster (dup
    groups are small by nature), no global stage anywhere.

    Shared-stage plan (VERDICT r5 task 2 — a pure plan change, same
    oracle; the round-5 version rebuilt the whole shingle pipeline twice,
    making this the registry's most expensive non-init query):

    1. ONE shingle explode of ``documents``, eagerly localCheckpoint-ed.
    2. ONE exact-Jaccard pair set from the inverted index (pinned) —
       these are the pagerank edges directly.
    3. The LSH cluster edges are recovered by SEMI-JOINING the exact
       pairs against the banded candidate set instead of re-running the
       ``array_intersect`` verify. This is an identity, not an
       approximation: equal min-hash under a seed means the minimizing
       shingle is present in both docs, so every band candidate that
       survives the >=0.8 filter shares a shingle and hence appears in
       the inverted-index pair set with the SAME exact Jaccard; a band
       candidate sharing no shingle has Jaccard 0 and dies in either
       path. (LSH-verified = exact-pairs ∩ band-candidates.) And since
       only pairs already IN the exact set can survive that
       intersection, the 16-seed minhash signatures are computed ONLY
       for docs that appear in an exact pair — a broadcast semi-join
       slice of the shingle stage, tiny at any corpus size, instead of
       the all-docs signature aggregate.
    """
    from .curation import connected_components
    from .dedup import _exploded_shingles, lsh_band_candidates

    docs = load_table(spark, sf_dir, "documents")
    ex = (
        shingles_ex
        if shingles_ex is not None
        else _exploded_shingles(docs).transform(pin)
    )
    exact_pairs = (
        dedup_ngram_jaccard(spark, sf_dir, shingles_ex=ex)
        .select("doc_a", "doc_b")
        .transform(pin)
    )
    paired_docs = (
        exact_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(exact_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ex_paired = ex.join(F.broadcast(paired_docs), "doc_id", "left_semi")
    lsh_pairs = exact_pairs.join(
        lsh_band_candidates(shingles_ex=ex_paired),
        ["doc_a", "doc_b"],
        "left_semi",
    )
    cl = connected_components(docs.select("doc_id"), lsh_pairs).select(
        "doc_id", "canonical_id"
    )
    pr = pagerank_from_pairs(exact_pairs).select("doc_id", "pr_scaled")
    return _canonical_tail(cl, pr)


def _canonical_tail(cl: DataFrame, pr: DataFrame) -> DataFrame:
    """The keeper-selection tail shared by the batch and maintained
    canonical queries: clusters LEFT JOIN centrality, highest-rank
    (lowest-id tie) member per cluster becomes canonical."""
    j = cl.join(pr, "doc_id", "left").select(
        "doc_id",
        F.col("canonical_id").alias("cluster_id"),
        F.coalesce("pr_scaled", F.lit(-1)).alias("prs"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("prs").desc(), F.col("doc_id").asc()
    )
    return j.select(
        "doc_id",
        "cluster_id",
        F.first("doc_id").over(w).alias("canonical_doc_id"),
    ).withColumn(
        "is_canonical", F.col("doc_id") == F.col("canonical_doc_id")
    )


def dedup_canonical_selection_update_only(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maintained canonical selection (VERDICT r10 #6, second half): the
    curation funnel's canonical-keeper step answered from the maintained
    edge stores — cluster membership from the maintained COMPONENT LABELS
    (:func:`..llmdata.incrdedup.maintained_cc_labels`: base labels
    settled once at init, arrival pairs union-found into them on the
    quotient graph — VERDICT r11 #1: the prior version re-ran the whole
    label-propagation loop per batch and lost to the batch twin at 1x),
    centrality from the maintained EXACT edge set — so no shingle
    self-join, no corpus-wide signature pass, no per-batch fixpoint
    iteration. The label merge is exact (see maintained_cc_labels) and
    the keeper window is deterministic, so the output hash-equals the
    batch :func:`dedup_canonical_selection` / its oracle exactly. The one
    corpus-sized stage left is the unavoidable output itself (one row
    per document, joined back once for singleton labels)."""
    from .incrdedup import maintained_cc_labels, maintained_exact_pairs

    cl = maintained_cc_labels(spark, sf_dir)
    pr = pagerank_from_pairs(maintained_exact_pairs(spark, sf_dir)).select(
        "doc_id", "pr_scaled"
    )
    return _canonical_tail(cl, pr)


DEDUP_CANONICAL_ORACLE = f"""
WITH cl AS (
    SELECT doc_id, canonical_id FROM ({{clusters}})
),
pr AS (
    SELECT doc_id, pr_scaled FROM ({{pagerank}})
),
j AS (
    SELECT cl.doc_id, cl.canonical_id AS cluster_id,
        COALESCE(pr.pr_scaled, -1) AS prs
    FROM cl LEFT JOIN pr ON cl.doc_id = pr.doc_id
)
SELECT doc_id, cluster_id, canonical_doc_id,
    doc_id = canonical_doc_id AS is_canonical
FROM (
    SELECT doc_id, cluster_id,
        FIRST_VALUE(doc_id) OVER (
            PARTITION BY cluster_id ORDER BY prs DESC, doc_id ASC
        ) AS canonical_doc_id
    FROM j
)"""


def _canonical_oracle() -> str:
    from .curation import DEDUP_CLUSTERS_ORACLE

    return DEDUP_CANONICAL_ORACLE.format(
        clusters=DEDUP_CLUSTERS_ORACLE, pagerank=GRAPH_PAGERANK_ORACLE
    )


def register_all(register) -> None:
    register("graph_pagerank", graph_pagerank, GRAPH_PAGERANK_ORACLE)
    register(
        "dedup_canonical_selection", dedup_canonical_selection, _canonical_oracle()
    )
    # maintained twin: same oracle as the batch query — the maintained
    # edge partition must reproduce the from-scratch ranking EXACTLY
    register(
        "graph_pagerank_update_only",
        graph_pagerank_update_only,
        GRAPH_PAGERANK_ORACLE,
    )
    register(
        "dedup_canonical_selection_update_only",
        dedup_canonical_selection_update_only,
        _canonical_oracle(),
    )
