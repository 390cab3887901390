"""Per-source boilerplate detection — the CCNet/RefinedWeb cleanup stage
that strips navigation chrome, cookie banners, and footer text repeated
across a crawl source's pages.

Semantics: a 3-token shingle is BOILERPLATE for a source when it appears
in at least ``BOILER_DF_NUM/BOILER_DF_DEN`` of that source's documents
(document frequency WITHIN the source — cross-source repetition is
ordinary language, within-source repetition is template chrome). The
report gives every document its boilerplate shingle count, ratio, and a
heavy flag. All thresholds are exact integer comparisons (``df * DEN >=
n_docs * NUM``) so membership is bit-identical cross-engine.

Scale shape: one exploded-shingle scan (shared machinery with the dedup/
decontamination gates), a ``(source, shingle)`` aggregation bounded by
source count x shingle vocabulary, and a broadcast join of the small
boilerplate set back onto the shingle index — no all-pairs work, no
global stage; the same sum-of-group costs as ``text_decontamination``.

Like the PII family (pii.py), the registry query AUGMENTS the corpus
first: this synthetic corpus is template-free word salad, so the query
plants a deterministic per-source boilerplate sentence on 2 of every 3
documents (``doc_id % BOILER_AUG_MOD != 0``) — declared test scaffolding
that makes the operator's discrimination observable and oracle-checkable.
``boilerplate_report_frame`` is the production entry that runs on the
caller's frame untouched.

The reference corpus layer has no text cleanup surface (its bronze
extracts are relational, src/extract/extract_customers.py); this family
belongs to the LLM-training-data extension brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import round_dbl
from ..tables import load_table
from .dedup import _SHINGLES_CTE, _exploded_shingles

# boilerplate when shingle df >= 1/2 of the source's docs
BOILER_DF_NUM = 1
BOILER_DF_DEN = 2
# heavy when boilerplate shingles >= 1/50 of the doc's distinct shingles
BOILER_FLAG_NUM = 1
BOILER_FLAG_DEN = 50
BOILER_AUG_MOD = 3  # doc_id % MOD == 0 stays clean (the control group)


def _boiler_sentence(source: Column) -> Column:
    """The planted per-source template sentence (9 tokens, source-bearing
    so it can never collide with the generic natural vocabulary)."""
    return F.concat(
        F.lit("follow "),
        source,
        F.lit(" on social media subscribe to "),
        source,
        F.lit(" newsletter "),
    )


def boilerplate_report_frame(
    docs: DataFrame, exs_memo_key: tuple | None = None
) -> DataFrame:
    """Per-document boilerplate report over ``docs(doc_id, source, text)``
    — the production entry (no augmentation).

    ``n_shingles`` counts the doc's distinct 3-token shingles,
    ``n_boiler`` those that are source-boilerplate; a document with no
    shingles in the boilerplate set reports zeros. The boilerplate set is
    re-joined broadcast: it is bounded by sources x template shingles,
    tiny by construction. The (doc, source, shingle) index is consumed by
    THREE aggregations (boilerplate set, hit counts, per-doc totals) —
    ``exs_memo_key`` lets a deterministic caller pin it through the
    session memo so it is derived once, not three times per action."""

    def _build() -> DataFrame:
        ex = _exploded_shingles(docs)
        src = docs.select("doc_id", "source")
        return ex.join(src, "doc_id")

    if exs_memo_key is not None:
        from ..memo import shared_frame

        exs = shared_frame(docs.sparkSession, exs_memo_key, _build)
    else:
        exs = _build()
    n_docs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        exs.groupBy("source", "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_docs), "source")
        .filter(F.col("df") * BOILER_DF_DEN >= F.col("n_docs") * BOILER_DF_NUM)
        .select("source", "shingle")
    )
    hits = (
        exs.join(F.broadcast(boiler), ["source", "shingle"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    per_doc = exs.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    n_boiler = F.coalesce("n_boiler", F.lit(0))
    return per_doc.join(hits, "doc_id", "left").select(
        "doc_id",
        "source",
        "n_shingles",
        n_boiler.alias("n_boiler"),
        round_dbl(
            n_boiler.cast("double") / F.col("n_shingles").cast("double"), 6
        ).alias("boiler_ratio"),
        (
            n_boiler * BOILER_FLAG_DEN >= F.col("n_shingles") * BOILER_FLAG_NUM
        ).alias("is_boiler_heavy"),
    )


def text_boilerplate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face: plant the per-source template on 2/3 of documents,
    then report. Planted docs must flag heavy, the ``doc_id % MOD == 0``
    control group must not (asserted in tests)."""
    docs = load_table(spark, sf_dir, "documents")
    # COALESCE mirrors the oracle: DuckDB's concat ignores NULL args while
    # Spark's F.concat is NULL-propagating (pii.py guards identically) — a
    # NULL-text doc would otherwise vanish on one engine only
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % BOILER_AUG_MOD != 0,
            F.concat(
                _boiler_sentence(F.col("source")),
                F.coalesce(F.col("text"), F.lit("")),
            ),
        ).otherwise(F.col("text")),
    )
    # the augmented-corpus shingle index is deterministic per sf_dir, so
    # the registry face pins it (distinct key from the raw-corpus
    # dedup.doc_shingles_ex — the planted templates must never leak there)
    return boilerplate_report_frame(aug, exs_memo_key=("boiler_exs", sf_dir))


_AUG_TEXT_SQL = f"""
    CASE WHEN doc_id % {BOILER_AUG_MOD} <> 0
         THEN concat('follow ', source, ' on social media subscribe to ',
                     source, ' newsletter ', COALESCE(text, ''))
         ELSE text END"""

# the shared shingle CTE reads FROM documents; point it at the augmented view
_AUG_SHINGLES_CTE = _SHINGLES_CTE.replace(
    "FROM documents", "FROM aug_documents"
)

TEXT_BOILERPLATE_ORACLE = f"""
WITH aug_documents AS (
    SELECT doc_id, source, {_AUG_TEXT_SQL} AS text FROM documents
),
sh AS ({_AUG_SHINGLES_CTE}),
exs AS (
    SELECT sh.doc_id, d.source, sh.shingle, sh.n_shingles
    FROM sh JOIN aug_documents d USING (doc_id)
),
nd AS (SELECT source, COUNT(*) AS n_docs FROM aug_documents GROUP BY source),
boiler AS (
    SELECT b.source, b.shingle
    FROM (SELECT source, shingle, COUNT(*) AS df
          FROM exs GROUP BY source, shingle) b
    JOIN nd USING (source)
    WHERE b.df * {BOILER_DF_DEN} >= nd.n_docs * {BOILER_DF_NUM}
),
hits AS (
    SELECT exs.doc_id, COUNT(*) AS n_boiler
    FROM exs JOIN boiler
      ON exs.source = boiler.source AND exs.shingle = boiler.shingle
    GROUP BY exs.doc_id
)
SELECT d.doc_id, d.source, d.n_shingles,
       COALESCE(h.n_boiler, 0) AS n_boiler,
       CAST(ROUND(CAST(CAST(COALESCE(h.n_boiler, 0) AS DOUBLE)
            / CAST(d.n_shingles AS DOUBLE) AS DECIMAL(38,10)), 6) AS DOUBLE)
           AS boiler_ratio,
       COALESCE(h.n_boiler, 0) * {BOILER_FLAG_DEN}
           >= d.n_shingles * {BOILER_FLAG_NUM} AS is_boiler_heavy
FROM (SELECT DISTINCT doc_id, source, n_shingles FROM exs) d
LEFT JOIN hits h USING (doc_id)"""


def register_all(register) -> None:
    register(
        "text_boilerplate_report", text_boilerplate_report, TEXT_BOILERPLATE_ORACLE
    )
