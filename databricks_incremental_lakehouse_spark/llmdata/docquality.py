"""Gopher-style document-quality battery over the ``documents`` table.

The repetition/quality rules published with Gopher (Rae et al. 2021,
"Scaling Language Models", App. A) are the standard pre-training corpus
gate: word-count bounds, mean-word-length bounds, symbol-to-word ratio,
a minimum stopword presence, and repetition measures (duplicate-token
fraction, top-bigram fraction). ``text_quality_gopher`` computes each
signal plus its pass/fail flag and the conjunction ``pass_gopher`` —
the reference surface has nothing comparable (its quality checks are
table-level QC, data_quality_checks.py); this is the document-level
analogue an LLM data pipeline needs.

Plan shape (100-TB notes): the per-document signals are pure expression
work (whole-stage codegen, shuffle-free). The top-bigram signal is the
one aggregation: bigrams are formed on the codegen path (posexplode +
window ``lead`` — same pattern as the shingle pipeline, dedup.py) and
counted with a two-level groupBy whose partial aggregation combines
map-side, so the shuffle carries (doc_id, bigram) partial counts, linear
in corpus size. Thresholds are module constants; they intentionally sit
inside this corpus' observed ranges so both outcomes of every flag are
exercised (Gopher's published bounds — e.g. 50 <= words <= 100k — would
pass/fail this synthetic corpus wholesale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import round_dbl
from ..tables import load_table
from .texthash import TOKENIZE_SQL, tokenize
from .textstats import STOPWORDS, _sql_list

MIN_WORDS = 30
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MIN_STOPWORD_HITS = 2
MAX_DUP_TOKEN_FRAC = 0.55
MAX_TOP_BIGRAM_FRAC = 0.08


def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher quality signals + pass/fail flags."""
    return gopher_flags(load_table(spark, sf_dir, "documents"))


def gopher_flags(docs: DataFrame) -> DataFrame:
    """The gate battery over any (doc_id, source, text) DataFrame — the
    registry query consumes the documents table; the streaming curation
    front door applies the same gates per micro-batch."""
    toks = tokenize(F.col("text"))
    n_words = F.size(toks)
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    symbols = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9\s]", "")
    )
    base = docs.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        (nonspace / F.nullif(n_words.cast("double"), F.lit(0.0))).alias("mwl"),
        (symbols / F.nullif(n_words.cast("double"), F.lit(0.0))).alias("swr"),
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"]))).alias(
            "stopword_hits"
        ),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks))
            / F.nullif(n_words.cast("double"), F.lit(0.0))
        ).alias("dupf"),
    )

    tok = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        tok.withColumn("nxt", F.lead("token", 1).over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "token", "nxt").alias("bg"))
    )
    top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("n_bg"))
    )

    m = base.join(top, "doc_id", "left").withColumn(
        "topbgf",
        F.coalesce(F.col("top_bg") / F.col("n_bg").cast("double"), F.lit(0.0)),
    )
    pass_words = F.col("n_words") >= MIN_WORDS
    pass_mwl = (F.col("mwl") >= MIN_MEAN_WORD_LEN) & (
        F.col("mwl") <= MAX_MEAN_WORD_LEN
    )
    pass_sym = F.col("swr") <= MAX_SYMBOL_WORD_RATIO
    pass_stop = F.col("stopword_hits") >= MIN_STOPWORD_HITS
    pass_rep = (F.col("dupf") <= MAX_DUP_TOKEN_FRAC) & (
        F.col("topbgf") <= MAX_TOP_BIGRAM_FRAC
    )
    return m.select(
        "doc_id",
        "source",
        "n_words",
        round_dbl(F.col("mwl"), 4).alias("mean_word_len"),
        round_dbl(F.col("swr"), 4).alias("symbol_word_ratio"),
        "stopword_hits",
        round_dbl(F.col("dupf"), 4).alias("dup_token_frac"),
        round_dbl(F.col("topbgf"), 4).alias("top_bigram_frac"),
        pass_words.alias("pass_word_count"),
        pass_mwl.alias("pass_mean_word_len"),
        pass_sym.alias("pass_symbol_ratio"),
        pass_stop.alias("pass_stopwords"),
        pass_rep.alias("pass_repetition"),
        (pass_words & pass_mwl & pass_sym & pass_stop & pass_rep).alias(
            "pass_gopher"
        ),
    )


def _r(expr: str, n: int) -> str:
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(38,{n + 4})), {n}) AS DOUBLE)"


TEXT_QUALITY_GOPHER_ORACLE = f"""
WITH base AS (
    SELECT doc_id, source, text,
        {TOKENIZE_SQL.format(c="text")} AS toks,
        length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS symbols,
        length(regexp_replace(text, '\\s', '', 'g')) AS nonspace
    FROM documents
),
bg AS (
    SELECT doc_id,
        unnest(list_transform(generate_series(1, len(toks) - 1),
                              i -> concat(toks[i], ' ', toks[i+1]))) AS bg
    FROM base WHERE len(toks) >= 2
),
bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
top AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM bgc GROUP BY doc_id),
m AS (
    SELECT b.doc_id, b.source,
        len(b.toks) AS n_words,
        CAST(b.nonspace AS DOUBLE) / NULLIF(CAST(len(b.toks) AS DOUBLE), 0) AS mwl,
        CAST(b.symbols AS DOUBLE) / NULLIF(CAST(len(b.toks) AS DOUBLE), 0) AS swr,
        len(list_filter(b.toks, t -> t IN ({_sql_list(STOPWORDS["en"])}))) AS stopword_hits,
        1.0 - CAST(len(list_distinct(b.toks)) AS DOUBLE)
            / NULLIF(CAST(len(b.toks) AS DOUBLE), 0) AS dupf,
        COALESCE(CAST(t.top_bg AS DOUBLE) / CAST(t.n_bg AS DOUBLE), 0.0) AS topbgf
    FROM base b LEFT JOIN top t USING (doc_id)
)
SELECT doc_id, source,
    CAST(n_words AS INT) AS n_words,
    {_r("mwl", 4)} AS mean_word_len,
    {_r("swr", 4)} AS symbol_word_ratio,
    CAST(stopword_hits AS INT) AS stopword_hits,
    {_r("dupf", 4)} AS dup_token_frac,
    {_r("topbgf", 4)} AS top_bigram_frac,
    n_words >= {MIN_WORDS} AS pass_word_count,
    mwl BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN} AS pass_mean_word_len,
    swr <= {MAX_SYMBOL_WORD_RATIO} AS pass_symbol_ratio,
    stopword_hits >= {MIN_STOPWORD_HITS} AS pass_stopwords,
    dupf <= {MAX_DUP_TOKEN_FRAC} AND topbgf <= {MAX_TOP_BIGRAM_FRAC} AS pass_repetition,
    n_words >= {MIN_WORDS}
        AND mwl BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
        AND swr <= {MAX_SYMBOL_WORD_RATIO}
        AND stopword_hits >= {MIN_STOPWORD_HITS}
        AND dupf <= {MAX_DUP_TOKEN_FRAC}
        AND topbgf <= {MAX_TOP_BIGRAM_FRAC} AS pass_gopher
FROM m"""


def register_all(register) -> None:
    register("text_quality_gopher", text_quality_gopher, TEXT_QUALITY_GOPHER_ORACLE)
