"""Text analysis operators over the ``documents`` table.

- ``text_stats``      : token counts, punctuation/stopword ratios, a
  composite quality score — the standard cheap quality filters of an LLM
  data pipeline (C4/Gopher-style heuristics).
- ``text_langid``     : stopword-profile language scoring (n-gram-free
  heuristic; deterministic CASE cascade).
- ``text_fingerprint``: md5 + portable 60-bit content fingerprints, plus a
  min-shingle-hash document fingerprint (the MinHash k=1 special case).

Everything is built-in expression work (zero Python UDFs) so it whole-stage
codegens; per-document metrics are embarrassingly parallel — no shuffle at
all until a downstream consumer aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import round_dbl
from ..tables import load_table
from .texthash import TOKENIZE_SQL, hash60, hash60_sql, tokenize
from .tokmemo import doc_tokens

# Small in-query stopword profiles (deterministic, oracle-portable).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"],
}


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics + composite score."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = tokenize(F.col("text"))
    n_tokens = F.size(tokens)
    text_len = F.length("text")
    # characters that are neither alphanumeric nor whitespace
    punct = text_len - F.length(
        F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9\s]", "")
    )
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    stop_hits = F.size(
        F.filter(tokens, lambda t: t.isin(STOPWORDS["en"]))
    )
    punct_ratio = punct / F.nullif(text_len.cast("double"), F.lit(0.0))
    stop_ratio = stop_hits / F.nullif(n_tokens.cast("double"), F.lit(0.0))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        text_len.alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        # BPE-ish subword count: alpha runs, digit runs, and each remaining
        # symbol count as one token — a cheap proxy for byte-pair vocab
        # tokenization (class-based regex, identical in Java and RE2 dialects)
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
        .cast("int")
        .alias("n_subword_tokens"),
        round_dbl(nonspace / F.nullif(n_tokens.cast("double"), F.lit(0.0)), 4).alias(
            "avg_token_len"
        ),
        round_dbl(punct_ratio, 4).alias("punct_ratio"),
        round_dbl(stop_ratio, 4).alias("stopword_ratio"),
        round_dbl(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.4
            + stop_ratio * 0.3
            + (F.lit(1.0) - punct_ratio) * 0.3,
            4,
        ).alias("quality_score"),
    )


def _r(expr: str, n: int) -> str:
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(38,{n + 4})), {n}) AS DOUBLE)"


TEXT_STATS_ORACLE = f"""
WITH base AS (
    SELECT doc_id, lang, source, text,
        {TOKENIZE_SQL.format(c="text")} AS toks,
        length(text) AS n_chars_measured,
        length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS punct,
        length(regexp_replace(text, '\\s', '', 'g')) AS nonspace
    FROM documents
),
m AS (
    SELECT doc_id, lang, source, n_chars_measured,
        len(toks) AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords,
        CAST(nonspace AS DOUBLE) / NULLIF(CAST(len(toks) AS DOUBLE), 0) AS avg_tok,
        CAST(punct AS DOUBLE) / NULLIF(CAST(n_chars_measured AS DOUBLE), 0) AS punct_ratio,
        CAST(len(list_filter(toks, t -> t IN ({_sql_list(STOPWORDS["en"])}))) AS DOUBLE)
            / NULLIF(CAST(len(toks) AS DOUBLE), 0) AS stop_ratio
    FROM base
)
SELECT doc_id, lang, source,
    CAST(n_chars_measured AS INT) AS n_chars_measured,
    CAST(n_tokens AS INT) AS n_tokens,
    CAST(n_subwords AS INT) AS n_subword_tokens,
    {_r("avg_tok", 4)} AS avg_token_len,
    {_r("punct_ratio", 4)} AS punct_ratio,
    {_r("stop_ratio", 4)} AS stopword_ratio,
    {_r("least(1.0, n_tokens / 100.0) * 0.4 + stop_ratio * 0.3 + (1.0 - punct_ratio) * 0.3", 4)} AS quality_score
FROM m"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score = profile-hit ratio per language,
    predict the argmax (CJK-character presence short-circuits to 'zh');
    deterministic preference order en>es>de>fr on ties.

    Computed on the codegen path: the union stopword vocabulary becomes a
    broadcast flag table (token, f_en..f_fr — a word can sit in several
    profiles), tokens are exploded once and left-joined to it, and one
    groupBy(doc_id) produces the token count plus all per-language hit
    counts as wide sum aggregates. The per-doc higher-order
    ``filter(tokens, isin(...))`` form re-evaluated the interpreted
    tokenizer per language and was measured 2-6x slower (and scaled
    linearly with a far larger constant at 10x corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    langs = list(STOPWORDS)
    vocab = sorted({w for ws in STOPWORDS.values() for w in ws})
    sw = spark.createDataFrame(
        [tuple([w] + [1 if w in STOPWORDS[lang] else 0 for lang in langs]) for w in vocab],
        "token string, " + ", ".join(f"f_{lang} int" for lang in langs),
    )
    tok = doc_tokens(spark, sf_dir)  # shared token memo (tokmemo.py)
    agg = (
        tok.join(F.broadcast(sw), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            *[
                F.sum(F.coalesce(f"f_{lang}", F.lit(0))).alias(f"h_{lang}")
                for lang in langs
            ],
        )
    )
    scores = {
        lang: F.col(f"h_{lang}")
        / F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0))
        for lang in langs
    }
    # \x{...} class syntax is shared by Java regex (Spark) and RE2 (DuckDB)
    has_cjk = F.length(F.regexp_replace(F.col("text"), r"[^\x{4e00}-\x{9fff}]", "")) > 0
    best = F.greatest(*scores.values())
    pred = (
        F.when(F.col("cjk"), F.lit("zh"))
        .when(best <= 0, F.lit("unknown"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["es"] == best, F.lit("es"))
        .when(scores["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return (
        docs.select("doc_id", "lang", has_cjk.alias("cjk"))
        .join(agg, "doc_id")
        .select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            pred.alias("predicted_lang"),
            round_dbl(best, 4).alias("top_score"),
        )
    )


def _score_sql(words: list[str]) -> str:
    return (
        f"CAST(len(list_filter(toks, t -> t IN ({_sql_list(words)}))) AS DOUBLE)"
        " / NULLIF(CAST(len(toks) AS DOUBLE), 0)"
    )


TEXT_LANGID_ORACLE = f"""
WITH base AS (
    SELECT doc_id, lang, text, {TOKENIZE_SQL.format(c="text")} AS toks FROM documents
),
s AS (
    SELECT doc_id, lang,
        {_score_sql(STOPWORDS["en"])} AS s_en,
        {_score_sql(STOPWORDS["es"])} AS s_es,
        {_score_sql(STOPWORDS["de"])} AS s_de,
        {_score_sql(STOPWORDS["fr"])} AS s_fr,
        length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0 AS has_cjk
    FROM base
)
SELECT doc_id, lang AS labeled_lang,
    CASE
        WHEN has_cjk THEN 'zh'
        WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'unknown'
        WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        ELSE 'fr'
    END AS predicted_lang,
    {_r("greatest(s_en, s_es, s_de, s_fr)", 4)} AS top_score
FROM s"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: exact (md5 of normalized text), 60-bit integer
    form, and a min-shingle-hash (3-token shingles — MinHash k=1) that is
    stable under small edits.

    The shingle min rides dedup's codegen shingle path (posexplode +
    window lead) and a per-doc ``min`` aggregate: an earlier cut hashed a
    per-row higher-order ``transform`` over the shingle array, and Spark
    evaluates HOF lambdas interpreted per element — md5 + base-16 conv per
    shingle was the whole runtime (4.7s -> 39s at a 10x corpus, vs
    1.3 -> 7.5 on this form; min over DISTINCT shingles equals min over
    all, so ``_exploded_shingles``'s dedup is free candidate pruning)."""
    from .dedup import _exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.lower(F.col("text")))
    minsh = (
        _exploded_shingles(docs)
        .select("doc_id", hash60(F.col("shingle")).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("min_shingle_hash"))
    )
    return (
        docs.select(
            "doc_id",
            F.md5(norm).alias("content_md5"),
            hash60(norm).alias("content_hash60"),
        )
        .join(minsh, "doc_id", "left")
        # NULL/absent text yields no shingle rows; pin the empty-shingle
        # hash the inline form produced for that edge
        .withColumn(
            "min_shingle_hash",
            F.coalesce(F.col("min_shingle_hash"), hash60(F.lit(""))),
        )
    )


TEXT_FINGERPRINT_ORACLE = f"""
WITH base AS (
    SELECT doc_id, trim(lower(text)) AS norm,
        {TOKENIZE_SQL.format(c="text")} AS toks
    FROM documents
),
sh AS (
    SELECT doc_id, norm,
        CASE WHEN len(toks) >= 3
             THEN list_transform(generate_series(1, len(toks) - 2),
                                 i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
             ELSE [array_to_string(toks, ' ')]
        END AS shingles
    FROM base
)
SELECT doc_id,
    md5(norm) AS content_md5,
    {hash60_sql("norm")} AS content_hash60,
    list_min(list_transform(shingles, s -> {hash60_sql("s")})) AS min_shingle_hash
FROM sh"""


def register_all(register) -> None:
    register("text_stats", text_stats, TEXT_STATS_ORACLE)
    register("text_langid", text_langid, TEXT_LANGID_ORACLE)
    register("text_fingerprint", text_fingerprint, TEXT_FINGERPRINT_ORACLE)
