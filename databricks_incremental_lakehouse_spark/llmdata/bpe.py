"""Byte-Pair-Encoding vocabulary induction — tokenizer TRAINING as a
distributed job (Sennrich et al. 2016, the construction behind the
GPT-2/LLaMA tokenizer vocabularies).

``vocab_bpe_merges`` runs ``BPE_MERGES`` merge iterations and returns the
learned merge table (rank, pair, merged symbol, weighted pair count) —
the artifact a tokenizer ships. Classic BPE:

1. every word type starts as its character sequence + ``</w>`` end marker,
   weighted by corpus frequency;
2. each iteration counts adjacent symbol pairs (frequency-weighted,
   overlapping occurrences counted like the reference implementation's
   ``zip(word, word[1:])``) and merges the most frequent pair (lexical
   tiebreak) everywhere, left-to-right non-overlapping.

Scale shape: the only corpus-sized stage is the word-frequency aggregate
(vocabulary-bounded shuffle, map-side partial). The merge loop then runs
on the WORD-TYPE table — rows = |vocabulary|, not corpus size — so each
iteration is a tiny pair-explode + aggregate; the per-iteration driver
value is ONE row (the argmax pair), the same bounded-collect discipline
as the k-means centroid loop. At 100 TB the frequency table is the only
thing that grows with data, and it grows with the vocabulary, not the
token count.

Cross-engine exactness: pair statistics are integer SUMs of bigint
frequencies; the merge rewrite is plain (non-regex) ``replace`` over a
DOUBLE-SPACED copy of the symbol string — ``' x  y  x  y '`` gives every
occurrence its own boundary spaces, so one left-to-right replace pass
merges exactly the occurrences BPE's greedy scan merges (single-spaced,
back-to-back occurrences share a delimiter and the scan skips every
second one: ``' x y x y '`` -> ``' xy x y '`` — the r7 self-review
catch), then the doubles collapse back; argmax tiebreak is (count DESC,
pair ASC). The DuckDB oracle replays every iteration with the same
operations, so the learned merge table is value-hash-checked end to end.
Every iteration CTE is AS MATERIALIZED: DuckDB inlines CTEs referenced
more than once, and each s_i is consumed by both best_{i+1} and s_{i+1}
— un-materialized, the 8-deep chain re-executed exponentially (~2^8
scans, 443s at sf0.01; 4s materialized).

The reference has no text surface (its corpus is relational TPC-H,
src/extract/*); this operator belongs to the LLM-training-data extension
brief's "token counting (whitespace + a BPE-ish regex)" family — this is
the induction side of that coin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .texthash import TOKENIZE_SQL, tokenize

BPE_MERGES = 8  # learned merge ranks returned (rank 6+ builds on rank-1/7 output at every SF of this corpus — the iterations demonstrably compose)
END_MARK = "</w>"


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


# guard the single-symbol case: Spark's sequence(1, 0) is DESCENDING
# ([1, 0] -> element_at index 0 throws), unlike DuckDB's empty series — a
# fully-merged short word (e.g. 'a</w>') hits it from iteration 2 on
_PAIRS_EXPR = (
    "CASE WHEN size(syms) < 2 THEN array() "
    "ELSE transform(sequence(1, size(syms) - 1), "
    "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) END"
)


def _merge_pair_col(seq_col: str, pair: str):
    """Merge every greedy-left-to-right occurrence of ``pair`` ('L R') in
    the space-separated symbol string: double-space so back-to-back
    occurrences stop sharing a delimiter, one replace pass, collapse.
    Search/replace travel as literal Columns, never interpolated into SQL
    text (symbols may hold any characters)."""
    merged = pair.replace(" ", "")
    padded = F.concat(
        F.lit(" "), F.replace(F.col(seq_col), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    replaced = F.replace(
        padded, F.lit(f" {pair.replace(' ', '  ')} "), F.lit(f" {merged} ")
    )
    return F.trim(F.replace(replaced, F.lit("  "), F.lit(" ")))


def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table after ``BPE_MERGES`` iterations:
    (merge_rank, pair, merged, pair_count)."""
    # persist the induction's one corpus-sized stage: every iteration's
    # argmax job roots here, and without the pin the documents scan +
    # token explode + vocabulary shuffle would re-run per rank (the Spark
    # twin of the oracle's AS MATERIALIZED fix)
    seqs = (
        _word_freqs(spark, sf_dir)
        .select(
            "freq",
            F.concat(
                F.regexp_replace(F.col("word"), "(.)", "$1 "), F.lit(END_MARK)
            ).alias("seq"),
        )
        .persist()
    )
    out_rows = []
    for rank in range(1, BPE_MERGES + 1):
        pairs = (
            seqs.withColumn("syms", F.split("seq", " "))
            .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.col("pair_count").desc(), F.col("pair").asc()
        ).first()
        if best is None:  # every word fully merged: vocabulary exhausted
            break
        merged = best.pair.replace(" ", "")
        out_rows.append((rank, best.pair, merged, int(best.pair_count)))
        seqs = seqs.select("freq", _merge_pair_col("seq", best.pair).alias("seq"))
    return spark.createDataFrame(
        out_rows, "merge_rank int, pair string, merged string, pair_count bigint"
    )


def _bpe_iter_cte(prev: str, nxt: str, rank: int) -> str:
    """One oracle iteration: pair stats over ``prev`` sequences, the
    argmax row ``best{rank}``, and the merged sequences ``nxt``."""
    return f"""
best{rank} AS MATERIALIZED (
    SELECT {rank} AS merge_rank, pair, replace(pair, ' ', '') AS merged,
           SUM(freq) AS pair_count
    FROM (
        SELECT freq, unnest(list_transform(
            generate_series(1, len(syms) - 1),
            i -> concat(syms[i], ' ', syms[i + 1]))) AS pair
        FROM (SELECT freq, string_split(seq, ' ') AS syms FROM {prev})
    )
    GROUP BY pair ORDER BY pair_count DESC, pair ASC LIMIT 1
),
{nxt} AS MATERIALIZED (
    SELECT freq, trim(replace(replace(
               concat(' ', replace(seq, ' ', '  '), ' '),
               concat(' ', replace((SELECT pair FROM best{rank}), ' ', '  '), ' '),
               concat(' ', (SELECT merged FROM best{rank}), ' ')),
           '  ', ' ')) AS seq
    FROM {prev}
)"""


def _bpe_oracle() -> str:
    parts = [
        f"""
WITH wf AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest({TOKENIZE_SQL.format(c="text")}) AS word FROM documents
    ) WHERE word <> '' GROUP BY word
),
s0 AS (
    SELECT freq,
           concat(regexp_replace(word, '(.)', '\\1 ', 'g'), '{END_MARK}') AS seq
    FROM wf
)"""
    ]
    for rank in range(1, BPE_MERGES + 1):
        parts.append("," + _bpe_iter_cte(f"s{rank - 1}", f"s{rank}", rank))
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, pair, merged, CAST(pair_count AS BIGINT) "
        f"AS pair_count FROM best{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return "".join(parts) + "\n" + union


VOCAB_BPE_ORACLE = _bpe_oracle()


def register_all(register) -> None:
    register("vocab_bpe_merges", vocab_bpe_merges, VOCAB_BPE_ORACLE)
