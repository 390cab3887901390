"""Training-corpus sharding and budget selection — the last-mile steps
between a curated corpus and a training run:

- ``corpus_shard_assign``     : deterministic shard + within-shard order
  for every document — the "global shuffle" a training job needs, with
  ZERO global stages: shard = portable hash mod N (embarrassingly
  parallel) and position = a row_number window PARTITIONED BY shard, so
  every exchange is a hash shuffle. The hash order within a shard IS the
  shuffled read order (hash-ordering a corpus is the standard
  deterministic shuffle trick — no RNG state, replayable anywhere).
- ``corpus_token_budget_select``: keep the highest-quality documents
  until a token budget is exhausted — the "select top docs by quality
  until N tokens" cut every data-mixture recipe needs. The naive form is
  a GLOBAL cumulative sum over quality-ordered docs (a single-partition
  window — the exact shape this repo's scoped variants exist to avoid).
  Here the cut point is found on VALUE-DOMAIN-BOUNDED aggregates instead:
  quality scores live on a 4-dp grid, so a groupBy(quality) token total
  has at most ~10^4 rows at ANY corpus size; the driver walks those rows
  to find the boundary quality value, and only the docs AT the boundary
  value need a within-group cumulative window (partitioned by the quality
  value — never global). The DuckDB oracle computes the straightforward
  global-window cumsum, making the parity check a proof that the
  binned-boundary algorithm equals the global-order definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..pinning import pin

from ..tables import load_table
from .texthash import hash60, hash60_sql

N_SHARDS = 8
_SHARD_SEED = "shard#"


def corpus_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, position): deterministic training-shard assignment
    and shuffled within-shard order, from the portable hash family."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = hash60(F.concat(F.lit(_SHARD_SEED), F.col("doc_id").cast("string")))
    df = docs.select(
        "doc_id", h.alias("h"), (h % N_SHARDS).cast("int").alias("shard")
    )
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return df.select(
        "doc_id", "shard", F.row_number().over(w).alias("position")
    )


_H_SQL = hash60_sql(f"concat('{_SHARD_SEED}', CAST(doc_id AS VARCHAR))")

CORPUS_SHARD_ORACLE = f"""
WITH d AS (
    SELECT doc_id, {_H_SQL} AS h,
           CAST({_H_SQL} % {N_SHARDS} AS INT) AS shard
    FROM documents
)
SELECT doc_id, shard,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC)
         AS INT) AS position
FROM d"""


# budget = total corpus tokens div TOKEN_BUDGET_DEN (integer-exact on both
# engines); 2 keeps roughly the better half by quality — binds at every SF
TOKEN_BUDGET_DEN = 2


def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents in (quality DESC, doc_id ASC) order until the token
    budget is exhausted (inclusive-cumulative <= budget), WITHOUT a
    global window — see module docstring. The driver-side walk touches
    one row per distinct 4-dp quality value (value-domain-bounded, never
    data-sized); only boundary-quality docs run a window, partitioned by
    their quality value."""
    from .textstats import text_stats

    # pinned once: the boundary search (an action) and the returned plan
    # both read the per-doc stats; without the checkpoint the second use
    # re-runs the whole text_stats scan (measured 2x the linear cost at
    # 10x docs). This 3-column doc-grain frame is exactly the stats table
    # a production pipeline materializes anyway.
    # NULL contract (module convention — cf. text_chunk_overlap's
    # isNotNull filter): a NULL-text document has NULL quality/token
    # stats, cannot be ordered or budgeted, and is EXCLUDED from the
    # output on both engines; without the filter the driver-side boundary
    # sort would negate None and crash.
    ts = (
        text_stats(spark, sf_dir)
        .select("doc_id", "n_tokens", "quality_score")
        .filter(
            F.col("quality_score").isNotNull() & F.col("n_tokens").isNotNull()
        )
        .transform(pin)
    )
    qrows = sorted(
        ts.groupBy("quality_score")
        .agg(F.sum("n_tokens").alias("t"))
        .collect(),
        key=lambda r: -r.quality_score,
    )
    total = sum(r.t for r in qrows)
    budget = total // TOKEN_BUDGET_DEN
    prior = 0
    boundary_q = None
    for r in qrows:
        if prior + r.t <= budget:
            prior += r.t
        else:
            boundary_q = r.quality_score
            break
    if boundary_q is None:
        # budget covers everything: selected = all (den=1 degenerate case)
        return ts.select(
            "doc_id", "n_tokens", "quality_score", F.lit(True).alias("selected")
        )
    w = (
        Window.partitionBy("quality_score")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = F.sum("n_tokens").over(w)
    selected = (
        F.when(F.col("quality_score") > F.lit(boundary_q), F.lit(True))
        .when(
            (F.col("quality_score") == F.lit(boundary_q))
            & (F.lit(prior) + within <= F.lit(budget)),
            F.lit(True),
        )
        .otherwise(F.lit(False))
    )
    return ts.select(
        "doc_id", "n_tokens", "quality_score", selected.alias("selected")
    )


def _budget_oracle() -> str:
    from .textstats import TEXT_STATS_ORACLE

    return f"""
WITH ts AS (
    SELECT doc_id, n_tokens, quality_score FROM ({TEXT_STATS_ORACLE})
    WHERE quality_score IS NOT NULL AND n_tokens IS NOT NULL
),
c AS (
    SELECT doc_id, n_tokens, quality_score,
        SUM(n_tokens) OVER (
            ORDER BY quality_score DESC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum
    FROM ts
)
SELECT doc_id, n_tokens, quality_score,
    cum <= (SELECT SUM(n_tokens) // {TOKEN_BUDGET_DEN} FROM ts) AS selected
FROM c"""


# training-token budget for the mixture = total available // MIX_BUDGET_DEN
# (integer-exact on both engines); target mixture is UNIFORM across sources
# — a declared-weights table would broadcast-join in exactly the same plan.
MIX_BUDGET_DEN = 2


def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source domain-mixing weights: given each source's available
    tokens and a uniform target mixture over a training budget, the
    sampling rate (capped at 1), the UNCAPPED repeat factor (>1 means the
    source is up-sampled / multi-epoched, the standard recipe for small
    high-quality domains), and the token shortfall.

    Scale: one aggregation bounded by the ``source`` domain, then pure
    scalar arithmetic against a broadcast one-row totals frame — no
    global window, no data-sized shuffle. The NULL-token contract follows
    :func:`corpus_token_budget_select` (NULL-text docs are unbudgetable
    and excluded on both engines)."""
    from .textstats import text_stats

    ts = (
        text_stats(spark, sf_dir)
        .select("source", "n_tokens")
        .filter(F.col("n_tokens").isNotNull())
    )
    per_source = ts.groupBy("source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_available"),
    )
    totals = per_source.agg(
        F.sum("tokens_available").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    j = per_source.crossJoin(F.broadcast(totals))
    budget = F.floor(F.col("total_tokens") / MIX_BUDGET_DEN).cast("bigint")
    target = budget.cast("double") / F.col("n_sources").cast("double")
    avail = F.col("tokens_available").cast("double")
    from ..operators import round_dbl

    return j.select(
        "source",
        "n_docs",
        "tokens_available",
        round_dbl(target, 2).alias("target_tokens"),
        round_dbl(F.least(F.lit(1.0), target / avail), 6).alias("sample_rate"),
        round_dbl(target / avail, 6).alias("repeat_factor"),
        round_dbl(F.greatest(F.lit(0.0), target - avail), 2).alias(
            "shortfall_tokens"
        ),
    ).orderBy("source")


def _mixture_oracle() -> str:
    from ..operators.rounding import round_dbl_sql
    from .textstats import TEXT_STATS_ORACLE

    target = "(t.total_tokens // {den}) / CAST(t.n_sources AS DOUBLE)".format(
        den=MIX_BUDGET_DEN
    )
    avail = "CAST(p.tokens_available AS DOUBLE)"
    return f"""
WITH ts AS (
    SELECT source, n_tokens FROM ({TEXT_STATS_ORACLE})
    WHERE n_tokens IS NOT NULL
),
p AS (
    SELECT source, CAST(count(*) AS INT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_available
    FROM ts GROUP BY source
),
t AS (
    SELECT CAST(sum(tokens_available) AS BIGINT) AS total_tokens,
           count(*) AS n_sources
    FROM p
)
SELECT p.source, p.n_docs, p.tokens_available,
       {round_dbl_sql(target, 2)} AS target_tokens,
       {round_dbl_sql(f"least(1.0, {target} / {avail})", 6)} AS sample_rate,
       {round_dbl_sql(f"{target} / {avail}", 6)} AS repeat_factor,
       {round_dbl_sql(f"greatest(0.0, {target} - {avail})", 2)} AS shortfall_tokens
FROM p, t
ORDER BY p.source"""


def register_all(register) -> None:
    register("corpus_shard_assign", corpus_shard_assign, CORPUS_SHARD_ORACLE)
    register(
        "corpus_token_budget_select",
        corpus_token_budget_select,
        _budget_oracle(),
    )
    register("corpus_mixture_weights", corpus_mixture_weights, _mixture_oracle())
