"""PII detection and redaction over the ``documents`` table — the scrub
pass every LLM training-data pipeline runs before anything else ships.

- ``text_pii_scrub``  : per-document PII hit counts (emails / phone
  numbers / IPv4 addresses) and the REDACTED text, verified across
  engines by md5 so the oracle proves byte-identical redaction.
- ``text_pii_report`` : per-source compliance rollup (docs scanned,
  docs with PII, hit totals, density) — the audit artifact.

The synthetic corpus is digit-free word-salad, so — exactly like the
multimodal ``fake_decode`` harness (multimodal.py) — both engines first
AUGMENT each document with deterministic PII derived from ``doc_id``
(same expression, same arithmetic, no randomness). The augmentation is
declared test scaffolding; the operator under test is the detection /
redaction machinery, which runs on real text unchanged (a production
corpus simply skips the augment step via ``pii_scrub_frame``).

All detection patterns avoid backslash escapes entirely (``[.]`` instead
of ``\\.``) so the same literal pattern is valid and equivalent in both
Java regex (Spark) and RE2 (DuckDB); DuckDB's ``regexp_replace`` needs
the explicit ``'g'`` flag to match Spark's replace-all semantics.

Scale: the scrub is pure per-row expression work — whole-stage
codegenned, zero shuffle, embarrassingly parallel at any corpus size.
The report adds one aggregation bounded by the ``source`` domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import round_dbl
from ..operators.rounding import round_dbl_sql
from ..tables import load_table

# no-backslash patterns: identical semantics in Java regex and RE2
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "555-[0-9]{4}"
IP_RE = "([0-9]{1,3}[.]){3}[0-9]{1,3}"


def _augmented(doc_id: Column, text: Column) -> Column:
    """Deterministic PII injection from ``doc_id`` (test scaffolding —
    see module docstring). Every doc gets one email; every 3rd a phone,
    every 5th an IPv4, every 7th a second email on another domain."""
    did = doc_id.cast("string")
    return F.concat(
        F.coalesce(text, F.lit("")),
        F.lit(" contact user"),
        did,
        F.lit("@example.com"),
        F.when(
            doc_id % 3 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((doc_id % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 5 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (doc_id % 256).cast("string"),
                F.lit("."),
                ((doc_id * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 7 == 0,
            F.concat(F.lit(" cc admin"), did, F.lit("@mail.test")),
        ).otherwise(F.lit("")),
    )


def pii_scrub_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The production scrub: counts + redaction over ``text_col`` as-is.

    Redaction order is fixed (email, then IP, then phone) and mirrored in
    the oracle — with these patterns the match sets are disjoint, but a
    fixed order keeps the contract deterministic if patterns evolve."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.withColumns(
        {
            "n_email": F.regexp_count(t, F.lit(EMAIL_RE)).cast("int"),
            "n_phone": F.regexp_count(t, F.lit(PHONE_RE)).cast("int"),
            "n_ip": F.regexp_count(t, F.lit(IP_RE)).cast("int"),
            "redacted": redacted,
        }
    ).withColumn("n_pii", (F.col("n_email") + F.col("n_phone") + F.col("n_ip")).cast("int"))


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document scrub result; redacted text crosses the oracle
    boundary as md5 + length so byte-identical redaction is what the
    value hash actually proves."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _augmented(F.col("doc_id"), F.col("text")).alias("text")
    )
    out = pii_scrub_frame(docs)
    return out.select(
        "doc_id",
        "source",
        "n_email",
        "n_phone",
        "n_ip",
        "n_pii",
        F.md5(F.col("redacted")).alias("redacted_md5"),
        F.length("redacted").cast("int").alias("redacted_len"),
    )


def text_pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compliance rollup of the scrub pass."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _augmented(F.col("doc_id"), F.col("text")).alias("text")
    )
    scrub = pii_scrub_frame(docs)
    return (
        scrub.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum((F.col("n_pii") > 0).cast("int")).cast("int").alias("docs_with_pii"),
            F.sum("n_email").cast("bigint").alias("total_email"),
            F.sum("n_phone").cast("bigint").alias("total_phone"),
            F.sum("n_ip").cast("bigint").alias("total_ip"),
            round_dbl(
                F.sum("n_pii") / F.count(F.lit(1)).cast("double"), 4
            ).alias("avg_pii_per_doc"),
        )
        .orderBy("source")
    )


_AUG_SQL = """
    COALESCE(text, '')
    || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
    || CASE WHEN doc_id % 3 = 0
            THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@mail.test'
            ELSE '' END
"""

_SCRUB_CTE = f"""
aug AS (
    SELECT doc_id, source, {_AUG_SQL} AS text FROM documents
),
scrub AS (
    SELECT doc_id, source,
           CAST(length(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_email,
           CAST(length(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phone,
           CAST(length(regexp_extract_all(text, '{IP_RE}')) AS INT) AS n_ip,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{IP_RE}', '<IP>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM aug
)"""

TEXT_PII_SCRUB_ORACLE = f"""
WITH {_SCRUB_CTE}
SELECT doc_id, source, n_email, n_phone, n_ip,
       n_email + n_phone + n_ip AS n_pii,
       md5(redacted) AS redacted_md5,
       CAST(length(redacted) AS INT) AS redacted_len
FROM scrub"""

TEXT_PII_REPORT_ORACLE = f"""
WITH {_SCRUB_CTE}
SELECT source,
       CAST(count(*) AS INT) AS n_docs,
       CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END) AS INT)
           AS docs_with_pii,
       CAST(sum(n_email) AS BIGINT) AS total_email,
       CAST(sum(n_phone) AS BIGINT) AS total_phone,
       CAST(sum(n_ip) AS BIGINT) AS total_ip,
       {round_dbl_sql("sum(n_email + n_phone + n_ip) / CAST(count(*) AS DOUBLE)", 4)}
           AS avg_pii_per_doc
FROM scrub
GROUP BY source
ORDER BY source"""


def register_all(register) -> None:
    register("text_pii_scrub", text_pii_scrub, TEXT_PII_SCRUB_ORACLE)
    register("text_pii_report", text_pii_report, TEXT_PII_REPORT_ORACLE)
