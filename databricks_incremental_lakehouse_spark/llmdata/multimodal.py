"""Multimodal column plumbing — opaque binary payloads + typed metadata.

The pattern for image/audio/video in a Spark training-data pipeline: the
payload is an opaque ``binary`` column with typed metadata columns beside
it; decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas functions via ``mapInPandas`` (payloads never pass through Python
row-at-a-time).

The decode stage is STUBBED here (no imaging/audio libs in this container —
FIXTURES.md environment): :func:`decode_image` raises ``NotImplementedError``
and the pipeline runs :func:`fake_decode` — a deterministic byte-statistics
extractor — through the *real* Spark plumbing (schema contract, Arrow batch
iteration, partition-preserving mapInPandas). Swapping in PIL/ffmpeg later
changes one function, not the plan.

Scale notes: ``mapInPandas`` streams Arrow record batches, so peak memory is
one batch of payloads, not one partition; payload columns should be pruned
before any wide shuffle (metadata-only shuffles, payload re-joined by key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

# Output schema contract of the feature extractor.
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, first_byte int, byte_mean double, width int, height int"
)


def decode_image(payload: bytes) -> "object":
    """Real decoder hook (PIL.Image.open etc.). Not available here."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; use fake_decode for the plumbing path"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: byte statistics + fake dimensions
    derived from the payload so downstream schema/logic is exercised."""
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else 0,
        "byte_mean": (sum(payload) / n) if n else 0.0,
        "width": 16 + (payload[0] % 16) if n else 0,
        "height": 16 + (payload[-1] % 16) if n else 0,
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch of (doc_id, payload) in, one
    batch of features out."""
    for pdf in batches:
        feats = [fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (the test corpus has no real media, so
    the document text bytes stand in as the payload — the plumbing neither
    knows nor cares)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("content_type"),
        F.length(F.col("text")).alias("payload_hint_bytes"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched feature extraction -> typed features.

    The mapInPandas stage is intentionally Python (that is the operator
    under test); its deterministic byte-statistics output is replayed by a
    DuckDB oracle that re-derives each byte from ``hex(encode(text))`` —
    integer-exact, so even ``byte_mean`` (exact int sum / n) hashes
    identically across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs)
    return payloads.select("doc_id", "payload").mapInPandas(
        _extract_features, schema=FEATURE_SCHEMA
    )


# byte i of the payload, via the hex dump (DuckDB has no get_byte);
# strpos math turns each hex pair back into 0-255
_BYTES_CTE = """
    SELECT doc_id, n,
        list_transform(generate_series(1, CAST(n AS INT)), i ->
            (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
            + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) AS bv
    FROM (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    )"""

MULTIMODAL_FEATURES_ORACLE = f"""
WITH b AS ({_BYTES_CTE})
SELECT doc_id,
    CAST(n AS INT) AS n_bytes,
    CAST(CASE WHEN n > 0 THEN bv[1] ELSE 0 END AS INT) AS first_byte,
    CASE WHEN n > 0 THEN CAST(list_sum(bv) AS DOUBLE) / n ELSE 0.0 END AS byte_mean,
    CAST(CASE WHEN n > 0 THEN 16 + (bv[1] % 16) ELSE 0 END AS INT) AS width,
    CAST(CASE WHEN n > 0 THEN 16 + (bv[CAST(n AS INT)] % 16) ELSE 0 END AS INT) AS height
FROM b"""


FRAME_BYTES = 32  # payload bytes per fake "frame"
FRAME_SAMPLE_EVERY = 4  # keep every 4th frame

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frame_bytes int, "
    "frame_first_byte int, frame_byte_mean double"
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with the 1:N video shape: each payload chunks
    into fixed-size fake frames, every FRAME_SAMPLE_EVERY-th frame emits
    one OUTPUT ROW — the cardinality-expanding plumbing (frame sampling,
    audio windowing, page splitting) that the 1:1 feature kernel cannot
    express. Still one Arrow batch in, one out."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
                fb = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": idx,
                        "n_frame_bytes": len(fb),
                        "frame_first_byte": fb[0],
                        "frame_byte_mean": sum(fb) / len(fb),
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "frame_idx",
                "n_frame_bytes",
                "frame_first_byte",
                "frame_byte_mean",
            ],
        )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary payload: the video-pipeline step
    (decode container -> sample every k-th frame -> per-frame features)
    with the decode stubbed to fixed-size byte chunks and the Spark
    plumbing real — Arrow batches, a cardinality-expanding kernel, typed
    per-frame schema. Swapping in ffmpeg changes ``_sample_frames``'s
    body, not the plan."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs)
    return payloads.select("doc_id", "payload").mapInPandas(
        _sample_frames, schema=FRAME_SCHEMA
    )


MULTIMODAL_FRAME_SAMPLE_ORACLE = f"""
WITH b AS ({_BYTES_CTE}),
f AS (
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
        bv[(i * {FRAME_BYTES} + 1):least((i + 1) * {FRAME_BYTES}, CAST(n AS INT))]
            AS fb
    FROM b,
        unnest(generate_series(0,
            CAST(ceil(n / {FRAME_BYTES}.0) AS INT) - 1)) AS u(i)
    WHERE i % {FRAME_SAMPLE_EVERY} = 0
)
SELECT doc_id, frame_idx,
    CAST(len(fb) AS INT) AS n_frame_bytes,
    CAST(fb[1] AS INT) AS frame_first_byte,
    CAST(list_sum(fb) AS DOUBLE) / len(fb) AS frame_byte_mean
FROM f"""


def multimodal_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over extracted features — the downstream consumer shape
    (metadata-only, payloads pruned before the shuffle)."""
    feats = multimodal_features(spark, sf_dir)
    return feats.groupBy((F.col("width") % 4).alias("width_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("height").alias("min_height"),
        F.max("height").alias("max_height"),
    )


MULTIMODAL_STATS_ORACLE = f"""
WITH feats AS ({MULTIMODAL_FEATURES_ORACLE})
SELECT CAST(width % 4 AS INT) AS width_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(height) AS INT) AS min_height,
       CAST(MAX(height) AS INT) AS max_height
FROM feats
GROUP BY 1"""


def register_all(register) -> None:
    register("multimodal_features", multimodal_features, MULTIMODAL_FEATURES_ORACLE)
    register(
        "multimodal_feature_stats", multimodal_feature_stats, MULTIMODAL_STATS_ORACLE
    )
    register(
        "multimodal_frame_sample",
        multimodal_frame_sample,
        MULTIMODAL_FRAME_SAMPLE_ORACLE,
    )
