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


# --- resize -----------------------------------------------------------------

RESIZE_PIXELS = 64  # target "image" size: 64 block-mean pixels per payload


def fake_resize(payload: bytes) -> list[int]:
    """Deterministic resize stand-in (decode stub, module docstring): the
    payload's byte stream downsampled to ``RESIZE_PIXELS`` block-mean
    pixels — the area-average (box-filter) resize every imaging library
    implements, on bytes instead of decoded pixels. Pixel = floor of the
    block's byte mean (exact integer arithmetic, oracle-replayable);
    blocks emptied by a short payload yield 0."""
    n = len(payload)
    out = []
    for k in range(RESIZE_PIXELS):
        lo, hi = (k * n) // RESIZE_PIXELS, ((k + 1) * n) // RESIZE_PIXELS
        out.append(sum(payload[lo:hi]) // (hi - lo) if hi > lo else 0)
    return out


def _extract_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, pos, px = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for k, v in enumerate(fake_resize(payload)):
                ids.append(doc_id)
                pos.append(k)
                px.append(v)
        yield pd.DataFrame({"doc_id": ids, "pos": pos, "pixel": px})


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESIZE face of the multimodal brief (decode / feature-extract /
    resize / frame-sample): every payload box-filtered to a fixed
    ``RESIZE_PIXELS``-pixel thumbnail, emitted at per-pixel grain
    (driver-hashable scalars, no array cells). The 1:64 expansion runs in
    the Arrow-batched ``mapInPandas`` decode stage — cardinality-changing
    like the frame sampler, payloads never shuffle (the expansion output
    is metadata-sized)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(
        _extract_resize, schema="doc_id bigint, pos int, pixel int"
    )


MULTIMODAL_RESIZE_ORACLE = f"""
WITH b AS ({_BYTES_CTE})
SELECT doc_id, CAST(k AS INT) AS pos,
    CAST(CASE WHEN ((k + 1) * CAST(n AS BIGINT)) // {RESIZE_PIXELS}
               > (k * CAST(n AS BIGINT)) // {RESIZE_PIXELS}
         THEN CAST(list_sum(list_transform(generate_series(
                  CAST((k * CAST(n AS BIGINT)) // {RESIZE_PIXELS} AS INT) + 1,
                  CAST(((k + 1) * CAST(n AS BIGINT)) // {RESIZE_PIXELS} AS INT)),
                  j -> bv[j])) AS BIGINT)
              // (((k + 1) * CAST(n AS BIGINT)) // {RESIZE_PIXELS}
                  - (k * CAST(n AS BIGINT)) // {RESIZE_PIXELS})
         ELSE 0 END AS INT) AS pixel
FROM b CROSS JOIN (
    SELECT unnest(generate_series(0, {RESIZE_PIXELS - 1})) AS k)
WHERE n IS NOT NULL"""


# --- perceptual-hash near-dup over binary payloads -------------------------

PHASH_BLOCKS = 32  # hash bits = payload byte-blocks compared to global mean
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BLOCKS // PHASH_BANDS
PHASH_HAMMING_MAX = 4  # near-dup when <= this many of 32 bits differ


def fake_phash(payload: bytes) -> int:
    """Deterministic perceptual-hash stand-in (the decode hook is stubbed,
    module docstring): bit ``i`` is set when byte-block ``i``'s mean
    exceeds the payload's global mean — the block-luminance structure of
    aHash/pHash on the byte dump instead of decoded pixels. The compare is
    the exact integer cross-multiplication ``block_sum * n > total *
    block_len``, so the oracle replays it without a float boundary."""
    n = len(payload)
    if n == 0:
        return 0
    total = sum(payload)
    h = 0
    for i in range(PHASH_BLOCKS):
        lo, hi = (i * n) // PHASH_BLOCKS, ((i + 1) * n) // PHASH_BLOCKS
        if hi > lo and sum(payload[lo:hi]) * n > total * (hi - lo):
            h |= 1 << i
    return h


def _extract_phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "phash": [fake_phash(p) for p in pdf["payload"]],
            }
        )


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate MEDIA detection: banded perceptual-hash candidates
    verified by Hamming distance — the image/video twin of the text
    SimHash pass (a crawl pipeline dedups re-encoded thumbnails and
    resized logos this way; FAISS/pHash stacks use the same
    band-then-verify shape). The hash itself runs in the Arrow-batched
    ``mapInPandas`` decode stage (Python IS the operator — swapping the
    stub for a real pHash changes one function); everything after is the
    proven banding machinery: ``PHASH_BANDS`` band keys per doc, a
    band-bucket self-join with one reused exchange, ``bit_count(xor)``
    verification. Candidate volume is bounded by band-bucket sizes, never
    all pairs."""
    # NULL-text docs have no payload to hash: excluded explicitly on BOTH
    # engines (the oracle's byte CTE yields NULL n for them) rather than
    # letting the kernel see a None payload
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    ph = payloads.mapInPandas(
        _extract_phash, schema="doc_id bigint, phash bigint"
    )
    bands = spark.range(PHASH_BANDS).select(F.col("id").cast("int").alias("band"))
    keyed = (
        ph.crossJoin(F.broadcast(bands))
        .select(
            "doc_id",
            "phash",
            "band",
            F.expr(
                f"shiftright(phash, band * {PHASH_BAND_BITS})"
                f" & {(1 << PHASH_BAND_BITS) - 1}"
            ).alias("band_key"),
        )
        .repartition("band", "band_key")  # identical exchange both sides
    )
    cand = (
        keyed.alias("x")
        .join(keyed.alias("y"), ["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.phash").alias("ph_a"),
            F.col("y.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming_distance")).filter(
        F.col("hamming_distance") <= PHASH_HAMMING_MAX
    )


MULTIMODAL_PHASH_ORACLE = f"""
WITH b AS ({_BYTES_CTE}),
ph AS (
    SELECT doc_id,
        CAST(CASE WHEN n = 0 THEN 0 ELSE (
            SELECT COALESCE(SUM(CASE
                WHEN ((i + 1) * CAST(n AS BIGINT)) // {PHASH_BLOCKS}
                     > (i * CAST(n AS BIGINT)) // {PHASH_BLOCKS}
                 AND CAST(list_sum(list_transform(generate_series(
                         CAST((i * CAST(n AS BIGINT)) // {PHASH_BLOCKS} AS INT) + 1,
                         CAST(((i + 1) * CAST(n AS BIGINT)) // {PHASH_BLOCKS} AS INT)),
                         j -> bv[j])) AS BIGINT) * n
                     > CAST(list_sum(bv) AS BIGINT)
                       * (((i + 1) * CAST(n AS BIGINT)) // {PHASH_BLOCKS}
                          - (i * CAST(n AS BIGINT)) // {PHASH_BLOCKS})
                THEN CAST(1 AS BIGINT) << i ELSE 0 END), 0)
            FROM (SELECT unnest(generate_series(0, {PHASH_BLOCKS - 1})) AS i)
        ) END AS BIGINT) AS phash
    FROM b WHERE n IS NOT NULL
),
keyed AS (
    SELECT doc_id, phash, band,
        (phash >> (band * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1}
            AS band_key
    FROM ph CROSS JOIN (
        SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band)
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           x.phash AS ph_a, y.phash AS ph_b
    FROM keyed x JOIN keyed y
      ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming_distance
FROM cand
WHERE bit_count(xor(ph_a, ph_b)) <= {PHASH_HAMMING_MAX}"""


N_MEDIA_QUERIES = 10  # doc_id < 10 are the query images (the ANN convention)
# Search radius: with 4 bands of 8 bits, any pair within Hamming distance
# PHASH_BANDS - 1 = 3 must leave at least one band untouched (pigeonhole),
# so the band-bucket candidate set is a PROVABLY EXACT cover at this
# radius — unlike the dedup pass's radius 4, where a 1-bit-per-band
# spread can slip the banding (accepted there: dedup is recall-tolerant,
# search-by-exemplar should not silently miss).
PHASH_SEARCH_MAX = PHASH_BANDS - 1


def multimodal_phash_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-by-media: every corpus item within Hamming distance
    ``PHASH_SEARCH_MAX`` of a query exemplar's perceptual hash — the
    reverse-image-search face of the pHash machinery (find re-encodes /
    crops of a given exemplar), completing dedup (all-pairs) with search
    (fixed query set). The exemplars are PERTURBED copies of the first
    ``N_MEDIA_QUERIES`` documents' payloads (first byte replaced — the
    planted-positive evaluation harness a retrieval stack ships with:
    measured Hamming 0-2 from their sources on this corpus, so every
    query has a guaranteed in-radius hit; an unperturbed query set found
    nothing within the exact radius here, which verifies banding but not
    retrieval). The tiny query side broadcasts onto the corpus' band
    buckets; only bucket-sharing candidates are verified with
    ``bit_count(xor)`` — and at this radius the banding is exact (see
    :data:`PHASH_SEARCH_MAX`), asserted against a brute-force Hamming
    scan in tests."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    ph = payloads.mapInPandas(
        _extract_phash, schema="doc_id bigint, phash bigint"
    )
    qdocs = docs.filter(F.col("doc_id") < N_MEDIA_QUERIES).select(
        "doc_id",
        F.encode(
            F.concat(F.lit("X"), F.expr("substring(text, 2)")), "utf-8"
        ).alias("payload"),
    )
    qph = qdocs.mapInPandas(
        _extract_phash, schema="doc_id bigint, phash bigint"
    )
    bands = spark.range(PHASH_BANDS).select(F.col("id").cast("int").alias("band"))

    def _keyed(frame: DataFrame) -> DataFrame:
        return frame.crossJoin(F.broadcast(bands)).select(
            "doc_id",
            "phash",
            "band",
            F.expr(
                f"shiftright(phash, band * {PHASH_BAND_BITS})"
                f" & {(1 << PHASH_BAND_BITS) - 1}"
            ).alias("band_key"),
        )

    keyed = _keyed(ph)
    qk = _keyed(qph).select(
        F.col("doc_id").alias("query_id"),
        F.col("phash").alias("qhash"),
        "band",
        "band_key",
    )
    cand = (
        F.broadcast(qk)
        .join(keyed, ["band", "band_key"])
        .select(
            "query_id", F.col("doc_id").alias("match_id"), "qhash", "phash"
        )
        .distinct()
    )
    ham = F.bit_count(F.col("qhash").bitwiseXOR(F.col("phash")))
    return cand.select(
        "query_id", "match_id", ham.alias("hamming_distance")
    ).filter(F.col("hamming_distance") <= PHASH_SEARCH_MAX)


def _phash_search_oracle() -> str:
    # reuse the dedup oracle's byte + phash CTEs verbatim for the corpus
    # side; the query side hashes the perturbed payloads through the same
    # phash expression over its own bytes CTE
    prologue = MULTIMODAL_PHASH_ORACLE.split("keyed AS (")[0]
    qbytes = _BYTES_CTE.replace(
        "hex(encode(text))", "hex(encode('X' || substr(text, 2)))"
    ).replace(
        "octet_length(encode(text))",
        "octet_length(encode('X' || substr(text, 2)))",
    )
    # the dedup prologue ends "...FROM b WHERE n IS NOT NULL\n)," — the
    # query-side twin re-runs the same ph SELECT against qb
    ph_body = prologue.split("ph AS (")[1].rsplit("\n),", 1)[0]
    return f"""{prologue}qb AS ({qbytes} WHERE doc_id < {N_MEDIA_QUERIES}),
qph AS ({ph_body.replace("FROM b WHERE", "FROM qb WHERE")}
),
keyed AS (
    SELECT doc_id, phash, band,
        (phash >> (band * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1}
            AS band_key
    FROM ph CROSS JOIN (
        SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band)
),
qkeyed AS (
    SELECT doc_id AS query_id, phash AS qhash, band,
        (phash >> (band * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1}
            AS band_key
    FROM qph CROSS JOIN (
        SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band)
),
cand AS (
    SELECT DISTINCT q.query_id, x.doc_id AS match_id,
           q.qhash, x.phash
    FROM qkeyed q JOIN keyed x
      ON q.band = x.band AND q.band_key = x.band_key
)
SELECT query_id, match_id,
       CAST(bit_count(xor(qhash, phash)) AS INT) AS hamming_distance
FROM cand
WHERE bit_count(xor(qhash, phash)) <= {PHASH_SEARCH_MAX}"""


def register_all(register) -> None:
    register(
        "multimodal_phash_search",
        multimodal_phash_search,
        _phash_search_oracle(),
    )
    register("multimodal_features", multimodal_features, MULTIMODAL_FEATURES_ORACLE)
    register(
        "multimodal_phash_dedup", multimodal_phash_dedup, MULTIMODAL_PHASH_ORACLE
    )
    register("multimodal_resize", multimodal_resize, MULTIMODAL_RESIZE_ORACLE)
    register(
        "multimodal_feature_stats", multimodal_feature_stats, MULTIMODAL_STATS_ORACLE
    )
    register(
        "multimodal_frame_sample",
        multimodal_frame_sample,
        MULTIMODAL_FRAME_SAMPLE_ORACLE,
    )
