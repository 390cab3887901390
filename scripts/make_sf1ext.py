#!/usr/bin/env python
"""Regenerate the 10x extension-corpus used by the BASELINE.md scaling runs.

Synthesizes .bench/sf1ext from the sf0.1 tables (BASELINE.md "Extension-corpus
scaling run"): documents get a replica word-suffix so replicas share no
shingles (no artificial cross-replica near-dups), embeddings shift by
0.001*rep, events shift ids.

The fixed BM25 query terms are EXEMPT from the suffix (r9 verdict #2):
suffixing them made `search_bm25_topk` match zero documents on the scaled
corpora, so its scaling rows timed the pipeline instead of the posting
scan. Leaving just those 15 terms intact grows their posting lists with
the corpus (honest retrieval decades) while replicas still share no
shingles in practice — a shared shingle needs EVERY word in the window to
be a query term, and adjacent words are suffixed.

Usage:  python scripts/make_sf1ext.py [src] [dst]
"""

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_incremental_lakehouse_spark.llmdata.corpusstats import BM25_QUERIES  # noqa: E402

_KEEP = sorted({t for q in BM25_QUERIES.values() for t in q.split()})
_KEEP_SQL = ", ".join(f"'{t}'" for t in _KEEP)

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf1ext"
)
REPS = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({REPS})) AS rep)"
    con.execute(f"""
    COPY (
      SELECT (rep * 1000000 + doc_id) AS doc_id,
             array_to_string(list_transform(string_split(text, ' '),
                 w -> CASE WHEN w IN ({_KEEP_SQL}) THEN w
                           ELSE w || 'r' || rep END), ' ') AS text,
             lang, source, n_chars
      FROM read_parquet('{SRC}/documents.parquet'), {rep}
    ) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT (rep * 1000000 + vec_id) AS vec_id,
             list_transform(embedding, x -> CAST(x + 0.001 * rep AS FLOAT))
                 AS embedding,
             label
      FROM read_parquet('{SRC}/embeddings.parquet'), {rep}
    ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT (rep * 10000000 + event_id) AS event_id, ts,
             (rep * 1000000 + user_id) AS user_id, event_type, value, props
      FROM read_parquet('{SRC}/events.parquet'), {rep}
    ) TO '{DST}/events.parquet' (FORMAT PARQUET)""")
    for t in ("documents", "embeddings", "events"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
