#!/usr/bin/env python
"""Regenerate the 100x extension corpus (.bench/sf10ext) — the SECOND
scaling decade for the BASELINE.md growth-class rows: 100x replicates the
sf0.1 tables the same way make_sf1ext.py builds 10x (replica word-suffix
so replicas share no shingles; embeddings shifted per rep; event ids
shifted). Two measured decades distinguish a genuinely sub-quadratic
kernel from one whose fixed costs merely hid a quadratic term at 10x.
The fixed BM25 query terms are EXEMPT from the replica suffix (r9
verdict #2): suffixing them made `search_bm25_topk` match zero documents
here, so its 100x number timed the pipeline, not the posting scan.
Leaving those 15 terms intact grows their posting lists 100x (honest
retrieval decade) while replicas still share no shingles in practice —
a shared shingle needs every word in the window to be a query term, and
adjacent words carry the suffix.

Usage:  python scripts/make_sf10ext.py [src] [dst]
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf10ext"
)
REPS = 100


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
             list_transform(embedding, x -> CAST(x + 0.0001 * rep AS FLOAT))
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
