#!/usr/bin/env python
"""Regenerate the 100x extension corpus (.bench/sf10ext) — the SECOND
scaling decade for the BASELINE.md growth-class rows: 100x replicates the
sf0.1 tables the same way make_sf1ext.py builds 10x (replica word-suffix
so replicas share no shingles; embeddings shifted per rep; event ids
shifted). Two measured decades distinguish a genuinely sub-quadratic
kernel from one whose fixed costs merely hid a quadratic term at 10x.
Usage:  python scripts/make_sf10ext.py [src] [dst]
"""

import os
import sys

import duckdb

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
                                            w -> w || 'r' || rep), ' ') AS text,
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
