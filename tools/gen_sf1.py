#!/usr/bin/env python
"""Tile the driver's sf0.1 testdata 10x into a synthetic sf1 (~1M events,
50 symbols) for scale validation — the catalog reads only events/
documents/embeddings.  Each copy gets a distinct symbol suffix and an
id shift (so hash-derived bar features differ per copy); document texts
are kept verbatim across copies, which gives the dedup family a genuine
10-way duplicate population to chew on.

Usage: python tools/gen_sf1.py [outdir]   (default /root/repo/.scratch/sf1)
Then:  SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1 python bench.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10**9


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    parts = " UNION ALL ".join(
        f"SELECT event_id + {i * SHIFT} AS event_id, ts, user_id, "
        f"event_type || '{i}' AS event_type, value, props "
        f"FROM read_parquet('{SRC}/events.parquet')"
        for i in range(COPIES)
    )
    con.execute(f"COPY ({parts}) TO '{out}/events.parquet' (FORMAT PARQUET)")
    parts = " UNION ALL ".join(
        f"SELECT doc_id + {i * SHIFT} AS doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{SRC}/documents.parquet')"
        for i in range(COPIES)
    )
    con.execute(f"COPY ({parts}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    parts = " UNION ALL ".join(
        f"SELECT vec_id + {i * SHIFT} AS vec_id, embedding, label "
        f"FROM read_parquet('{SRC}/embeddings.parquet')"
        for i in range(COPIES)
    )
    con.execute(f"COPY ({parts}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    for t in ("customer", "lineitem", "nation", "orders", "part", "region", "supplier"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
