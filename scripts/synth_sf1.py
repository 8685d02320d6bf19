#!/usr/bin/env python
"""Deterministic sf1 corpus for the scale canary (round-4 verdict item 5).

The driver ships sf{0.001,0.01,0.1} under /root/testdata (read-only); each
10x step can flip AQE plans and float accumulation, so round 5 runs the
50-query window once more at sf1. This script derives sf1 from the
driver's own seed-42 sf0.1 tables by k-indexed deterministic replication
(k = 0..9) of the three tables the window actually queries:

- events (100k -> 1M): event_id' = event_id*10 + k keeps ids unique AND
  small — the engine's packed ordering key wraps seq at 2^21 per ms and
  the oracles pack ts_ms*1e6 + event_id, so ids must stay below 1e6
  (max here: 999,999; the first sf1 attempt used +k*1e8 offsets and the
  canary caught the tie-break divergence in every rate-family row); ts
  shifts by k*7919 ms (same ~31-day span, ~10x density); user_id + k
  rotates the ub buckets; value + k/100 keeps the <=2-decimal contract
  that makes 6-dp rounding exact-safe.
- documents (5k -> 50k): doc_id offset; one extra ' r<k>' word per copy so
  replicas are NEAR-duplicates (realistic for the dedup family — exact
  copies would put every doc in a 10-clone exact-dup group); n_chars
  recomputed.
- embeddings (2k -> 20k): vec_id offset; +k/1000 per component (stored
  back as float32) so replicas are near- but not exact-duplicate vectors;
  vec_id < n_centroids still selects the original 16 centroid rows.

The seven TPC-H tables are copied verbatim — no window query reads them;
they exist only so the canary can register all ten views.

Everything is a pure function of the source rows and k, so the corpus is
byte-reproducible; correctness does not depend on matching the driver's
generator distributions because the canary compares Spark vs DuckDB on
THIS corpus.

Usage: python scripts/synth_sf1.py [--out /root/repo/.sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil

SRC = "/root/testdata/sf0.1"

TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.sf1")
    args = ap.parse_args()
    import duckdb

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    con.execute(f"""
        COPY (
          SELECT e.event_id * 10 + k.k AS event_id,
                 e.ts + INTERVAL '1 millisecond' * (k.k * 7919) AS ts,
                 e.user_id + k.k AS user_id,
                 e.event_type,
                 e.value + k.k / 100.0 AS value,
                 e.props
          FROM read_parquet('{SRC}/events.parquet') e
          CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) k
          ORDER BY event_id
        ) TO '{args.out}/events.parquet' (FORMAT PARQUET)
    """)

    con.execute(f"""
        COPY (
          SELECT d.doc_id + k.k * 1000000 AS doc_id,
                 CASE WHEN k.k = 0 THEN d.text
                      ELSE d.text || ' r' || k.k END AS text,
                 d.lang, d.source,
                 CAST(length(CASE WHEN k.k = 0 THEN d.text
                                  ELSE d.text || ' r' || k.k END) AS BIGINT)
                   AS n_chars
          FROM read_parquet('{SRC}/documents.parquet') d
          CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) k
          ORDER BY doc_id
        ) TO '{args.out}/documents.parquet' (FORMAT PARQUET)
    """)

    con.execute(f"""
        COPY (
          SELECT e.vec_id + k.k * 1000000 AS vec_id,
                 CAST(list_transform(e.embedding,
                        x -> CAST(x + k.k / 1000.0 AS FLOAT)) AS FLOAT[])
                   AS embedding,
                 e.label
          FROM read_parquet('{SRC}/embeddings.parquet') e
          CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) k
          ORDER BY vec_id
        ) TO '{args.out}/embeddings.parquet' (FORMAT PARQUET)
    """)

    for t in TPCH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{args.out}/{t}.parquet")

    for t in ["events", "documents", "embeddings"] + TPCH:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
