"""Generate a local sf1 fixture (10x sf0.1) for volume-tier correctness
runs — round-5 VERDICT #5: thresholds, DECIMAL overflow headroom, rsd
bands, and LSH occupancy only get interesting at volume, and the sandbox
ships no sf1.  /root/testdata is read-only, so the fixture lands in
/root/repo/.localdata/sf1 (gitignored; ~170 MB).

Construction: deterministic 10x keyed replication of sf0.1 (no RNG — a
re-run is byte-identical), derived ONLY from the public fixture:

- fact tables (orders+lineitem, events, documents, embeddings) replicate
  with per-replica key offsets; order->lineitem keys offset together so
  referential integrity holds;
- dimensions (region nation customer supplier part) copy unchanged —
  fact density per dimension key grows 10x, which is exactly the
  stress (hot keys, wide groups) a volume run should add;
- documents: replica r>0 bijectively renames every token (suffix
  ``#r``).  A bijective rename preserves every within-replica Jaccard
  (near-dup structure scales linearly, like a corpus that grew 10x)
  while cross-replica token sets are disjoint (J=0) — so dedup outputs
  grow 10x instead of quadratically;
- embeddings: replica r rotates the 64 coordinates by 6*r positions —
  norms and within-replica cosines are EXACTLY preserved; cross-replica
  similarity decorrelates.  label keeps its cluster semantics.

Usage: python scripts/make_sf1.py [out_dir]   (default .localdata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
DIM = 64


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE OR REPLACE VIEW reps AS SELECT unnest(range({REPLICAS})) AS r")

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'"
        ).fetchone()[0]
        print(f"  {name}: {n} rows")

    for dim_table in ("region", "nation", "customer", "supplier", "part"):
        write(dim_table, f"SELECT * FROM '{SRC}/{dim_table}.parquet'")

    write(
        "orders",
        f"""
        SELECT o_orderkey + r * 150000 AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{SRC}/orders.parquet', reps
        """,
    )
    write(
        "lineitem",
        f"""
        SELECT l_orderkey + r * 150000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', reps
        """,
    )
    write(
        "events",
        f"""
        SELECT event_id + r * 100000 AS event_id,
               ts, user_id, event_type, value, props
        FROM '{SRC}/events.parquet', reps
        """,
    )
    # bijective per-replica token rename: every whitespace token gets a
    # '#r' suffix (replica 0 keeps the original text), so within-replica
    # Jaccard/shingle structure is preserved exactly and cross-replica
    # overlap is zero.  n_chars is recomputed to keep the fixture
    # invariant n_chars == length(text).
    write(
        "documents",
        f"""
        SELECT doc_id + r * 5000 AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1#' || r, 'g')
               END AS text,
               lang, source,
               length(CASE WHEN r = 0 THEN text
                           ELSE regexp_replace(text, '(\\S+)', '\\1#' || r, 'g')
                      END) AS n_chars
        FROM '{SRC}/documents.parquet', reps
        """,
    )
    # coordinate rotation by 6*r: within-replica dot products (hence
    # cosines, norms, and every ANN/cluster structure) are exactly
    # preserved; cross-replica pairs decorrelate.
    write(
        "embeddings",
        f"""
        SELECT vec_id + r * 2000 AS vec_id,
               CAST(embedding[(6 * r) % {DIM} + 1 :] ||
                    embedding[: (6 * r) % {DIM}] AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', reps
        """,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
