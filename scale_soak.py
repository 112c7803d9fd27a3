#!/usr/bin/env python
"""Scale-soak data generator (VERDICT r3 item #4).

The 100 TB claims in SCALE.md are argued from physical plans; this script
provides the one medium-scale *measurement* that sanity-checks them: it
grows the sf0.1 testdata 5x (to "sf0.5") by replicating the FACT tables
with key offsets while keeping the dimension tables fixed — exactly how
real warehouses scale (facts grow, dims don't) — then the widened bench
runs at both scales and SCALE.md records the wall-time ratios.

Growth rules (deterministic, no RNG):
  - lineitem / orders: o_orderkey offset by replica * (max+1); the
    orders<->lineitem FK stays consistent so join cardinalities scale
    linearly.  Dim FKs (custkey/partkey/suppkey) are unchanged: each dim
    key now has 5x the fact rows — deeper groups, same group count.
  - events: event_id offset; user_id/ts unchanged — 5x denser sessions
    and windows per user, the worst case for per-key window state.
  - documents: doc_id offset; replicas > 0 get a short suffix appended to
    the text so every document gains 4 NEAR-duplicates — a deliberate
    hot-bucket stress for the LSH/simhash/ngram dedup family (the r4
    bucket-occupancy cap exists exactly for this shape).
  - embeddings: vec_id offset, vectors unchanged (exact-dup vectors are
    legal and stress the ANN bucket joins).

Usage: python scale_soak.py [out_dir]   (default /tmp/anglerfish_sf0.5)
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "5"))

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    import duckdb

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/anglerfish_sf0.5"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"'{SRC}/{t}.parquet'"

    for t in DIMS:
        con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    # fact replication: UNION ALL of offset copies, written once each.
    # generate_series cross-join keeps it a single streaming scan per table.
    (max_ok,) = con.execute(f"SELECT max(o_orderkey) + 1 FROM {src('orders')}").fetchone()
    (max_ev,) = con.execute(f"SELECT max(event_id) + 1 FROM {src('events')}").fetchone()
    (max_doc,) = con.execute(f"SELECT max(doc_id) + 1 FROM {src('documents')}").fetchone()
    (max_vec,) = con.execute(f"SELECT max(vec_id) + 1 FROM {src('embeddings')}").fetchone()

    con.execute(
        f"""COPY (
        SELECT o_orderkey + r.g * {max_ok} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, generate_series(0, {REPLICAS - 1}) r(g)
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT l_orderkey + r.g * {max_ok} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, generate_series(0, {REPLICAS - 1}) r(g)
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT event_id + r.g * {max_ev} AS event_id, ts, user_id,
               event_type, value, props
        FROM {src('events')}, generate_series(0, {REPLICAS - 1}) r(g)
        ) TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT doc_id + r.g * {max_doc} AS doc_id,
               CASE WHEN r.g = 0 THEN text
                    ELSE text || ' r' || CAST(r.g AS VARCHAR) END AS text,
               lang, source,
               CASE WHEN r.g = 0 THEN n_chars
                    ELSE n_chars + 2 + length(CAST(r.g AS VARCHAR)) END AS n_chars
        FROM {src('documents')}, generate_series(0, {REPLICAS - 1}) r(g)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT vec_id + r.g * {max_vec} AS vec_id, embedding, label
        FROM {src('embeddings')}, generate_series(0, {REPLICAS - 1}) r(g)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"""
    )

    for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
        (n,) = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()
        print(f"{t}: {n}")
    print(f"wrote {out} (replicas={REPLICAS}, source={SRC})")


if __name__ == "__main__":
    main()
