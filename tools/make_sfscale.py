#!/usr/bin/env python3
"""Build a k-times scaled copy of a testdata sf directory for the
scaling canary (BASELINE.md "sf-scaling" section).

Usage: python3 tools/make_sfscale.py [srcDir] [dstDir] [k] [mode]
Defaults: /root/testdata/sf0.1  target/sfscale  10  tilde

mode "alpha" (the tokenizer-lane canary variant) differs in two ways:
- word suffixes are alphabetic ('q' + letter(i)) instead of '~i', so
  the lanes that tokenize to lowercase-alphabetic words (BPE training,
  bigram-LM surprisal) see the scaled corpus too — cross-copy words
  are still distinct, so the dedup-structure replication argument is
  unchanged;
- lineitem is ALSO scaled k-fold with per-copy re-keyed part/supplier
  ids (k disjoint copies of the part↔supplier graph), so the PageRank
  workload grows k-fold instead of being byte-copied.
Default mode stays byte-identical to the original generator so the
previously recorded canary tables remain reproducible.

Scaling model (deliberately NOT naive concatenation):

- documents: k copies; copy i>0 re-keys doc_id (+ i*1_000_000, which is
  0 mod 20 so the decontamination holdout split replicates exactly) and
  suffixes EVERY word with the copy index. Cross-copy shingles then
  never match, so the corpus's within-copy duplicate structure is
  replicated k times — the dedup workload grows k-fold like a real
  bigger crawl, instead of every document gaining k exact clones
  (which would be a pathological all-pairs blob, not a scale test).
  n_chars is recomputed from the rewritten text.
- orders: k copies re-keying o_orderkey; the customer/nation/region
  dimensions stay fixed — facts grow, dimensions don't, as in a real
  warehouse.
- every other table is byte-copied unchanged.

mode "cust" (the rewrite-loop canary variant) ALSO scales customer
k-fold: copy i>0 re-keys c_custkey (+ i*OFFSET) and suffixes c_name
with '~i', so entity VALUES stay distinct across copies while the
tree STRUCTURE of every copy is identical — exactly the shape of a
bigger customer database. This is the input the rewrite() fixpoint
canary needs: rows grow k×, distinct structures don't, so a
structure-bounded epoch cost must stay ~flat while any per-row
quadratic term would blow up.

mode "emb" (the ANN-lane canary variant) ALSO scales embeddings
k-fold: copy i>0 re-keys vec_id (+ i*OFFSET) and shifts every
coordinate by i·1e-3, so the vector POPULATION genuinely grows (no
bit-identical clones — clone ties would make the top-k degenerate)
while query ids 0-9 stay the copy-0 originals. This is the input the
PQ/IVF canaries need: corpus scan and encode work grow k×, the model
(codebook/centroid count) doesn't.
"""
import os
import shutil
import sys

import duckdb

COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "lineitem", "embeddings"]
OFFSET = 1_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "target/sfscale"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "tilde"
    assert mode in ("tilde", "alpha", "cust", "emb"), mode
    if mode == "alpha":
        assert k <= 26, "alpha mode supports k <= 26"
        suffix = "w || 'q' || chr(97 + i::INT)"
    else:
        suffix = "w || '~' || i::VARCHAR"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    con.sql(f"""
      COPY (
        SELECT doc_id + i * {OFFSET} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE array_to_string(
                           list_transform(string_split(text, ' '),
                                          w -> {suffix}), ' ')
               END AS text,
               lang, source,
               length(CASE WHEN i = 0 THEN text
                    ELSE array_to_string(
                           list_transform(string_split(text, ' '),
                                          w -> {suffix}), ' ')
               END) AS n_chars
        FROM '{src}/documents.parquet'
        CROSS JOIN (SELECT unnest(range({k})) AS i)
        ORDER BY doc_id
      ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)

    con.sql(f"""
      COPY (
        SELECT o_orderkey + i * {OFFSET} AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{src}/orders.parquet'
        CROSS JOIN (SELECT unnest(range({k})) AS i)
        ORDER BY o_orderkey
      ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)

    # events: k copies as DISJOINT user populations (user_id and
    # event_id both re-keyed) with identical per-user temporal
    # structure — the session/as-of/range-join workload replicates
    # k-fold exactly, as a k× product with k× the users would
    con.sql(f"""
      COPY (
        SELECT event_id + i * {OFFSET} AS event_id,
               ts,
               user_id + i * {OFFSET} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet'
        CROSS JOIN (SELECT unnest(range({k})) AS i)
        ORDER BY event_id
      ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)

    copy_tables = list(COPY_TABLES)
    if mode == "cust":
        # k disjoint copies of the customer dimension: re-keyed PK,
        # per-copy-distinct c_name, identical structure. nation/region
        # stay fixed (real databases share dimensions).
        copy_tables.remove("customer")
        con.sql(f"""
          COPY (
            SELECT c_custkey + i * {OFFSET} AS c_custkey,
                   CASE WHEN i = 0 THEN c_name
                        ELSE c_name || '~' || i::VARCHAR END AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet'
            CROSS JOIN (SELECT unnest(range({k})) AS i)
            ORDER BY c_custkey
          ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
        """)
    if mode == "emb":
        # k disjoint vector copies: re-keyed vec_id, coordinates shifted
        # by i*1e-3 so no copy is a bit-clone of another (clone ties
        # would degenerate the top-k), queries 0-9 = copy-0 originals
        copy_tables.remove("embeddings")
        con.sql(f"""
          COPY (
            SELECT vec_id + i * {OFFSET} AS vec_id,
                   CAST(list_transform(embedding,
                        x -> CAST(x + i * 0.001 AS FLOAT)) AS FLOAT[]) AS embedding,
                   label
            FROM '{src}/embeddings.parquet'
            CROSS JOIN (SELECT unnest(range({k})) AS i)
            ORDER BY vec_id
          ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """)
    if mode == "alpha":
        # k disjoint copies of the part<->supplier graph (all three keys
        # re-keyed per copy), so graph lanes scale instead of byte-copying
        copy_tables.remove("lineitem")
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/lineitem.parquet'").fetchall()]
        rekeyed = ", ".join(
            f"{c} + i * {OFFSET} AS {c}"
            if c in ("l_orderkey", "l_partkey", "l_suppkey") else c
            for c in cols)
        con.sql(f"""
          COPY (
            SELECT {rekeyed}
            FROM '{src}/lineitem.parquet'
            CROSS JOIN (SELECT unnest(range({k})) AS i)
            ORDER BY l_orderkey
          ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """)

    for t in copy_tables:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    docs = con.sql(f"SELECT count(*), count(DISTINCT doc_id) FROM '{dst}/documents.parquet'").fetchone()
    orders = con.sql(f"SELECT count(*), count(DISTINCT o_orderkey) FROM '{dst}/orders.parquet'").fetchone()
    events = con.sql(f"SELECT count(*), count(DISTINCT event_id), count(DISTINCT user_id) FROM '{dst}/events.parquet'").fetchone()
    print(f"documents: {docs[0]} rows ({docs[1]} distinct ids)")
    print(f"orders:    {orders[0]} rows ({orders[1]} distinct ids)")
    print(f"events:    {events[0]} rows ({events[1]} distinct ids, {events[2]} users)")


if __name__ == "__main__":
    main()
