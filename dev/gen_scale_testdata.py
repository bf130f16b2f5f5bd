#!/usr/bin/env python3
"""Scale up the deterministic driver testdata for SCALING measurements.

The driver benches at sf0.1 (17 MB), where every stage is too small to
amortize 32-way scheduling — the r17 scaling block measured 8-vs-32-core
ratios of ~1 for every query, so plan-shape wins were unprovable at bench
scale (VERDICT r17, "what's wrong" #1). This script derives an sfN directory
from sf0.1 by replicating every fact table R times with disjoint key spaces,
so the 4x-core scaling pair can be measured on stages that actually cost
something. It is a MEASUREMENT tool: the driver's own bench/oracle contract
still runs on the untouched /root/testdata directories.

Replication design (all deterministic, seedless — pure key arithmetic):
 - every fact table's keys shift by a replica-specific offset chosen far
   above the sf0.1 key range AND above every in-query synthetic offset
   (crawl-refresh constructs ids at +500000/+700000; corpus_profile at
   +90000 — the 1e6 doc_id stride keeps each replica's synthetic space
   private);
 - FK families shift together (l_orderkey/o_orderkey, o_custkey/c_custkey,
   l_partkey/p_partkey, l_suppkey/s_suppkey), so joins stay consistent;
 - `documents.text` is perturbed per replica by inserting a replica-unique
   token after every 8 words: replicas are NOT near-duplicates of each
   other (a k-shingle window straddles a token ~k/8 of the time, dropping
   cross-replica Jaccard far below every near-dup threshold), so dedup
   selectivities stay realistic instead of collapsing 90% of the corpus
   into exact-duplicate clusters. Replica 0 is byte-identical to sf0.1.
   `n_chars` is recomputed over the perturbed text;
 - `embeddings.embedding` is rotated by the replica index (norm-preserving,
   cosine between rotations is ~random), so ANN/semantic-dedup neighbor
   structure does not degenerate into 10 identical copies per vector;
 - `events.ts` is kept as-is: a 10x corpus over the same wall-clock window
   is 10x event density per hour, which is how a bigger tenant actually
   looks to the windowed/streaming operators;
 - dimension tables (nation, region) are not replicated.

Usage: python3 dev/gen_scale_testdata.py [--src /root/testdata/sf0.1]
           [--out /root/scaledata/sf1] [--replicas 10]
"""
import argparse
import os

import duckdb

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/scaledata/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    R = args.replicas

    def gen(table: str, select_tpl: str) -> None:
        src = f"{args.src}/{table}.parquet"
        out = f"{args.out}/{table}.parquet"
        parts = [select_tpl.format(r=r, src=src) for r in range(R)]
        q = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({q}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")

    # fact tables: disjoint key spaces per replica, FK families in lockstep
    gen("documents", """
        SELECT doc_id + {r} * 1000000 AS doc_id,
               CASE WHEN {r} = 0 THEN text
                    ELSE regexp_replace(text, '((?:\\S+ ){{8}})',
                                        '\\1zq{r}x ', 'g') END AS text,
               lang, source,
               CASE WHEN {r} = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '((?:\\S+ ){{8}})',
                                               '\\1zq{r}x ', 'g'))
               END AS n_chars
        FROM '{src}'""")
    gen("embeddings", """
        SELECT vec_id + {r} * 1000000 AS vec_id,
               CASE WHEN {r} = 0 THEN embedding
                    ELSE CAST(embedding[1 + {r}:] || embedding[:{r}]
                              AS FLOAT[]) END AS embedding,
               label
        FROM '{src}'""")
    gen("events", """
        SELECT event_id + {r} * 10000000 AS event_id, ts,
               user_id + {r} * 1000000 AS user_id,
               event_type, value, props
        FROM '{src}'""")
    gen("customer", """
        SELECT c_custkey + {r} * 1000000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}'""")
    gen("orders", """
        SELECT o_orderkey + {r} * 10000000 AS o_orderkey,
               o_custkey + {r} * 1000000 AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}'""")
    gen("lineitem", """
        SELECT l_orderkey + {r} * 10000000 AS l_orderkey,
               l_partkey + {r} * 1000000 AS l_partkey,
               l_suppkey + {r} * 100000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}'""")
    gen("part", """
        SELECT p_partkey + {r} * 1000000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}'""")
    gen("supplier", """
        SELECT s_suppkey + {r} * 100000 AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}'""")
    # dimensions: copied once
    for table in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{table}.parquet') TO "
            f"'{args.out}/{table}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")
        print(f"{table}: copied")

if __name__ == "__main__":
    main()
