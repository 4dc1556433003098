"""Deterministic sf1 fixture generator (r3 VERDICT Next #4).

/root/testdata tops out at sf0.1 (16M feed events / 100k event rows /
600k lineitem rows). This script scales the sf0.1 parquet fixtures 10x
into an sf1 set so the FULL query/oracle contract can run an order of
magnitude above the largest driver-provided SF — closing the "oracle
evidence only at toy scale" gap.

Construction (pure DuckDB, no Spark, fully deterministic — every output
row is a function of (source row, copy index)):

- fact tables replicate ``--copies`` times with disjoint id offsets and
  consistent foreign keys (custkey/orderkey/partkey/suppkey all shift
  together, so every join keeps its selectivity);
- ``events.ts`` shifts by ``copy * 17s`` so (user_id, second) stays
  ~unique — otherwise the state-machine queries' dedup would collapse
  the copies right back to sf0.1;
- ``documents.text`` passes through a per-copy character-substitution
  ``translate`` (vowel/consonant/digit rotations on mixed-radix places,
  distinct for every copy < 250) so copies are real new documents
  (identical copies would make every doc a 10-member near-dup cluster
  and blow the pair-join oracles up quadratically);
- ``embeddings`` get a per-copy constant shift (+copy*0.002) so no two
  copies are cosine-identical (rank ties across engines are the one
  thing the top-k oracles cannot adjudicate);
- dimension tables (nation, region) copy once.

Usage: python tools/make_sf1.py [out_dir] [--copies N] [--src DIR]
"""

from __future__ import annotations

import argparse
import os

import duckdb

VOWELS = "aeiou"
CONSONANTS = "rstln"
DIGITS = "0123456789"


def _rot(s: str, i: int) -> str:
    return s[i % len(s):] + s[:i % len(s)]


def _sub(i: int) -> tuple[str, str]:
    """Per-copy character substitution, DISTINCT for every i < 250: the
    vowel rotation alone cycles every 5 copies (copies 5-9 would be
    byte-identical to 0-4 — every doc an exact duplicate, which is
    exactly what this transform exists to prevent), so the consonant and
    digit alphabets rotate on the higher mixed-radix places."""
    src = VOWELS + CONSONANTS + DIGITS
    dst = (_rot(VOWELS, i % 5) + _rot(CONSONANTS, (i // 5) % 5) +
           _rot(DIGITS, (i // 25) % 10))
    return src, dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/root/repo/testdata_sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    a = ap.parse_args()
    if a.copies > 250:
        raise SystemExit("--copies > 250 would repeat a substitution "
                         "(see _sub) and mint exact-duplicate documents")
    os.makedirs(a.out_dir, exist_ok=True)
    con = duckdb.connect()
    src, C = a.src, a.copies

    def write(name: str, union_sql: str) -> None:
        out = os.path.join(a.out_dir, f"{name}.parquet")
        con.execute(f"COPY ({union_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    def fan(per_copy_sql) -> str:
        return " UNION ALL ".join(per_copy_sql(i) for i in range(C))

    write("events", fan(lambda i: f"""
        SELECT event_id + {i} * 100000000 AS event_id,
               ts + INTERVAL ({i} * 17) SECOND AS ts,
               user_id, event_type, value, props
        FROM '{src}/events.parquet'"""))

    def _doc_sql(i: int) -> str:
        s, d = _sub(i)
        return f"""
        SELECT doc_id + {i} * 10000000 AS doc_id,
               translate(text, '{s}', '{d}') AS text,
               lang, source,
               CAST(length(translate(text, '{s}', '{d}')) AS BIGINT)
                   AS n_chars
        FROM '{src}/documents.parquet'"""

    write("documents", fan(_doc_sql))

    write("embeddings", fan(lambda i: f"""
        SELECT vec_id + {i} * 10000000 AS vec_id,
               CAST(list_transform(embedding,
                    x -> x + {i} * 0.002) AS FLOAT[]) AS embedding,
               label
        FROM '{src}/embeddings.parquet'"""))

    write("customer", fan(lambda i: f"""
        SELECT c_custkey + {i} * 1000000 AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet'"""))

    write("orders", fan(lambda i: f"""
        SELECT o_orderkey + {i} * 10000000 AS o_orderkey,
               o_custkey + {i} * 1000000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'"""))

    write("lineitem", fan(lambda i: f"""
        SELECT l_orderkey + {i} * 10000000 AS l_orderkey,
               l_partkey + {i} * 1000000 AS l_partkey,
               l_suppkey + {i} * 10000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'"""))

    write("part", fan(lambda i: f"""
        SELECT p_partkey + {i} * 1000000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}/part.parquet'"""))

    write("supplier", fan(lambda i: f"""
        SELECT s_suppkey + {i} * 10000 AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}/supplier.parquet'"""))

    for dim in ("nation", "region"):
        write(dim, f"SELECT * FROM '{src}/{dim}.parquet'")


if __name__ == "__main__":
    main()
