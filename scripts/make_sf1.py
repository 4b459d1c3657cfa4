"""Generate a synthetic sf1 dataset (10x sf0.1) for the scale rehearsal.

/root/testdata ships sf{0.001,0.01,0.1} only; the sf1 rehearsal
(SCALE.md "Measured scaling") needs 10x data with the SAME shape, so
this replicates every sf0.1 table 10 times with join-consistent key
offsets:

- fact/entity keys shift by k * OFFSET_<table> per replica k, applied
  consistently on both sides of every foreign key (orders.o_custkey
  moves with customer.c_custkey, lineitem with orders/part/supplier);
- offsets are multiples of the modulus constants the corpora derive
  from ids (doc_id % 10 planting, vec_id % 100 query set, vec_id % 50
  near-dup planting), so each replica contributes the same per-replica
  distribution the queries expect;
- dimensions (region, nation) are NOT replicated — at real scale
  dimension tables stay small, which is what keeps them broadcastable;
- tables are written as multi-file parquet directories so every scan
  parallelizes (a single file under maxPartitionBytes scans as ONE
  task — the pitfall documented in SCALE.md).

Usage: python scripts/make_sf1.py [dest_dir]   (default .localdata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
FILE_SIZE = 8_000_000  # ~8 MB parquet files => parallel scans

# per-table key offsets (multiples of 100 and 10 keep the id-modulus
# distributions aligned; all far below the 1M/2M planted-dup ranges)
OFF = {
    "customer": 1_000_000,
    "supplier": 1_000_000,
    "part": 1_000_000,
    "orders": 10_000_000,
    "events": 10_000_000,
    "documents": 100_000,
    "embeddings": 100_000,
}

REPL_SQL = {
    "customer": """
        SELECT c_custkey + {k} * {C} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM t
    """,
    "supplier": """
        SELECT s_suppkey + {k} * {S} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM t
    """,
    "part": """
        SELECT p_partkey + {k} * {P} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice FROM t
    """,
    "orders": """
        SELECT o_orderkey + {k} * {O} AS o_orderkey,
               o_custkey + {k} * {C} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM t
    """,
    "lineitem": """
        SELECT l_orderkey + {k} * {O} AS l_orderkey,
               l_partkey + {k} * {P} AS l_partkey,
               l_suppkey + {k} * {S} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM t
    """,
    "events": """
        SELECT event_id + {k} * {E} AS event_id, ts, user_id,
               event_type, value, props FROM t
    """,
    "documents": """
        SELECT doc_id + {k} * {D} AS doc_id, text, lang, source, n_chars
        FROM t
    """,
    "embeddings": """
        SELECT vec_id + {k} * {V} AS vec_id, embedding, label FROM t
    """,
}


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf1",
    )
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    subs = dict(
        C=OFF["customer"], S=OFF["supplier"], P=OFF["part"],
        O=OFF["orders"], E=OFF["events"], D=OFF["documents"],
        V=OFF["embeddings"],
    )
    for name in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{name}.parquet')) "
            f"TO '{dest}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"{name}: copied (dimension, not replicated)")
    for name, sql in REPL_SQL.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS "
            f"SELECT * FROM read_parquet('{SRC}/{name}.parquet')"
        )
        union = " UNION ALL ".join(
            sql.format(k=k, **subs) for k in range(REPLICAS)
        )
        out = f"{dest}/{name}.parquet"
        con.execute(
            f"COPY ({union}) TO '{out}' "
            f"(FORMAT PARQUET, FILE_SIZE_BYTES {FILE_SIZE})"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/*.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
