"""Generate the selective sf10 slice (text + embedding tables only).

VERDICT r9 Next #3: the 100 TB scaling claims rested on ONE measured
decade (sf0.1 → sf1); this extends the corpus-shaped tables one more
decade so the ``_scaled`` dedup/similarity siblings, the retention
funnel, and the text sweeps measure across sf0.1 → sf1 → sf10
(scripts/bench_decade.py → BENCH_DECADE.json, SCALE.md table).

Only ``documents`` and ``embeddings`` replicate — the decade bench's
query set reads nothing else, and the relational tables' scaling story
is already carried by the full-registry sf1 rehearsal. Offsets are
multiples of every id-modulus the corpora derive from (10 planting,
100 query set, 50 near-dup planting — same rule as make_sf1.py), so
each replica contributes the same per-replica distribution.

Usage: python scripts/make_sf10.py [src_sf1_dir] [dest_dir]
       (defaults .localdata/sf1 -> .localdata/sf10)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = 10
FILE_SIZE = 16_000_000  # ~16 MB parquet files => parallel scans
OFFSET = 1_000_000  # > max sf1 id (~950k), multiple of 10/50/100

REPL_SQL = {
    "documents": (
        "SELECT doc_id + {k} * {off} AS doc_id, text, lang, source,"
        " n_chars FROM t"
    ),
    "embeddings": (
        "SELECT vec_id + {k} * {off} AS vec_id, embedding, label FROM t"
    ),
}


def main() -> None:
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        base, ".localdata", "sf1"
    )
    dest = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        base, ".localdata", "sf10"
    )
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for name, sql in REPL_SQL.items():
        con.execute(
            "CREATE OR REPLACE VIEW t AS SELECT * FROM "
            f"read_parquet('{src}/{name}.parquet/*.parquet')"
        )
        union = " UNION ALL ".join(
            sql.format(k=k, off=OFFSET) for k in range(REPLICAS)
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
