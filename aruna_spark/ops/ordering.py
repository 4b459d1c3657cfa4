"""Total-order scan positions without an unpartitioned window.

Modeled keyspace scans (placement records, the document-sync outbox)
need a global position in composite-key order. A bare
``row_number().over(Window.orderBy(...))`` moves every row to one
partition — the exact anti-pattern ``scripts/window_audit.py`` exists
to flag. This helper is the two-level shape the pack plan uses
(``queries/sampling.py`` hierarchical prefix): a PARTITIONED
row_number for the local rank, plus per-partition row counts folded to
running offsets JVM-side (one metadata-sized array row, linear
``F.aggregate`` fold) and broadcast-joined back. Requires the
partition columns to be a PREFIX of the total sort key, so
``offset + local rank`` composes the total order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_scan_pos(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    out_col: str = "scan_pos",
) -> DataFrame:
    """Rank every row by (partition_cols, order_cols) — 1-based, like
    ``row_number`` — with no unpartitioned window at any level.

    ``partition_cols`` must name materialized columns (compute any
    coalesce/derivation first) and must sort, column-wise, exactly as
    the leading components of the intended total order.
    """
    pkeys = list(partition_cols)
    w = Window.partitionBy(*pkeys).orderBy(*order_cols)

    key_fields = lambda x: [  # noqa: E731 - tiny struct re-labeler
        x[f"k{i}"].alias(f"k{i}") for i in range(len(pkeys))
    ]
    totals = df.groupBy(*pkeys).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    packed = totals.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    *[F.col(c).alias(f"k{i}") for i, c in enumerate(pkeys)],
                    F.col("__n").alias("n"),
                )
            )
        ).alias("arr")
    )
    arr = F.col("arr")
    # empty array of the OUTPUT element type (keys + offset), derived
    # from arr so the helper stays generic over key column types
    empty = F.filter(
        F.transform(
            arr,
            lambda x: F.struct(
                *key_fields(x), F.lit(0).cast("long").alias("off")
            ),
        ),
        lambda _: F.lit(False),
    )
    fold = F.aggregate(
        arr,
        F.struct(F.lit(0).cast("long").alias("run"), empty.alias("out")),
        lambda acc, x: F.struct(
            (acc["run"] + x["n"]).alias("run"),
            F.array_append(
                acc["out"],
                F.struct(*key_fields(x), acc["run"].alias("off")),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    offsets = (
        packed.select(F.explode(fold).alias("e"))
        .select(
            *[F.col(f"e.k{i}").alias(c) for i, c in enumerate(pkeys)],
            F.col("e.off").alias("__off"),
        )
    )
    return (
        df.withColumn("__rn", F.row_number().over(w).cast("long"))
        .join(F.broadcast(offsets), pkeys)
        .withColumn(out_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__rn", "__off")
    )
