"""Sequence packing for pretraining mixtures (SURVEY.md §2.11 M12).

GPT-style concat-then-chunk packing: a stratum's documents are laid out
in deterministic (stratum, id) order, the running token offset assigns
each document a sequence number (``off div budget``) and an in-sequence
start (``off mod budget``); documents may straddle a chunk boundary,
exactly as concatenated pretraining token streams do.

Two physical forms with IDENTICAL output (pinned by the shared DuckDB
oracle and tests/test_mixture.py):

- ``pack_offsets_window`` — one window partitioned by the stratum.
  Right when strata are plentiful (lang × source × shard); each
  stratum's running sum is a sequential dependency BY DEFINITION, so
  the window's per-partition sort is the honest cost.
- ``pack_offsets_scalable`` — the giant-stratum path: range-partition
  by (stratum, id), per-partition subtotals to the driver (bounded by
  the PARTITION count, never rows), cumulate prefix offsets, broadcast
  them back, intra-partition running sums only. No single reducer ever
  sees a whole stratum; the widest shuffle is the range exchange.
  This is the classic two-pass distributed prefix-sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def pack_offsets_window(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
) -> DataFrame:
    """Per-stratum running offset → (seq_no, seq_off) via ONE window."""
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.withColumn(
        "off", F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    ).select(
        id_col,
        stratum_col,
        tok_col,
        F.floor(F.col("off") / budget).alias("seq_no"),
        (F.col("off") % budget).cast("long").alias("seq_off"),
    )


def pack_offsets_scalable(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-pass distributed prefix sum — identical output to
    ``pack_offsets_window`` without any per-stratum single reducer.

    Pass 1: ``repartitionByRange(stratum, id)`` makes partition order
    agree with the global (stratum, id) order, so a stratum's prefix at
    a partition boundary is the sum of its subtotals in lower-numbered
    partitions. The (partition × stratum) subtotal table is collected —
    bounded by partition COUNT × stratum count, never by rows (the same
    bounded-driver-state argument as the CC union-find threshold and
    the IVF training sample).

    Pass 2: the cumulated base offsets broadcast-join back, and the
    running sum runs in a window partitioned by (partition id, stratum)
    — every window partition is at most one range partition wide, so
    the sort parallelizes across the cluster.

    The frame is localCheckpoint-pinned between passes: partition ids
    must be OBSERVED once, not re-derived per branch (Spark re-executes
    lineage per action; a re-executed range exchange could legally place
    boundary ties differently).
    """
    n = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    d = (
        docs.repartitionByRange(n, stratum_col, id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    subtot = (
        d.groupBy("_pid", stratum_col)
        .agg(F.sum(tok_col).alias("_sub"))
        .collect()
    )
    base: dict[tuple, int] = {}
    run: dict = {}
    # NULL strata sort first (matching range-partition NULLS FIRST);
    # Python can't compare None to str, so key on (is-not-null, value).
    for row in sorted(
        subtot,
        key=lambda r: (
            r[stratum_col] is not None,
            r[stratum_col],
            r["_pid"],
        ),
    ):
        s = row[stratum_col]
        base[(row["_pid"], s)] = run.get(s, 0)
        run[s] = run.get(s, 0) + row["_sub"]
    # The stratum field keeps the INPUT's type (it was hardcoded string
    # pre-round-5, which broke non-string strata at createDataFrame);
    # the join is null-safe so the NULL stratum survives, matching
    # pack_offsets_window's window-partition semantics.
    base_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(p, s, o) for (p, s), o in base.items()],
            schema=StructType(
                [
                    StructField("_bpid", IntegerType()),
                    StructField("_bstr", docs.schema[stratum_col].dataType),
                    StructField("_base", LongType()),
                ]
            ),
        )
    )
    w = (
        Window.partitionBy("_pid", stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(
            base_df,
            (F.col("_pid") == F.col("_bpid"))
            & F.col(stratum_col).eqNullSafe(F.col("_bstr")),
        )
        .withColumn(
            "off",
            F.coalesce(F.sum(tok_col).over(w), F.lit(0)) + F.col("_base"),
        )
        .select(
            id_col,
            stratum_col,
            tok_col,
            F.floor(F.col("off") / budget).alias("seq_no"),
            (F.col("off") % budget).cast("long").alias("seq_off"),
        )
    )
