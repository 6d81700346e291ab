"""Continuously-maintained aggregate table (incremental materialized view).

The third streaming-maintenance pattern next to the live IVF index
(index_maintenance) and the curated drop-zone (curation): a per-key
aggregate TABLE in the lake — counts and sums per key — folded forward
by each micro-batch instead of recomputed from the full history.

Exactly-once fold: foreachBatch can REPLAY an epoch after a failure, and
an additive merge applied twice double-counts. The committed epoch id
travels INSIDE the table directory as an ``_epoch-N`` marker file (the
underscore prefix makes parquet readers ignore it), written into the
staging dir BEFORE the atomic swap — data and marker install together,
so a replayed epoch sees itself already committed and skips. This is the
standard idempotent-foreachBatch recipe expressed with files instead of
a transactional table format.

Scale notes (100 TB): each micro-batch shuffles only its own per-key
partials (combinable agg), then joins them against the aggregate table —
which is |distinct keys|-sized, not history-sized. The full-outer merge
rewrite is proportional to the KEY space; on Delta/Iceberg the same fold
is a MERGE INTO and only touched files rewrite. Readers always see a
complete table (atomic swap, sources.writers.commit_swap).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.writers import commit_swap


def committed_epoch(table_path: str) -> int:
    """Highest epoch folded into the table, -1 if none."""
    marks = glob.glob(os.path.join(table_path, "_epoch-*"))
    return max(
        (int(os.path.basename(m).split("-", 1)[1]) for m in marks), default=-1
    )


def fold_batch_into_counts(
    batch_df: DataFrame,
    epoch_id: int,
    table_path: str,
    group_col: str,
    value_col: str,
) -> bool:
    """Additively merge one micro-batch's (n, sum_value) per key into the
    aggregate table; returns False when the epoch was already committed
    (replay) and nothing was done."""
    if epoch_id <= committed_epoch(table_path):
        return False  # replayed epoch — the fold already happened
    spark = batch_df.sparkSession
    partial = batch_df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("sum_value")
    )
    staging = table_path.rstrip("/") + ".__staging__"
    if os.path.exists(table_path):
        base = spark.read.parquet(table_path)
        merged = (
            base.alias("b")
            .join(partial.alias("p"), group_col, "full_outer")
            .select(
                F.coalesce(F.col(f"b.{group_col}"), F.col(f"p.{group_col}")).alias(
                    group_col
                ),
                (
                    F.coalesce(F.col("b.n"), F.lit(0))
                    + F.coalesce(F.col("p.n"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("b.sum_value"), F.lit(0.0))
                    + F.coalesce(F.col("p.sum_value"), F.lit(0.0))
                ).alias("sum_value"),
            )
        )
        merged.write.mode("overwrite").parquet(staging)
        # marker rides in the staging dir: the swap installs data+epoch
        # atomically, so a crash can never commit one without the other
        open(os.path.join(staging, f"_epoch-{epoch_id}"), "w").write("ok")
        commit_swap(spark, staging, table_path)
    else:
        partial.write.mode("overwrite").parquet(table_path)
        open(os.path.join(table_path, f"_epoch-{epoch_id}"), "w").write("ok")
    return True


def stream_maintain_counts(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    group_col: str,
    value_col: str,
) -> StreamingQuery:
    """Keep a (key, n, sum_value) lake table current against a stream."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda batch_df, epoch_id: fold_batch_into_counts(
                batch_df, epoch_id, table_path, group_col, value_col
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )
