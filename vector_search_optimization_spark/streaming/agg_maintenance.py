"""Continuously-maintained aggregate table (incremental materialized view).

The third streaming-maintenance pattern next to the live IVF index
(index_maintenance) and the curated drop-zone (curation): a per-key
aggregate TABLE — counts and sums per key — folded forward by each
micro-batch instead of recomputed from the full history.

Exactly-once fold: foreachBatch can REPLAY an epoch after a failure, and
an additive merge applied twice double-counts. The committed epoch id
travels INSIDE the table directory as an ``_epoch-{scope}-N`` marker
file (the underscore prefix makes parquet readers ignore it), written
into the staging dir BEFORE the atomic swap — data and marker install
together on BOTH the initial and the merge path, so a replayed epoch
sees itself already committed and skips. The ``scope`` is derived from
the checkpoint location: an aggregate table is bound to ONE query
lineage, and a stream started with a different/reset checkpoint (whose
source re-reads history and whose epoch ids restart at 0) is REFUSED
with an error instead of silently double-counting or dropping batches.
A crash between the swap's two renames is recovered at the next fold
(the intact previous table is restored from ``.__old__``).

Local-filesystem paths only (like compact_ivf_cells): the marker and
recovery protocol uses os/glob. At lake scale this exact fold is a
Delta/Iceberg MERGE INTO + the txn log's batchId dedup — the table
format owns atomicity there, so the file protocol is deliberately not
generalized to hdfs://s3a:// (NotImplementedError instead of subtle
wrong-FS behavior).

Scale notes (100 TB): each micro-batch shuffles only its own per-key
partials (combinable agg), then joins them against the aggregate table —
which is |distinct keys|-sized, not history-sized. The full-outer merge
rewrite is proportional to the KEY space.
"""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.writers import commit_swap


def _require_local(table_path: str) -> None:
    if "://" in table_path:
        raise NotImplementedError(
            "agg_maintenance's marker/recovery protocol is local-filesystem "
            "only; on a lake store use a table format (Delta/Iceberg MERGE "
            "INTO owns the atomicity this module hand-rolls)"
        )


def _scope_tag(checkpoint: str) -> str:
    """The query-lineage tag binding a table to one checkpoint."""
    return hashlib.sha256(checkpoint.encode()).hexdigest()[:8]


def _marker_scopes(table_path: str) -> set[str]:
    return {
        os.path.basename(m).split("-")[1]
        for m in glob.glob(os.path.join(table_path, "_epoch-*-*"))
    }


def committed_epoch(table_path: str, scope: str = "default") -> int:
    """Highest epoch folded into the table under this scope, -1 if none."""
    marks = glob.glob(os.path.join(table_path, f"_epoch-{scope}-*"))
    return max(
        (int(os.path.basename(m).rsplit("-", 1)[1]) for m in marks), default=-1
    )


def recover_interrupted_swap(table_path: str) -> bool:
    """A crash between commit_swap's two renames leaves the table absent
    and the previous state under .__old__ — restore it (os.rename is
    atomic) so the replayed epoch merges into history instead of
    silently re-initializing from one batch."""
    old = table_path.rstrip("/") + ".__old__"
    if not os.path.exists(table_path) and os.path.exists(old):
        os.rename(old, table_path)
        return True
    return False


def fold_batch_into_counts(
    batch_df: DataFrame,
    epoch_id: int,
    table_path: str,
    group_col: str,
    value_col: str,
    scope: str = "default",
) -> bool:
    """Additively merge one micro-batch's (n, sum_value) per key into the
    aggregate table; returns False when the epoch was already committed
    (replay) and nothing was done. Raises if the table belongs to a
    different query lineage (see module docstring)."""
    _require_local(table_path)
    recover_interrupted_swap(table_path)
    seen = _marker_scopes(table_path)
    if seen and scope not in seen:
        raise ValueError(
            f"aggregate table {table_path} was built by a different "
            "query/checkpoint lineage — reset the table together with the "
            "checkpoint, or keep the original checkpoint"
        )
    if epoch_id <= committed_epoch(table_path, scope):
        return False  # replayed epoch — the fold already happened
    spark = batch_df.sparkSession
    # sums cast to double in BOTH branches so the table schema never
    # drifts between the initial epoch and merged epochs
    partial = batch_df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).cast("double").alias("sum_value"),
    )
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
                ).cast("double").alias("sum_value"),
            )
        )
    else:
        merged = partial
    # ONE path for both branches: stage data + marker, then install
    # atomically (commit_swap tolerates a missing base on first epoch)
    staging = table_path.rstrip("/") + ".__staging__"
    merged.write.mode("overwrite").parquet(staging)
    open(os.path.join(staging, f"_epoch-{scope}-{epoch_id}"), "w").write("ok")
    commit_swap(spark, staging, table_path, require_base=False)
    return True


def stream_maintain_counts(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    group_col: str,
    value_col: str,
) -> StreamingQuery:
    """Keep a (key, n, sum_value) lake table current against a stream.
    The table is scope-bound to ``checkpoint`` (see module docstring)."""
    _require_local(table_path)
    scope = _scope_tag(checkpoint)
    return (
        stream_df.writeStream.foreachBatch(
            lambda batch_df, epoch_id: fold_batch_into_counts(
                batch_df, epoch_id, table_path, group_col, value_col, scope=scope
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )
