"""Streaming input-drift monitor — incremental PSI against a static
reference profile.

The batch PSI computation (operators.drift) replayed continuously: a
reference cohort's bucket profile is computed ONCE (batch), and the
event stream maintains a running (group, bucket) count via the
streaming state store; every micro-batch the tiny count frame joins the
static reference profile and the SHARED ``psi_from_counts`` combine
rewrites the latest per-group PSI scores. Batch and stream agree
exactly once the stream has absorbed the same rows
(tests/test_streaming_drift.py).

Scale notes (100 TB/day streams): state is (groups × buckets) rows —
constant, independent of stream volume; each micro-batch shuffles only
its own partial counts (map-side combined). The PSI rewrite touches a
frame of the same tiny size. The reference range ships as two literals
(the profile is static by definition; re-profiling is a new monitor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.drift import bucketize, psi_from_counts

__all__ = ["stream_psi_monitor"]


def stream_psi_monitor(
    stream_df: DataFrame,
    lo: float,
    hi: float,
    ref_counts: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    value_col: str = "value",
    num_buckets: int = 10,
) -> StreamingQuery:
    """Start the monitor: running bucket counts over the stream
    (complete-mode streaming aggregate — the state store holds the
    (group, bucket) frame), full-outer joined per micro-batch with the
    static reference profile so one-sided buckets keep their mass, PSI
    via the shared combine, latest scores overwritten at ``out_path``.

    ``lo``/``hi`` are the reference cohort's range (from
    operators.drift.reference_profile); ``ref_counts`` its
    (group, bucket, n_ref) frame.
    """
    bucketed = stream_df.select(
        F.col(group_col),
        bucketize(value_col, F.lit(float(lo)), F.lit(float(hi)), num_buckets).alias(
            "bucket"
        ),
    )
    counts = bucketed.groupBy(group_col, "bucket").count()

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        cur = batch_df.withColumnRenamed("count", "n_cur")
        joined = ref_counts.join(cur, [group_col, "bucket"], "full").select(
            F.col(group_col),
            F.col("bucket"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        psi_from_counts(joined, group_col).orderBy(group_col).write.mode(
            "overwrite"
        ).parquet(out_path)

    return (
        counts.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
