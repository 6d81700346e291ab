"""Streaming EMD maintenance — the per-type value distributions behind
evt_type_emd kept continuously fresh over the event stream.

Like the CMS monitor (cms_maintenance.py), the state here is a pure
ADDITIVE fold: the (event_type, cents) count frame of a union is the
element-wise sum of the frames, so the stream maintains exactly the
aggregate the batch query starts from — no grid rewrite, no per-day
state. Each micro-batch the sink overwrites ``out_path`` with the
absorbed counts; ``operators.distribution.emd_pairs_from_counts`` then
turns ANY snapshot into the pairwise Wasserstein-1 distances, so
stream-after-absorbing-rows ≡ batch by construction (pytest-pinned in
tests/test_streaming_emd.py, with every type's rows straddling
micro-batches).

Complete output mode: the aggregate is DOMAIN-bounded (distinct cent
values of a 2-decimal bounded measure × |types| — ≤ ~280k rows for the
events table at any stream volume), and the sink needs the whole count
frame to produce a readable distribution artifact.

Scale notes (100 TB/day streams): per micro-batch the shuffle carries
only map-side-combined (type, cents) partials; state growth is bounded
by the value DOMAIN, not stream volume. Computing EMD on demand from
the artifact is the batch combine's constant-size grid pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["stream_emd_counts_monitor"]


def stream_emd_counts_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, cents) counts over the stream;
    per micro-batch the sink overwrites ``out_path`` with the absorbed
    count frame — column-identical to the batch query's starting
    aggregate over the same rows."""
    counts = (
        stream_df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("event_type"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_path)

    return (
        counts.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
