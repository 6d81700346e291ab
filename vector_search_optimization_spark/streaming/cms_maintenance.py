"""Streaming count-min sketch maintenance — the evt_cms_audit sketch
kept continuously fresh over the event stream.

Unlike the grid-rewrite monitors (runs/EWMA/Holt), the CMS state IS a
valid incremental fold: cells are pure additive counters and the sketch
of a union is the element-wise sum of the sketches (the mergeable-
sketch property operators/sketches.py documents). The stream therefore
maintains exactly the (i, bucket) → count aggregate; each micro-batch
the sink overwrites ``out_path`` with the absorbed cells frame —
column-identical to ``sketches.cms_cells`` over the same rows, so
stream-after-absorbing-rows ≡ batch by construction (pytest-pinned in
tests/test_streaming_cms.py).

Complete output mode is the right call here even though update mode
would also be sound for additive counters: the aggregate is a FIXED
d·w ≤ 1024 rows regardless of stream volume, and the sink needs the
whole sketch to write a readable point-query artifact (an update-mode
delta would lose unchanged cells on overwrite).

Scale notes (100 TB/day streams): state is ≤ d·w rows — constant; each
micro-batch shuffles only map-side-combined partial sketches (each
executor partial is itself a complete sketch). Point queries against
the maintained artifact are a broadcast join of the ≤1 KB cells frame
(sketches.cms_point_estimates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import cms_hash_rows

__all__ = ["stream_cms_monitor"]


def stream_cms_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
) -> StreamingQuery:
    """Start the monitor: running (i, bucket) cell counts over the
    stream; per micro-batch the sink overwrites ``out_path`` with the
    absorbed (i, bucket, cell) sketch."""
    cells = (
        stream_df.select(F.explode(cms_hash_rows(F.col(key_col))).alias("h"))
        .groupBy(F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cell"))
    )

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_path)

    return (
        cells.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
