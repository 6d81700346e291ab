"""Streaming SAX daily-grid maintenance — the symbolic-motif read
(evt_sax_motifs) kept continuously fresh over the event stream.

This is a GRID-REWRITE monitor (the seasonal/drawdown family), NOT an
additive fold like CMS/EMD: the state is the (group, day) daily-sum
grid, because late data changes a day's cents, which can shift the
per-group ntile quartile CUTS and therefore re-letter EVERY day of the
group — motif counts are not incrementally maintainable, the grid is.
Each micro-batch the sink overwrites ``out_path`` with the absorbed
grid (cents rounded in the sink — the seasonal_maintenance discipline:
the running aggregate keeps the raw double sum, the exact-cents
projection happens once per snapshot);
``operators.timeseries.sax_motifs_from_daily`` then turns any snapshot
into the batch query's exact top-k motifs (pytest-pinned in
tests/test_streaming_sax.py with every day's rows straddling
micro-batches).

Complete output mode: the aggregate is CALENDAR-bounded (|groups| ×
days), constant-size at any stream volume; per micro-batch the shuffle
carries map-side-combined (group, day) partials only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["stream_sax_daily_monitor"]


def stream_sax_daily_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the sink overwrites ``out_path`` with the
    absorbed daily grid — column-identical to the batch query's daily
    frame over the same rows."""
    day = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400.0))
    ).cast("long")
    daily = (
        stream_df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("event_type"), day.alias("d"))
        .agg(F.sum(value_col).alias("vsum"))
    )

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        batch_df.select(
            "event_type",
            "d",
            F.round(F.col("vsum") * 100).cast("long").alias("cents"),
        ).write.mode("overwrite").parquet(out_path)

    return (
        daily.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
