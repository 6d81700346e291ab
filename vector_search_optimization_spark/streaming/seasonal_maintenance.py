"""Streaming seasonal-decomposition maintenance — evt_seasonal_decompose
replayed continuously.

Like the runs/EWMA/Holt monitors, the dow seasonal component is a
function of the calendar-bounded DAILY GRID only (the centered MA-7
trend consumes a day's ±3 neighbors, so a folded per-dow running state
would be wrong twice over: late data changes a day's cents AND its
neighbors' trend values). The stream therefore maintains exactly that
grid (a complete-mode (group, day) → running value-sum aggregate) and
every micro-batch rewrites the per-(group, dow) decomposition from the
absorbed grid via the SHARED combine
(operators/timeseries.seasonal_from_daily) — stream-after-absorbing-rows
≡ batch by construction (pytest-pinned in tests/test_streaming_seasonal.py).

Rounding to exact cents happens in the SINK (on the absorbed grid),
never in the state fold — partial-batch roundings would not compose.

Scale notes (100 TB/day streams): state is |groups × days| rows —
calendar-bounded, independent of stream volume; the per-batch rewrite
touches the same tiny grid (one 7-row window + two dow aggs over it).
A trailing-N-day variant drops older grid rows without touching the
fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import seasonal_from_daily

__all__ = ["stream_seasonal_monitor"]


def stream_seasonal_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the absorbed grid rounds to exact integer
    cents and the shared seasonal combine overwrites ``out_path`` with
    the latest per-(group, dow) decomposition — column-identical to
    the evt_seasonal_decompose batch export."""
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400.0)).cast(
        "long"
    )
    grid = (
        stream_df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col), day.alias("d"), F.col(value_col))
        .groupBy(group_col, "d")
        .agg(F.sum(value_col).alias("_vsum"))
    )

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        daily = batch_df.select(
            group_col,
            "d",
            F.round(F.col("_vsum") * 100).cast("long").alias("cents"),
        )
        seasonal_from_daily(daily, group_col=group_col).write.mode(
            "overwrite"
        ).parquet(out_path)

    return (
        grid.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
