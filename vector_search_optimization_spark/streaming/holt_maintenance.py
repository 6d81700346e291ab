"""Streaming Holt linear-trend maintenance — the evt_holt_linear batch
query replayed continuously.

Like the EWMA monitor (ewma_maintenance.py), the Holt level/trend is a
function of the calendar-bounded DAILY GRID only, so the stream
maintains exactly that grid (a complete-mode (group, day) → running
value-sum aggregate in the state store) and every micro-batch rewrites
the per-group smoothing from the grid via the SHARED combine
(operators/timeseries.holt_from_daily) — so
stream-after-absorbing-rows ≡ batch by construction. Folding the
(level, trend) pair forward per micro-batch would be wrong twice over:
a day keeps receiving events across micro-batches (its cents are not
final until read time), and the recursion consumes days in order while
late data can append to PAST days — only the grid is a valid
incremental state.

Rounding to exact cents happens in the SINK (on the absorbed grid),
never in the state fold — partial-batch roundings would not compose.

Scale notes (100 TB/day streams): state is |groups × days| rows —
calendar-bounded, independent of stream volume (the agg_maintenance
envelope); each micro-batch shuffles only its own map-side-combined
partials, and the Holt rewrite folds over the same tiny grid. Unlike
the EWMA there is NO decay horizon to age out against (every day moves
the level through the recursion), so unbounded retention keeps the
full grid — at |groups|×|calendar days| rows that is still state the
size of a dimension table, not of the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import holt_from_daily

__all__ = ["stream_holt_monitor"]


def stream_holt_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the absorbed grid rounds to exact integer
    cents and the shared Holt combine overwrites ``out_path`` with the
    latest per-group (n_days, level, trend, forecast, rmse) frame —
    column-identical to the evt_holt_linear batch export."""
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
        holt_from_daily(daily, group_col=group_col).write.mode(
            "overwrite"
        ).parquet(out_path)

    return (
        grid.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
