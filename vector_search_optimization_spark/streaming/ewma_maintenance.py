"""Streaming EWMA-level maintenance — the evt_ewma_daily batch query
replayed continuously.

The batch EWMA is a function of the calendar-bounded DAILY GRID only,
so the stream maintains exactly that grid (a complete-mode
(group, day) → running value-sum aggregate in the state store) and
every micro-batch rewrites the per-group EWMA from the grid via the
SHARED combine (operators/timeseries.ewma_from_daily) — so
stream-after-absorbing-rows ≡ batch by construction. A naive
"fold the decayed numerator forward" state would be wrong here: a day
keeps receiving events across micro-batches (and late data), so the
per-day cents are not final until read time — only the grid is a valid
incremental state.

Rounding to exact cents happens in the SINK (on the absorbed grid),
never in the state fold — partial-batch roundings would not compose.

Scale notes (100 TB/day streams): state is |groups × days| rows —
calendar-bounded, independent of stream volume (the agg_maintenance
envelope); each micro-batch shuffles only its own map-side-combined
partials, and the EWMA rewrite touches the same tiny grid. For
unbounded retention, age out days older than the decay horizon
(α^d < ulp ⇒ d ≳ 330 at α=0.9) — dropping them changes nothing
representable in the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import ewma_from_daily

__all__ = ["stream_ewma_monitor"]


def stream_ewma_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    alpha: float = 0.9,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the absorbed grid rounds to exact integer
    cents and the shared EWMA combine overwrites ``out_path`` with the
    latest per-group (n_days, last_day_cents, ewma_cents) frame —
    column-identical to the evt_ewma_daily batch export."""
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
        ewma_from_daily(
            daily, alpha=alpha, group_col=group_col
        ).write.mode("overwrite").parquet(out_path)

    return (
        grid.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
