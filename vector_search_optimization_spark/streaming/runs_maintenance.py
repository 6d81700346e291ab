"""Streaming runs-test maintenance — the evt_runs_test batch query
replayed continuously.

Like the EWMA monitor (ewma_maintenance.py), the Wald-Wolfowitz
statistic is a function of the calendar-bounded DAILY GRID only, so the
stream maintains exactly that grid (a complete-mode (group, day) →
running value-sum aggregate) and every micro-batch rewrites the
per-group runs test from the absorbed grid via the SHARED combine
(operators/timeseries.runs_test_from_daily) — so
stream-after-absorbing-rows ≡ batch by construction. A folded
(last_sign, counters) state would be wrong twice over: a day's cents
are not final until read time (late data flips its sign), and the
MEDIAN the signs compare against moves with every new day — only the
grid is a valid incremental state.

Rounding to exact cents happens in the SINK (on the absorbed grid),
never in the state fold — partial-batch roundings would not compose.

Scale notes (100 TB/day streams): state is |groups × days| rows —
calendar-bounded, independent of stream volume; each micro-batch
shuffles only its own map-side-combined partials, and the runs rewrite
touches the same tiny grid (one percentile agg + one lag window over
it). Unbounded retention ages out with the analysis window the median
is defined over — a trailing-N-day variant drops older grid rows
without touching the fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import runs_test_from_daily

__all__ = ["stream_runs_monitor"]


def stream_runs_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the absorbed grid rounds to exact integer
    cents and the shared runs-test combine overwrites ``out_path``
    with the latest per-group (n_runs, n_above, n_below,
    expected_runs, z_stat) frame — column-identical to the
    evt_runs_test batch export."""
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
        runs_test_from_daily(daily, group_col=group_col).write.mode(
            "overwrite"
        ).parquet(out_path)

    return (
        grid.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
