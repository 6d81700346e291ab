"""Streaming turning-point-test maintenance — the evt_turning_points
batch query replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state discipline), on the r11 scaffold — the family's COUNT-GRID
member (state is the (group, day) event-count grid, not a cents sum,
so this monitor builds its own grid and uses the generic
start_grid_rewrite_monitor rather than the cents specialization): a
folded turning-point tally would be wrong because late data changing
ONE day's count can flip the local-extremum status of BOTH its
neighbors (and a late day extends the zero-densified spine).  Every
micro-batch rewrites the per-group test from the absorbed grid via
the SHARED combine (operators/timeseries.turning_points_from_daily —
extracted from the batch query as plan-identity-verified code
motion), so stream-after-absorbing-rows ≡ batch by construction.
Stream ≡ batch pytest-pinned in tests/test_streaming_turning.py
(including a late row that flips a neighbor's extremum status).

Scale: state is |groups × days| rows — calendar-bounded; each
micro-batch shuffles only its own map-side-combined count partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import turning_points_from_daily
from .grid_monitor import start_grid_rewrite_monitor

__all__ = ["stream_turning_points_monitor"]


def stream_turning_points_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> StreamingQuery:
    """Start the monitor: running (group, day) event counts over the
    stream; per micro-batch the shared turning-points combine
    overwrites ``out_path`` with the latest per-group test frame —
    column-identical to the evt_turning_points batch export."""
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400.0)).cast(
        "long"
    )
    grid = (
        stream_df.select(F.col(group_col), day.alias("d"))
        .groupBy(group_col, "d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )

    def _snapshot(batch_df: DataFrame) -> DataFrame:
        return turning_points_from_daily(batch_df, group_col=group_col)

    return start_grid_rewrite_monitor(
        grid, out_path, checkpoint_dir, _snapshot
    )
