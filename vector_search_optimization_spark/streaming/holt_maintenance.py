"""Streaming Holt linear-trend maintenance — the evt_holt_linear batch
query replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline): folding the (level, trend) pair
forward per micro-batch would be wrong twice over — a day's cents are
not final until read time, and the recursion consumes days in order
while late data can append to PAST days.  Unlike the EWMA there is NO
decay horizon to age out against (every day moves the level through
the recursion), so unbounded retention keeps the full grid — still
state the size of a dimension table, not of the stream.  Stream ≡
batch pytest-pinned in tests/test_streaming_holt.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import holt_from_daily
from .grid_monitor import start_daily_cents_monitor

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
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: holt_from_daily(daily, group_col=group_col),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
