"""Streaming seasonal-decomposition maintenance — evt_seasonal_decompose
replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline): a folded per-dow running state would
be wrong twice over — late data changes a day's cents AND its ±3
neighbors' centered-MA-7 trend values.  The per-batch rewrite is one
7-row window + two dow aggs over the calendar-bounded grid via the
SHARED combine (operators/timeseries.seasonal_from_daily); a
trailing-N-day variant drops older grid rows without touching the
fold.  Stream ≡ batch pytest-pinned in tests/test_streaming_seasonal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import seasonal_from_daily
from .grid_monitor import start_daily_cents_monitor

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
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: seasonal_from_daily(daily, group_col=group_col),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
