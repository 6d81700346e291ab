"""Streaming EWMA-level maintenance — the evt_ewma_daily batch query
replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline): a naive "fold the decayed numerator
forward" state would be wrong here because a day's cents are not final
until read time — only the daily grid is a valid incremental state.
The per-batch EWMA rewrite touches the calendar-bounded grid only.
For unbounded retention, age out days older than the decay horizon
(α^d < ulp ⇒ d ≳ 330 at α=0.9) — dropping them changes nothing
representable in the result.  Stream ≡ batch pytest-pinned in
tests/test_streaming_ewma.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import ewma_from_daily
from .grid_monitor import start_daily_cents_monitor

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
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: ewma_from_daily(
            daily, alpha=alpha, group_col=group_col
        ),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
