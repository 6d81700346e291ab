"""Streaming runs-test maintenance — the evt_runs_test batch query
replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline): a folded (last_sign, counters) state
would be wrong twice over — late data flips a past day's sign, and the
MEDIAN the signs compare against moves with every new day.  The
per-batch rewrite is one percentile agg + one lag window over the
calendar-bounded grid; a trailing-N-day variant drops older grid rows
without touching the fold.  Stream ≡ batch pytest-pinned in
tests/test_streaming_runs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import runs_test_from_daily
from .grid_monitor import start_daily_cents_monitor

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
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: runs_test_from_daily(daily, group_col=group_col),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
