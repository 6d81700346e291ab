"""Streaming tail-dependence maintenance — the evt_tail_dependence
batch query replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline), built directly on the r11 scaffold:
a folded exceedance-count state would be wrong twice over — late data
changes a day's cents, which moves BOTH pair thresholds (they are
order statistics of the shared-day grid), and a threshold move can
re-classify EVERY other day's exceedance flags.  Only the daily grid
is a valid incremental state; every micro-batch rewrites the pair
λ_U frame from the absorbed grid via the SHARED combine
(operators/timeseries.tail_dependence_from_daily), so
stream-after-absorbing-rows ≡ batch by construction.  Stream ≡ batch
pytest-pinned in tests/test_streaming_tail_dep.py (including a late
row that crosses a threshold and flips a joint-exceedance day).

Scale: state is |groups × days| rows — calendar-bounded; the
per-batch rewrite's pair frame is |groups|²/2 × days,
calendar²-bounded regardless of stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import tail_dependence_from_daily
from .grid_monitor import start_daily_cents_monitor

__all__ = ["stream_tail_dep_monitor"]


def stream_tail_dep_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the absorbed grid rounds to exact integer
    cents and the shared tail-dependence combine overwrites
    ``out_path`` with the latest per-pair λ_U frame — column-identical
    to the evt_tail_dependence batch export."""
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: tail_dependence_from_daily(daily, group_col=group_col),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
