"""Streaming isotonic-fit maintenance — the evt_isotonic_daily batch
query replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline), on the r11 scaffold: PAVA blocks are
the least incrementally-maintainable state of the whole family — a
late row raising ONE old day's cents can violate monotonicity against
its successor and trigger a pool-adjacent merge CASCADE that rewrites
every downstream block (and vice versa: a raise can also SPLIT a
previously pooled run by lifting its left edge).  Only the daily grid
is a valid incremental state; every micro-batch rewrites the per-group
block frame from the absorbed grid via the SHARED exact-integer PAVA
combine (operators/timeseries.isotonic_blocks), so
stream-after-absorbing-rows ≡ batch by construction.  Stream ≡ batch
pytest-pinned in tests/test_streaming_isotonic.py (including a late
row that collapses two blocks into one pooled block).

Scale: state is |groups × days| rows — calendar-bounded; the per-batch
PAVA rewrite is an applyInPandas over the same tiny grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import isotonic_blocks
from .grid_monitor import start_daily_cents_monitor

__all__ = ["stream_isotonic_monitor"]


def stream_isotonic_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the absorbed grid rounds to exact integer
    cents and the shared PAVA combine overwrites ``out_path`` with the
    latest per-group monotone block frame — column-identical to the
    evt_isotonic_daily batch export."""
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: isotonic_blocks(daily, group_col=group_col),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
