"""Streaming SPC (Shewhart individuals/MR chart) maintenance — the
evt_spc_individuals batch query replayed continuously.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline), on the r11 scaffold: a folded
(center, MR̄, violations) state would be wrong three times over — late
data on ONE old day changes its two ADJACENT moving ranges, moves the
center line, and the shifted ±2.66·MR̄ limits re-flag every day of the
group.  Only the daily grid is a valid incremental state; every
micro-batch rewrites the per-group chart from the absorbed grid via
the SHARED combine (operators/timeseries.spc_from_daily — extracted
from the batch query as plan-identity-verified code motion), so
stream-after-absorbing-rows ≡ batch by construction.  Stream ≡ batch
pytest-pinned in tests/test_streaming_spc.py (including a late spike
that re-flags a previously in-control day).

Scale: state is |groups × days| rows — calendar-bounded; the
per-batch rewrite is one spine densification + one lag window + two
tiny aggs over the same grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import spc_from_daily
from .grid_monitor import start_daily_cents_monitor

__all__ = ["stream_spc_monitor"]


def stream_spc_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the absorbed grid rounds to exact integer
    cents and the shared SPC combine overwrites ``out_path`` with the
    latest per-group (n_days, center, MR̄, UCL, LCL, n_violations)
    frame — column-identical to the evt_spc_individuals batch
    export."""
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: spc_from_daily(daily, group_col=group_col),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
