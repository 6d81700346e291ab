"""Streaming SAX daily-grid maintenance — the symbolic-motif read
(evt_sax_motifs) kept continuously fresh over the event stream.

Grid-rewrite family (see streaming/grid_monitor.py for the shared
state/rounding/scale discipline): the state is the (group, day)
daily-sum grid, because late data changes a day's cents, which can
shift the per-group ntile quartile CUTS and therefore re-letter EVERY
day of the group — motif counts are not incrementally maintainable,
the grid is.  Unlike its siblings this monitor snapshots the GRID
itself (columns ``event_type, d, cents``);
``operators.timeseries.sax_motifs_from_daily`` turns any snapshot into
the batch query's exact top-k motifs (pytest-pinned in
tests/test_streaming_sax.py with every day's rows straddling
micro-batches, including the late-row quartile-reshift case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .grid_monitor import start_daily_cents_monitor

__all__ = ["stream_sax_daily_monitor"]


def stream_sax_daily_monitor(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Start the monitor: running (group, day) value sums over the
    stream; per micro-batch the sink overwrites ``out_path`` with the
    absorbed daily grid — column-identical to the batch query's daily
    frame over the same rows."""
    return start_daily_cents_monitor(
        stream_df,
        out_path,
        checkpoint_dir,
        lambda daily: daily.select(
            F.col(group_col).alias("event_type"), "d", "cents"
        ),
        group_col=group_col,
        ts_col=ts_col,
        value_col=value_col,
    )
