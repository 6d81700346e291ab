"""Time-series helpers shared by batch queries and their streaming
maintenance twins (the operators.drift pattern: ONE combine definition,
two execution paths)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ewma_from_daily"]


def ewma_from_daily(
    daily: DataFrame,
    alpha: float = 0.9,
    group_col: str = "event_type",
    day_col: str = "d",
    cents_col: str = "cents",
) -> DataFrame:
    """Normalized exponentially-weighted moving average at the series
    end from a (group, day, exact-integer cents) frame:

        EWMA = Σ xᵢ·α^(d_last−dᵢ) / Σ α^(d_last−dᵢ)

    The input is already the calendar-bounded daily grid, so this is
    |groups×days|-scale math wherever it runs — a batch query over the
    fact table's daily aggregate, or a per-micro-batch rewrite over a
    streaming-maintained grid (streaming/ewma_maintenance.py). pow() is
    not correctly-rounded IEEE and the weighted sums are order-
    dependent, so ewma_cents rounds at 6dp (irrational — tie-free);
    n_days and the last day's cents are exact integer anchors."""
    last = daily.groupBy(group_col).agg(F.max(day_col).alias("d_last"))
    wgt = daily.join(F.broadcast(last), group_col).select(
        group_col,
        cents_col,
        day_col,
        "d_last",
        F.pow(
            F.lit(alpha), (F.col("d_last") - F.col(day_col)).cast("double")
        ).alias("w"),
    )
    return (
        wgt.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max(
                F.when(F.col(day_col) == F.col("d_last"), F.col(cents_col))
            )
            .cast("long")
            .alias("last_day_cents"),
            F.round(
                F.sum(F.col(cents_col) * F.col("w")) / F.sum("w"), 6
            ).alias("ewma_cents"),
        )
        .orderBy(group_col)
    )
