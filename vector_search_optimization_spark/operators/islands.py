"""Gaps-and-islands: consecutive-run detection (SURVEY §2.5 W6).

Reference: ``_get_prediction_ranges`` (ocr.py:47-59) turns a sequence like
["a","a","b","b","b","a"] into per-class inclusive ranges
{"a": [(0,1),(5,5)], "b": [(2,4)]}.

Classic lag + cumulative-sum island id, expressed as two window passes over
the same ordering (one shuffle on the partition key; unpartitioned input
runs as a single sorted stream — only correct for driver-bounded sequences,
so pass a partition column for anything large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def consecutive_runs(
    df: DataFrame,
    order_col: str,
    value_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse consecutive equal values into (value, start, end, run_len).

    ``start``/``end`` are the inclusive order_col bounds of each run,
    mirroring ocr.py's Range(start, end) semantics.
    """
    parts = partition_cols or []
    w = Window.partitionBy(*parts).orderBy(order_col)
    flagged = df.withColumn(
        "__new_run",
        F.when(
            F.lag(value_col).over(w).isNull()
            | (F.lag(value_col).over(w) != F.col(value_col)),
            1,
        ).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(*parts, value_col, "__island")
        .agg(
            F.min(order_col).alias("start"),
            F.max(order_col).alias("end"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .drop("__island")
    )
