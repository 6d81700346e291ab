"""Concentration/inequality statistics — the grouped-aggregate pandas
UDF surface (Series → scalar UDAF), the one pandas-UDF flavor the rest
of the engine didn't already exercise (scalar pandas UDFs, mapInPandas,
applyInPandas, applyInPandasWithState, a Python UDTF and a Python
DataSource all exist elsewhere).

The statistic: the Gini coefficient of per-contributor activity — the
standard concentration audit for training corpora ("is this source 90%
one crawler?") and product analytics ("how top-heavy is usage?").

Cross-engine discipline: with x sorted ascending and 1-based index i,
    G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x),
so the NUMERATOR is an exact integer for integer activity counts — the
UDAF returns it as a long, and the float G derives by one shared IEEE
division outside the UDF. Ties in x permute equal values across
adjacent i, leaving Σ i·x_i unchanged, so any tie order (numpy sort
here, a (cnt, key) row_number in the DuckDB oracle) yields the same
integer.

Scale notes (100 TB): Spark evaluates grouped-agg pandas UDFs with a
full shuffle of the (group, value) rows — here the input is the
already-aggregated per-(group, contributor) count table, |contributors|
rows, not raw events. Groups whose contributor lists exceed executor
memory should pre-bucket contributors and combine Gini over buckets
approximately — at that point switch to the sorted-cumulative SQL
formulation (the oracle's shape), which is one window over the same
table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (module-level import: pandas_udf contract)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@F.pandas_udf("long")
def gini_numerator(counts: pd.Series) -> int:
    """Grouped-agg UDAF: 2·Σ i·x_(i) − (n+1)·Σ x over the group's values
    (x sorted ascending, i 1-based) — the exact-integer Gini numerator.

    The sums run in arbitrary-precision Python ints (not numpy int64,
    which wraps silently on overflow) and an out-of-long result raises
    loudly — matching the ANSI-checked integer discipline used
    everywhere else in the engine."""
    x = np.sort(counts.to_numpy(np.int64))
    n = len(x)
    weighted = sum(i * int(v) for i, v in enumerate(x, start=1))
    total = sum(int(v) for v in x)
    num = 2 * weighted - (n + 1) * total
    if not (-(2**63) <= num < 2**63):
        raise OverflowError(
            f"gini numerator {num} exceeds BIGINT range (n={n})"
        )
    return num


def group_gini(
    df: DataFrame, group_col: str, value_col: str | Column
) -> DataFrame:
    """(group, n_contributors, total, gini_num, gini) per group.

    Two aggregation passes joined on the group key: Spark refuses to mix
    a grouped-agg pandas UDF with builtin aggregates in ONE agg, and the
    builtin (count, sum) pair is a combinable map-side pass anyway. The
    join side is |groups| rows — broadcast."""
    nums = df.groupBy(group_col).agg(
        gini_numerator(value_col).alias("gini_num")
    )
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_contributors"),
        F.sum(value_col).alias("total"),
    )
    return (
        stats.join(F.broadcast(nums), group_col)
        .withColumn(
            "gini",
            F.col("gini_num") / (F.col("n_contributors") * F.col("total")),
        )
        .orderBy(group_col)
    )
