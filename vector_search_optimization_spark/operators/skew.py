"""Skew-mitigation operators — salted two-level aggregation and join.

At 100 TB a handful of hot keys (one dominant language, one viral
user_id) can pin an entire aggregation or join on one reducer. The
standard fixes, packaged as operators:

- ``salted_agg``: two-level aggregation — first aggregate on
  (key, salt) so a hot key's rows spread over ``salts`` reducers, then
  combine the partials. Works for any algebraic aggregate (the partial
  states here: count/sum/min/max). AQE's skew handling only splits
  *join* partitions; skewed aggs still need salting.
- ``salted_shuffle_join``: when neither side broadcasts, a hot join key
  pins one reducer. The small(er) side replicates each row ``salts``
  times (explode), the big side salts deterministically, and the join
  runs on (key, salt) — the hot key's rows spread over ``salts``
  reducers at the cost of replicating the smaller side ``salts``×.
  Where the small side DOES fit in a broadcast, skew is moot (zero
  shuffle of the big side) — that's the engine-wide default (plan pins).

The salt must be DETERMINISTIC (hash of a row key, not rand()): retried
tasks must land rows in the same salt bucket or AQE/retry can double- or
drop-count partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(key: Column | str, salts: int) -> Column:
    """Deterministic salt in [0, salts): xxhash64 of the row key, made
    non-negative via pmod. Retry-stable, partitioning-independent."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c), F.lit(salts)).cast("int")


def salted_agg(
    df: DataFrame,
    group_col: str,
    salt_key: str,
    salts: int = 16,
    value_col: str | None = None,
) -> DataFrame:
    """Two-level skew-proof aggregation.

    Level 1 groups on (group_col, salt) — a key with 10^9 rows spreads
    its partial states over ``salts`` reducers. Level 2 combines the at
    most ``salts`` partials per key. Emits count / sum / min / max of
    ``value_col`` (count only if value_col is None). Both levels are
    combinable shuffles with map-side partials; total extra cost is one
    tiny second shuffle of |keys|×salts rows.
    """
    salt_name = "_salt"
    while salt_name in df.columns:  # never clobber a caller's column
        salt_name += "_"
    lvl1 = df.withColumn(salt_name, salt_column(salt_key, salts)).groupBy(
        group_col, salt_name
    )
    if value_col is None:
        partial = lvl1.agg(F.count(F.lit(1)).alias("_n"))
        return (
            partial.groupBy(group_col)
            .agg(F.sum("_n").alias("n"))
        )
    partial = lvl1.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(value_col).alias("_s"),
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
    )
    return partial.groupBy(group_col).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias("sum_value"),
        F.min("_mn").alias("min_value"),
        F.max("_mx").alias("max_value"),
    )


def salted_shuffle_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof shuffle equi-join on ``key``.

    The big side gets a deterministic salt from ``salt_key`` (a big-side
    row key — NOT the join key, which is constant within the hot group);
    the small side replicates each row once per salt value (one
    explode, |small|×salts rows — use only when the small side doesn't
    fit a broadcast but |small|×salts is still shuffle-friendly). The
    (key, salt) equi-join then spreads each hot key over ``salts``
    reducers. Result equals ``big.join(small, key, how)`` exactly
    (equivalence-tested); supported ``how``: inner / left — semantics
    where a big-side row appears at most once per small match.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_shuffle_join supports inner/left, got {how!r}")
    salt_name = "_salt"
    while salt_name in big.columns or salt_name in small.columns:
        salt_name += "_"
    big_s = big.withColumn(salt_name, salt_column(salt_key, salts))
    # explode is a generator — it cannot nest inside another expression
    # (no .cast around it); sequence of int literals already yields int
    small_s = small.withColumn(
        salt_name, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return big_s.join(small_s, [key, salt_name], how).drop(salt_name)
