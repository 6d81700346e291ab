"""Exact heavy-hitter detection without shuffling the key space.

The 100 TB problem: "which tokens / users / URLs account for more than
phi of all rows" normally costs a full shuffle of every key occurrence —
at corpus scale the token stream is ~the corpus itself. The classical
fix (Misra-Gries / Space-Saving) keeps a bounded candidate summary per
partition and verifies candidates exactly:

1. **Candidate stage (map-side, zero shuffle of the stream):** each
   Arrow batch emits the keys whose *local* count exceeds ``phi`` of the
   batch. Pigeonhole guarantee: if a key's global count exceeds
   ``phi * N`` then in at least one batch its local count exceeds
   ``phi * n_batch`` (otherwise summing the per-batch bounds would give
   ``count <= phi * N``). So the candidate union provably contains every
   true heavy hitter, regardless of partitioning — while each batch can
   emit at most ``floor(1/phi)`` keys.
2. **Verify stage (exact):** the (tiny, <= partitions/phi row) distinct
   candidate set is broadcast back as a left-semi filter and the
   surviving rows — only candidate keys — are counted exactly. One
   combinable aggregation whose key space is bounded by the candidate
   set, not the corpus vocabulary.
3. **Threshold (deterministic):** keep keys with exact ``n > phi * N``.
   Because stage 1 can never miss a true hitter and stage 3 re-checks
   every candidate against the *exact* global threshold, the output is
   the exact heavy-hitter set — independent of partition layout, batch
   sizes, or execution order. (The intermediate candidate set IS
   layout-dependent; it never appears in the output.)

Two passes over the source by design — the same contract as any
sketch-then-verify plan; at 100 TB both passes are map-heavy scans with
no large shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_keys(df: DataFrame, key_col: str, phi: float) -> DataFrame:
    """Map-side heavy-hitter candidates: per-Arrow-batch local counts,
    keys with ``local_count > phi * batch_rows`` (<= 1/phi keys per
    batch). Output column = ``key_col``, distinct."""
    import pandas as pd  # noqa: F401  (module-level for pandas_udf files)

    field = df.schema[key_col]
    schema = f"`{key_col}` {field.dataType.simpleString()}"

    def batches(it):
        for pdf in it:
            vc = pdf[key_col].value_counts()
            cand = vc[vc > phi * len(pdf)]
            yield cand.index.to_frame(index=False, name=key_col)

    return df.select(key_col).mapInPandas(batches, schema=schema).distinct()


def heavy_hitters(df: DataFrame, key_col: str, phi: float) -> DataFrame:
    """Exact keys with ``count > phi * total`` plus their exact counts.

    Returns columns ``(key_col, n, total, share)`` where ``share`` is
    the UNROUNDED ``n / total`` (exact-integer division — bit-identical
    in any IEEE engine given the same integers; the derived-ratio export
    rule). Ordered by descending count, then key, for stable output.
    """
    cands = candidate_keys(df, key_col, phi)
    exact = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return (
        exact.join(F.broadcast(total))  # 1-row denominator frame
        .where(F.col("n") > F.lit(phi) * F.col("total"))
        .select(
            key_col,
            "n",
            "total",
            (F.col("n") / F.col("total")).alias("share"),
        )
        .orderBy(F.desc("n"), key_col)
    )
