"""Token-budget batch packing (training-data pipeline: group documents
into LLM-sized batches — the engine-side generalization of the
reference's per-cluster token-capped prompt assembly,
update-etiquetas.ipynb:171 c9 ``contar_tokens`` budget loop).

Two formulations:

- ``pack_by_token_budget`` (shards=None): the exact one-pass streaming
  pack — running token total per group in id order, a batch break when
  the total crosses the budget. One window shuffle; a group's whole
  corpus lands in ONE window partition, which is correct but a hotspot
  when a single group (language) dominates the corpus.
- sharded (shards=N): the 100 TB relaxation SCALING.md documents — ids
  hash into N shards per group, the window partitions by (group, shard),
  and batch keys are (group, shard, batch_ix). Batch boundaries shift
  relative to the exact pack (each shard packs independently) but every
  packing invariant still holds per batch; no task ever holds more than
  ~1/N of a group. The sharded pack of shard count 1 IS the exact pack
  (property-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_budget(
    df: DataFrame,
    budget: int,
    tokens: Column,
    group_col: str = "lang",
    id_col: str = "doc_id",
    shards: int | None = None,
    out_tokens: str = "n_tok",
    out_batch: str = "batch_id",
) -> DataFrame:
    """Assign each row a batch id such that batches fill greedily in
    ``id_col`` order until the running token total crosses ``budget``.

    Returns the input columns plus (n_tok, [shard,] batch_id). A batch's
    token sum only exceeds the budget by at most its final document —
    the standard streaming-pack contract (a single over-budget document
    still gets a batch of its own).
    """
    out = df.withColumn(out_tokens, tokens)
    if shards is None:
        part = [group_col]
    else:
        out = out.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
        )
        part = [group_col, "shard"]
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return out.withColumn(
        out_batch,
        F.floor(
            F.coalesce(F.sum(out_tokens).over(w), F.lit(0)) / F.lit(budget)
        ),
    )
