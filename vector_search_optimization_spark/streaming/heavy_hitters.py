"""Streaming heavy-hitter monitor — the bounded-state stream twin of
operators/heavy_hitters.py.

The batch operator's contract is sketch-then-verify: a layout-independent
candidate stage that provably contains every true phi-heavy hitter, then
an exact verify pass. A stream cannot re-scan history for the verify, so
the streaming monitor maintains the candidate stage INCREMENTALLY with a
mergeable Misra-Gries summary per key-hash shard and emits, each
micro-batch, every summarized key with its deterministic count bracket
``[est, est + decs]`` (est = the MG undercount, decs = the shard's total
decrement mass). Guarantees, independent of batch boundaries:

- **No false negatives:** all occurrences of a key hash to ONE shard, so
  a key with global count > phi*N has shard count > phi*N_shard; with
  capacity k = ceil(1/phi), MG's invariant (an evicted key's true count
  is <= decs <= N_shard/(k+1) < phi*N_shard) keeps it summarized.
- **Bounded state & output:** <= k keys per shard, ever — state and
  per-batch emission are O(n_shards/phi) regardless of stream length.
- **Bracket correctness:** true shard count is in [est, est + decs]
  (MG merge only ever subtracts the uniform trim mass from survivors).

The exact counts for the (tiny) candidate set come from the accumulated
table afterwards — the same broadcast-semi-join verify the batch
operator uses; stream-candidates ⊇ batch-heavy-hitters is pytest-pinned.
"""

from __future__ import annotations

import math

import pandas as pd  # noqa: F401  (module-level for pandas_udf files)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitter_monitor_stream(
    df: DataFrame, key_col: str, phi: float, n_shards: int = 8
) -> DataFrame:
    """Per-micro-batch heavy-hitter candidates with count brackets.

    Output rows (update mode): one per summarized key per shard per
    batch — (shard, key, est, decs, shard_rows). ``est + decs`` upper-
    bounds and ``est`` lower-bounds the key's true count in its shard
    (== its global count: keys never split across shards)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = int(math.ceil(1.0 / phi))
    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("est", T.LongType()),
            T.StructField("decs", T.LongType()),
            T.StructField("shard_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("decs", T.LongType()),
            T.StructField("rows", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        shard = int(key[0])
        if state.exists:
            keys, counts, decs, rows = state.get
            counter = dict(zip(keys, counts))
        else:
            counter, decs, rows = {}, 0, 0
        for pdf in pdfs:
            rows += len(pdf)
            for kk, c in pdf["hh_key"].value_counts().items():
                counter[kk] = counter.get(kk, 0) + int(c)
            if len(counter) > k:
                # mergeable-summaries trim (Agarwal et al.): subtract the
                # (k+1)-th largest from everyone, drop the non-positive —
                # one uniform decrement, the classic MG bound telescopes
                trim = sorted(counter.values(), reverse=True)[k]
                counter = {
                    kk: v - trim for kk, v in counter.items() if v > trim
                }
                decs += trim
        state.update(
            (
                list(counter.keys()),
                [int(v) for v in counter.values()],
                int(decs),
                int(rows),
            )
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counter),
                "key": list(counter.keys()),
                "est": [int(v) for v in counter.values()],
                "decs": [int(decs)] * len(counter),
                "shard_rows": [int(rows)] * len(counter),
            }
        )

    keyed = df.select(
        F.col(key_col).cast("string").alias("hh_key")
    ).withColumn("shard", F.pmod(F.xxhash64("hh_key"), F.lit(n_shards)))
    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
