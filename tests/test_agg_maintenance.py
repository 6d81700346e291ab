"""Incrementally-maintained aggregate table (streaming/agg_maintenance.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.streaming import agg_maintenance as AM


@pytest.fixture()
def scratch(tmp_path):
    d = {
        "drop": str(tmp_path / "drop"),
        "table": str(tmp_path / "agg_table"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["drop"])
    yield d
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def test_stream_fold_matches_batch_aggregate(spark, scratch):
    a = _mkdf(spark, [("x", 1.0), ("x", 2.0), ("y", 10.0)])
    b = _mkdf(spark, [("x", 4.0), ("z", 7.0)])
    a.coalesce(1).write.parquet(scratch["drop"] + "/b0")

    stream = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(scratch["drop"] + "/*")
    )
    q = AM.stream_maintain_counts(
        stream, scratch["table"], scratch["ckpt"], "k", "v"
    )
    try:
        q.processAllAvailable()
        b.coalesce(1).write.parquet(scratch["drop"] + "/b1")
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.k: (r.n, r.sum_value)
        for r in spark.read.parquet(scratch["table"]).collect()
    }
    want = {
        r.k: (r.n, r.s)
        for r in a.union(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    assert AM.committed_epoch(scratch["table"]) >= 1


def test_replayed_epoch_is_idempotent(spark, scratch):
    df = _mkdf(spark, [("x", 1.0), ("y", 2.0)])
    assert AM.fold_batch_into_counts(df, 0, scratch["table"], "k", "v")
    assert AM.fold_batch_into_counts(df, 1, scratch["table"], "k", "v")
    before = {
        r.k: (r.n, r.sum_value)
        for r in spark.read.parquet(scratch["table"]).collect()
    }
    # a crash-replay re-delivers epoch 1: the fold must refuse
    assert not AM.fold_batch_into_counts(df, 1, scratch["table"], "k", "v")
    after = {
        r.k: (r.n, r.sum_value)
        for r in spark.read.parquet(scratch["table"]).collect()
    }
    assert after == before == {"x": (2, 2.0), "y": (2, 4.0)}
    assert AM.committed_epoch(scratch["table"]) == 1
