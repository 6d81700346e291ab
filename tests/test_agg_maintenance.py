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
    # markers are scoped to the query's checkpoint lineage
    assert AM.committed_epoch(scratch["table"], AM._scope_tag(scratch["ckpt"])) >= 1


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


def test_initial_epoch_is_staged_atomically(spark, scratch):
    """The first epoch must leave either nothing or data+marker —
    no window where data exists without its marker (which would
    double-count on replay)."""
    df = _mkdf(spark, [("x", 1.0)])
    assert AM.fold_batch_into_counts(df, 0, scratch["table"], "k", "v")
    assert AM.committed_epoch(scratch["table"]) == 0
    # replay of the initial epoch is refused
    assert not AM.fold_batch_into_counts(df, 0, scratch["table"], "k", "v")
    got = spark.read.parquet(scratch["table"]).collect()
    assert {(r.k, r.n, r.sum_value) for r in got} == {("x", 1, 1.0)}


def test_interrupted_swap_recovers_history(spark, scratch):
    """Simulate a kill between commit_swap's two renames: the table dir
    is gone, history sits under .__old__ — the replayed fold must
    restore and merge, not re-initialize from one batch."""
    import os

    AM.fold_batch_into_counts(_mkdf(spark, [("x", 1.0)]), 0, scratch["table"], "k", "v")
    AM.fold_batch_into_counts(_mkdf(spark, [("y", 5.0)]), 1, scratch["table"], "k", "v")
    os.rename(scratch["table"], scratch["table"] + ".__old__")  # crash window
    assert AM.fold_batch_into_counts(
        _mkdf(spark, [("x", 2.0)]), 2, scratch["table"], "k", "v"
    )
    got = {
        r.k: (r.n, r.sum_value)
        for r in spark.read.parquet(scratch["table"]).collect()
    }
    assert got == {"x": (2, 3.0), "y": (1, 5.0)}


def test_foreign_checkpoint_lineage_is_refused(spark, scratch):
    df = _mkdf(spark, [("x", 1.0)])
    AM.fold_batch_into_counts(df, 0, scratch["table"], "k", "v", scope="aaaa1111")
    with pytest.raises(ValueError, match="different"):
        AM.fold_batch_into_counts(df, 0, scratch["table"], "k", "v", scope="bbbb2222")


def test_integer_value_column_keeps_double_schema(spark, scratch):
    df = spark.createDataFrame([("x", 3), ("x", 4)], "k string, v long")
    AM.fold_batch_into_counts(df, 0, scratch["table"], "k", "v")
    t0 = dict(spark.read.parquet(scratch["table"]).dtypes)["sum_value"]
    AM.fold_batch_into_counts(df, 1, scratch["table"], "k", "v")
    t1 = dict(spark.read.parquet(scratch["table"]).dtypes)["sum_value"]
    assert t0 == t1 == "double"


def test_lake_uri_paths_are_rejected_explicitly(spark):
    df = _mkdf(spark, [("x", 1.0)])
    with pytest.raises(NotImplementedError):
        AM.fold_batch_into_counts(df, 0, "hdfs://nn/agg", "k", "v")
