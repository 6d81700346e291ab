"""Streaming SPC maintenance must equal the evt_spc_individuals batch
combine once the stream has absorbed the same rows — including when a
late spike on an old day moves the center/MR̄ and re-flags other days
(the fact that forces grid-state maintenance instead of folded chart
stats)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.operators import timeseries as TS
from vector_search_optimization_spark.sources import load_table
from vector_search_optimization_spark.streaming.spc_maintenance import (
    stream_spc_monitor,
)


@pytest.fixture()
def tmpdirs():
    root = tempfile.mkdtemp(prefix="spc_stream_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _batch_daily(events):
    day = F.floor(F.unix_timestamp(F.col("ts")) / F.lit(86400.0)).cast("long")
    return (
        events.where(F.col("value").isNotNull())
        .groupBy(F.col("event_type"), day.alias("d"))
        .agg(F.round(F.sum("value") * 100).cast("long").alias("cents"))
    )


def test_stream_spc_equals_batch_with_split_days(spark, sf_small, tmpdirs):
    events = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    want = sorted(
        tuple(r) for r in TS.spc_from_daily(_batch_daily(events)).collect()
    )

    drop = f"{tmpdirs}/drop"
    cols = ["ts", "event_type", "value"]
    ts_type = dict(events.dtypes)["ts"]
    events.where(F.col("event_id") % 2 == 0).select(cols).write.mode(
        "overwrite"
    ).parquet(drop)
    events.where(F.col("event_id") % 2 == 1).select(cols).write.mode(
        "append"
    ).parquet(drop)

    stream = (
        spark.readStream.schema(
            f"ts {ts_type}, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = stream_spc_monitor(
        stream,
        out_path=f"{tmpdirs}/chart",
        checkpoint_dir=f"{tmpdirs}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        tuple(r) for r in spark.read.parquet(f"{tmpdirs}/chart").collect()
    )
    assert got == want  # every day straddled both micro-batches


def test_stream_spc_late_spike_reflags_days(spark, tmpdirs):
    """The property that forces grid state: 10 flat days (1.00 each)
    plus one 2.00 day — with MR̄ small the 2.00 day is out of control.
    A late +99.00 on an OLD flat day explodes MR̄ (its two adjacent
    moving ranges), the limits widen, and the 2.00 day drops back in
    control while the spiked day itself is flagged — the revision a
    folded violation count could never make."""
    base = dt.datetime(2024, 3, 1)
    b1 = [
        (base + dt.timedelta(days=k), "A", 1.00 if k < 10 else 2.00)
        for k in range(11)
    ]
    df1 = spark.createDataFrame(
        b1, schema="ts timestamp, event_type string, value double"
    )
    # chart on batch 1 alone: the 2.00 day must be out of control
    first = TS.spc_from_daily(_batch_daily(df1)).collect()[0]
    assert first.n_violations >= 1

    b2 = [(base + dt.timedelta(days=4), "A", 99.00)]
    drop = f"{tmpdirs}/drop2"
    df1.write.mode("overwrite").parquet(drop)
    spark.createDataFrame(
        b2, schema="ts timestamp, event_type string, value double"
    ).write.mode("append").parquet(drop)

    stream = (
        spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = stream_spc_monitor(
        stream,
        out_path=f"{tmpdirs}/chart2",
        checkpoint_dir=f"{tmpdirs}/ckpt2",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(f"{tmpdirs}/chart2").collect()
    assert len(rows) == 1
    got = rows[0]
    # maintained read equals the all-rows batch combine exactly
    batch = TS.spc_from_daily(
        _batch_daily(
            spark.createDataFrame(
                b1 + b2,
                schema="ts timestamp, event_type string, value double",
            )
        )
    ).collect()[0]
    assert tuple(got) == tuple(batch)
    # and the late spike genuinely rewrote the chart: wider limits,
    # different violation set than batch 1's
    assert got.mrbar_cents > first.mrbar_cents
    assert got.ucl_cents > first.ucl_cents
