"""Streaming Holt maintenance must equal the evt_holt_linear batch
combine once the stream has absorbed the same rows — including when a
DAY is split across micro-batches (the case that forbids folding the
(level, trend) pair forward and forces grid-state maintenance)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.operators import timeseries as TS
from vector_search_optimization_spark.sources import load_table
from vector_search_optimization_spark.streaming.holt_maintenance import (
    stream_holt_monitor,
)


@pytest.fixture()
def tmpdirs():
    root = tempfile.mkdtemp(prefix="holt_stream_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _batch_holt(events):
    day = F.floor(F.unix_timestamp(F.col("ts")) / F.lit(86400.0)).cast("long")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(F.col("event_type"), day.alias("d"))
        .agg(F.round(F.sum("value") * 100).cast("long").alias("cents"))
    )
    return TS.holt_from_daily(daily)


def _keyed(rows):
    return {
        r.event_type: (
            r.n_days,
            r.level_cents,
            r.trend_cents,
            r.forecast_7d_cents,
            r.rmse_cents,
        )
        for r in rows
    }


def test_stream_holt_equals_batch_with_split_days(spark, sf_small, tmpdirs):
    """Two drop-zone files split by event_id parity — every day's rows
    straddle BOTH micro-batches, so any day-finality (or fold-forward)
    assumption in the state would break. After full absorption the sink
    output must equal the batch combine row-for-row (cents are exact
    after absorption and the fold order is fixed, so equality is
    exact)."""
    events = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    want = _keyed(_batch_holt(events).collect())

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
    q = stream_holt_monitor(
        stream,
        out_path=f"{tmpdirs}/level",
        checkpoint_dir=f"{tmpdirs}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _keyed(spark.read.parquet(f"{tmpdirs}/level").collect())
    assert got == want


def test_stream_holt_prefix_and_known_series(spark, tmpdirs):
    """A single-batch stream equals the batch combine over exactly that
    prefix, and two hand-checkable series pin the recursion: a constant
    series smooths to (level == constant, trend == 0, rmse == 0), and
    a perfect line y = 100·t is absorbed by the init (l=x1, b=x2−x1)
    into exact one-step predictions — rmse == 0 with the trend equal to
    the true slope."""
    rows = (
        [("const", 86400 * d, 50.0) for d in range(6)]
        + [("line", 86400 * d, float(100 * (d + 1))) for d in range(6)]
    )
    df = spark.createDataFrame(
        rows, "event_type string, epoch long, value double"
    ).select(
        "event_type",
        F.col("epoch").cast("timestamp").alias("ts"),
        "value",
    )
    want = _keyed(_batch_holt(df).collect())

    drop = f"{tmpdirs}/drop2"
    df.select("ts", "event_type", "value").write.mode("overwrite").parquet(
        drop
    )
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(drop)
    q = stream_holt_monitor(
        stream,
        out_path=f"{tmpdirs}/level2",
        checkpoint_dir=f"{tmpdirs}/ckpt2",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _keyed(spark.read.parquet(f"{tmpdirs}/level2").collect())
    assert got == want

    n, level, trend, fc7, rmse = got["const"]
    assert (n, level, trend, rmse) == (6, 5000.0, 0.0, 0.0)
    assert fc7 == 5000.0
    n, level, trend, fc7, rmse = got["line"]
    assert (n, trend, rmse) == (6, 10000.0, 0.0)
    assert level == 60000.0  # cents of the last point y = 600
    assert fc7 == 60000.0 + 7 * 10000.0
