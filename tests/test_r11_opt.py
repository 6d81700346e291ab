"""Round-11 optimization internals: spread_scan (the unsplittable-input
remedy) and the load_table footer-schema memo.

Both exist because the driver tables are single-row-group parquet files:
a scan of one cannot be byte-split, so map-heavy stages ran as ONE task
(guide §2.5), and schema inference re-read the footer on every
load_table call (~0.1-0.25 s × ~500 calls per bench run).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from vector_search_optimization_spark.sources import load_table, spread_scan
from vector_search_optimization_spark.sources import readers as R


def test_spread_scan_redistributes_single_file_scan(spark, sf_small):
    d = load_table(spark, sf_small, "documents").select("doc_id", "text")
    out = spread_scan(d, "doc_id")
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # row multiset unchanged (ids are unique, so count + id-sum pin it)
    a = d.agg(F.count("*"), F.sum("doc_id")).collect()[0]
    b = out.agg(F.count("*"), F.sum("doc_id")).collect()[0]
    assert tuple(a) == tuple(b)


def test_spread_scan_noop_when_already_parallel(spark, sf_small):
    target = spark.sparkContext.defaultParallelism
    d = (
        load_table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .repartition(target * 2, "doc_id")
    )
    out = spread_scan(d, "doc_id")
    # already >= parallelism: the helper must not add another exchange
    assert out is d


def test_spread_scan_noop_at_scale_estimate(spark, sf_small):
    # a scan whose byte total implies >= target splits is left alone —
    # the lake-scale posture (the estimate path, no physical planning)
    d = load_table(spark, sf_small, "documents")
    out = spread_scan(d, "doc_id", target=1)
    assert out is d


def test_spread_scan_streaming_passthrough(spark, sf_small, tmp_path):
    sdf = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    assert spread_scan(sdf, "value") is sdf


def test_load_table_schema_memo_hits_and_invalidates(spark, sf_small, tmp_path):
    # prime + hit
    df1 = load_table(spark, sf_small, "documents")
    path = os.path.join(sf_small, "documents.parquet")
    assert path in R._SCHEMA_CACHE
    df2 = load_table(spark, sf_small, "documents")
    assert df1.schema == df2.schema

    # a regenerated file (different stat) must be re-probed: copy the
    # table, load it, then overwrite with a different-schema parquet
    gen_dir = str(tmp_path / "gen")
    os.makedirs(gen_dir)
    tgt = os.path.join(gen_dir, "documents.parquet")
    shutil.copyfile(path, tgt)
    s1 = load_table(spark, gen_dir, "documents").schema
    assert s1 == df1.schema
    spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("other_col")
    ).toPandas().to_parquet(tgt, index=False)
    s2 = load_table(spark, gen_dir, "documents").schema
    assert "other_col" in s2.fieldNames()  # stale schema would miss it


def test_events_ts_still_timestamp_after_memo(spark, sf_small):
    # the dynamic ts-encoding detection must survive the explicit-schema
    # read path (the encoding-varies-between-rounds rule)
    e = load_table(spark, sf_small, "events")
    assert dict(e.dtypes)["ts"].startswith("timestamp")
    assert e.where(F.col("ts").isNull()).count() == 0
