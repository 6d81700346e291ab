"""ANN tier tests: brute-force correctness, IVF recall, partition pruning."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.operators import ann
from vector_search_optimization_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


def test_brute_force_matches_numpy(emb):
    pdf = emb.toPandas().sort_values("vec_id")
    X = np.asarray(pdf.embedding.tolist(), dtype=np.float64)
    q = X[0]
    sims = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf.vec_id.values, -np.round(sims, 6)))[:10]
    expect = pdf.vec_id.values[order]
    got = [r.vec_id for r in ann.brute_force_topk(emb, q.tolist(), k=10).collect()]
    assert got == list(expect)


def test_ivf_recall_at_10(emb):
    """nprobe=8/16 cells must recover >=70% of the exact top-10 on the
    clustered synthetic corpus (standard IVF recall sanity bound)."""
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    cents = ann.train_ivf_centroids(emb, num_cells=16, seed=42)
    idx = ann.assign_ivf_cells(emb, cents, "embedding").cache()
    exact = {r.vec_id for r in ann.brute_force_topk(emb, q, k=10).collect()}
    approx = {r.vec_id for r in ann.ivf_topk(idx, cents, q, k=10, nprobe=8).collect()}
    assert len(approx & exact) >= 7
    # full probe = exact
    full = {r.vec_id for r in ann.ivf_topk(idx, cents, q, k=10, nprobe=16).collect()}
    assert full == exact


def test_ivf_partitioned_layout_prunes(spark, emb, tmp_path):
    """The 100 TB layout: corpus written partitionBy(cell) → probing reads
    only the probed cells' files (PartitionFilters in the scan)."""
    cents = ann.train_ivf_centroids(emb, num_cells=8, seed=42)
    idx = ann.assign_ivf_cells(emb, cents, "embedding")
    path = str(tmp_path / "ivf_corpus")
    idx.write.partitionBy("cell").parquet(path)
    corpus = spark.read.parquet(path)
    probed = corpus.where(F.col("cell").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]
    # and the pruned scan still yields correct top-k within the probe set
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    got = ann.brute_force_topk(probed, q, k=5).collect()
    assert len(got) == 5


def test_bucketed_join_avoids_shuffle(spark, sf_small, tmp_path):
    """bucketBy co-location: a self-join on the bucket key plans without
    an Exchange on either side (SCALING.md storage-layout lever)."""
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    ev = load_table(spark, sf_small, "events")
    ev.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable(
        "ev_bucketed"
    )
    t = spark.table("ev_bucketed")
    agg = t.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # bucketing satisfies it
    # force SMJ (the small table would otherwise broadcast) to show the
    # co-located join needs no shuffle on either side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = t.alias("a").join(t.alias("b"), "user_id")
        jplan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in jplan
        assert "Exchange hashpartitioning" not in jplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
