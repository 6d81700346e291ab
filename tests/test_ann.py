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


def test_all_pairs_distributed_equals_kernel(emb):
    """The registered emb_top_pairs path (grid-block GEMM, no driver
    collect) must produce the exact same top-20 as the driver-bounded
    all_pairs_topk kernel — same values, same tie-breaks."""
    exact = [
        (r.id_a, r.id_b, r.cos_sim) for r in ann.all_pairs_topk(emb, k=20).collect()
    ]
    dist = [
        (r.id_a, r.id_b, r.cos_sim)
        for r in ann.all_pairs_topk_distributed(emb, k=20, num_blocks=4).collect()
    ]
    assert dist == exact


def test_rp_blocked_recall_on_planted_near_dups(spark):
    """Multi-table SRP blocking must recover >= 90% of PLANTED near-dup
    pairs (cos ~0.995) — the workload LSH blocking is for. (On weakly
    similar pairs, theta ~60deg, sign-LSH recall is structurally low; the
    exact grid path covers that regime.)"""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    expect = set()
    for i in range(40):
        v = rng.normal(size=32)
        v /= np.linalg.norm(v)
        rows.append((2 * i, v.tolist()))
        n = v + rng.normal(scale=0.03, size=32)  # cos ~0.9995
        rows.append((2 * i + 1, (n / np.linalg.norm(n)).tolist()))
        expect.add((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in ann.rp_blocked_top_pairs(
            df, k=40, num_planes=8, num_tables=4, seed=42
        ).collect()
    }
    assert len(got & expect) >= 36


def test_rp_blocked_no_driver_collect(emb):
    """Plan sanity: the blocked path joins on (tbl, bucket) — no
    crossJoin, no nested loop. The bucket assignment runs as ONE Arrow
    kernel stage (rp_table_buckets_kernel); everything after it is a
    pure DataFrame plan, and nothing collects the corpus."""
    plan = (
        ann.rp_blocked_top_pairs(emb, k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bucket kernel is the only python stage; it appears once per
    # join side in the unexecuted plan (the persist dedupes at runtime)
    assert 1 <= plan.count("MapInPandas") <= 2
    assert "InMemoryTableScan" in plan  # bucketed rows cached, not re-derived


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


def test_ivf_index_lifecycle_and_nprobe_recall_curve(spark, emb, tmp_path):
    """Build once (write_ivf_index), probe many: the loaded corpus prunes
    partitions, and recall@10 grows monotonically with nprobe, reaching
    1.0 when every cell is probed (nprobe = num_cells ⇒ exact)."""
    cents = ann.train_ivf_centroids(emb, num_cells=16, seed=42)
    path = str(tmp_path / "ivf_index")
    ann.write_ivf_index(emb, cents, path)
    indexed, loaded_cents = ann.load_ivf_index(spark, path)
    assert loaded_cents.count() == cents.count()

    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    probe = ann.ivf_topk(indexed, loaded_cents, q, k=10, nprobe=4)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]

    exact = {r.vec_id for r in ann.brute_force_topk(emb, q, k=10).collect()}
    recalls = []
    for nprobe in (1, 2, 4, 8, 16):
        got = {
            r.vec_id
            for r in ann.ivf_topk(indexed, loaded_cents, q, k=10, nprobe=nprobe).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls)  # monotone non-decreasing in nprobe
    assert recalls[-1] == 1.0  # all cells probed = exact


def test_ivf_append_is_incremental(spark, emb, tmp_path):
    """append_to_ivf_index adds a batch into the partitioned corpus
    without touching existing files: every pre-append file survives
    byte-identical, the union of rows is exact, and a probe near an
    appended vector finds it through the same pruned scan."""
    import glob
    import os

    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    cents = ann.train_ivf_centroids(old, num_cells=8, seed=42)
    path = str(tmp_path / "ivf_index")
    ann.write_ivf_index(old, cents, path)

    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{path}/corpus/**/*.parquet", recursive=True)
    }
    ann.append_to_ivf_index(new, path)
    after = set(glob.glob(f"{path}/corpus/**/*.parquet", recursive=True))

    assert set(before) <= after  # nothing rewritten or deleted
    for p, mtime in before.items():
        assert os.path.getmtime(p) == mtime

    indexed, loaded_cents = ann.load_ivf_index(spark, path)
    assert indexed.count() == emb.count()
    q = new.orderBy("vec_id").first()["embedding"]
    got = {
        r.vec_id
        for r in ann.ivf_topk(indexed, loaded_cents, q, k=5, nprobe=8).collect()
    }
    exact = {r.vec_id for r in ann.brute_force_topk(emb, q, k=5).collect()}
    assert got == exact  # nprobe = num_cells ⇒ exact, incl. appended rows


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


def test_int8_quantization_recall_and_reconstruction(spark, emb):
    """SQ int8: reconstruction error bounded by scale/2 per element, and
    quantized top-10 recall >= 0.8 vs the exact float path."""
    q = ann.quantize_int8(emb).withColumn("deq", ann.dequantize_int8())
    row = q.select("embedding", "deq", "q8", "q8_scale").first()
    for x, xq in zip(row.embedding, row.deq):
        assert abs(float(x) - xq) <= row.q8_scale / 2 + 1e-9
    assert max(abs(v) for v in row.q8) <= 127

    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    exact = {r.vec_id for r in ann.brute_force_topk(emb, qvec, k=10).collect()}
    deq = q.select("vec_id", F.col("deq").alias("embedding"))
    approx = {r.vec_id for r in ann.brute_force_topk(deq, qvec, k=10).collect()}
    assert len(exact & approx) / len(exact) >= 0.8


def test_pq_codes_storage_and_recall(spark, emb):
    """PQ: codes are m small ints (32x smaller than float32 at dim 64),
    reconstruction distances correlate — PQ-ADC top-10 recall >= 0.6 vs
    exact euclidean (16 centroids x 8 subspaces on a 64-dim corpus; PQ
    is the coarsest tier, IVF/SQ cover higher-recall regimes)."""
    books = ann.train_pq_codebooks(emb.orderBy("vec_id"), 8, 16, seed=42)
    assert books.shape == (8, 16, 8)
    enc = ann.pq_encode_kernel(emb.select("vec_id", "embedding"), books)
    row = enc.first()
    assert len(row.pq_codes) == 8 and all(0 <= c < 16 for c in row.pq_codes)

    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    adc = [
        r.vec_id
        for r in enc.select("vec_id", ann.pq_adc_score(books, qvec).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    import numpy as np

    pdf = emb.toPandas().sort_values("vec_id")
    X = np.asarray(pdf.embedding.tolist(), dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    order = np.argsort(((X - q) ** 2).sum(1))
    rank = {int(pdf.vec_id.values[order[i]]): i for i in range(len(order))}
    exact = set(pdf.vec_id.values[order[:10]])
    # coarse-tier invariants: the query finds itself, candidates rank far
    # above random (mean exact rank ~27 measured vs 250 random), and some
    # exact neighbors survive the 32x compression
    assert min(adc, key=lambda v: rank[v]) == 0 and 0 in adc
    assert np.mean([rank[v] for v in adc]) <= 75
    assert len(set(adc) & exact) / 10 >= 0.2


def test_ivfpq_composition_recall_and_pruning(spark, emb):
    """IVF-PQ (Faiss IndexIVFPQ layout): with every cell probed the
    composition must equal pure PQ-ADC ranking (coarse pruning adds no
    error when nothing is pruned); with nprobe=8/16 the candidate set is
    cell-bounded and recall vs pure ADC stays high."""
    books = ann.train_pq_codebooks(emb.orderBy("vec_id"), 8, 16, seed=42)
    cents = ann.train_ivf_centroids(emb, num_cells=16, seed=42)
    idx = ann.assign_ivf_cells(emb, cents, "embedding")
    enc = ann.pq_encode_kernel(idx.select("vec_id", "embedding", "cell"), books).cache()
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]

    pure_adc = [
        r.vec_id
        for r in enc.select("vec_id", ann.pq_adc_score(books, qvec).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    full = [
        r.vec_id
        for r in ann.ivfpq_topk(enc, cents, books, qvec, k=10, nprobe=16).collect()
    ]
    assert full == pure_adc  # no pruning → identical ranking

    probed = [
        r.vec_id
        for r in ann.ivfpq_topk(enc, cents, books, qvec, k=10, nprobe=8).collect()
    ]
    assert 0 in probed  # query's own cell is always probed first
    assert len(set(probed) & set(pure_adc)) >= 6
    enc.unpersist()


def test_streaming_ivf_index_maintenance(spark, emb, tmp_path):
    """A parquet-file stream of fresh embeddings folds into the IVF
    index via foreachBatch: after processAllAvailable the index holds
    the full corpus, pre-existing files are untouched (append-only),
    and a probe finds a streamed-in vector through the pruned scan."""
    import glob
    import os

    from vector_search_optimization_spark.streaming.index_maintenance import (
        stream_append_to_ivf_index,
    )

    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    cents = ann.train_ivf_centroids(old, num_cells=8, seed=42)
    path = str(tmp_path / "ivf_index")
    ann.write_ivf_index(old, cents, path)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{path}/corpus/**/*.parquet", recursive=True)
    }

    # stage the stream: two arrival waves into a watched directory
    src = str(tmp_path / "arrivals")
    w1 = new.where(F.col("vec_id") % 4 == 1)
    w2 = new.where(F.col("vec_id") % 4 == 3)
    w1.write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(src)
    )
    q = stream_append_to_ivf_index(
        stream, path, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        w2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    after = set(glob.glob(f"{path}/corpus/**/*.parquet", recursive=True))
    assert set(before) <= after
    for p, mtime in before.items():
        assert os.path.getmtime(p) == mtime  # append-only contract

    indexed, loaded_cents = ann.load_ivf_index(spark, path)
    assert indexed.count() == emb.count()
    assert {r.vec_id for r in indexed.select("vec_id").collect()} == {
        r.vec_id for r in emb.select("vec_id").collect()
    }

    # probe near a streamed-in vector: it must surface via pruned cells
    target = new.orderBy("vec_id").first()
    got = {
        r.vec_id
        for r in ann.ivf_topk(
            indexed, loaded_cents, target.embedding, k=5, nprobe=8
        ).collect()
    }
    assert target.vec_id in got


def test_compact_ivf_cells_preserves_rows_and_prunes_files(spark, emb, tmp_path):
    """Compaction rewrites only over-fragmented cells down to one file,
    leaves compliant cells byte-untouched, and the corpus row set (and a
    probe's results) are identical before and after."""
    import glob
    import os

    old = emb.where(F.col("vec_id") % 2 == 0)
    cents = ann.train_ivf_centroids(old, num_cells=4, seed=42)
    path = str(tmp_path / "ivf_index")
    ann.write_ivf_index(old, cents, path)
    # fragment the index: six tiny appends
    rest = emb.where(F.col("vec_id") % 2 == 1)
    for i in range(6):
        ann.append_to_ivf_index(rest.where(F.col("vec_id") % 12 == 2 * i + 1), path)

    def files_per_cell():
        return {
            d: sorted(glob.glob(f"{d}/*.parquet"))
            for d in glob.glob(f"{path}/corpus/cell=*")
        }

    before = files_per_cell()
    assert any(len(fs) > 4 for fs in before.values())  # fixture fragmented
    rows_before = sorted(
        r.vec_id for r in spark.read.parquet(f"{path}/corpus").collect()
    )
    compliant = {d for d, fs in before.items() if len(fs) <= 4}
    mtimes = {f: os.path.getmtime(f) for d in compliant for f in before[d]}

    compacted = ann.compact_ivf_cells(spark, path, max_files_per_cell=4)
    assert compacted  # something was actually rewritten

    after = files_per_cell()
    for d in after:
        assert len(after[d]) <= 4 or d in compliant
    for f, t in mtimes.items():  # compliant cells untouched
        assert os.path.getmtime(f) == t
    rows_after = sorted(
        r.vec_id for r in spark.read.parquet(f"{path}/corpus").collect()
    )
    assert rows_after == rows_before

    indexed, loaded_cents = ann.load_ivf_index(spark, path)
    q = emb.orderBy("vec_id").first().embedding
    got = [r.vec_id for r in ann.ivf_topk(indexed, loaded_cents, q, k=5, nprobe=4).collect()]
    assert len(got) == 5


def test_pq_refined_topk_recovers_exact_ranking(spark, emb):
    """Re-ranking must return the TRUE top-k whenever the ADC shortlist
    contains it — with rerank = corpus size the result equals exact
    brute-force squared-euclidean ranking; with a tight shortlist the
    top-1 (the query itself) still survives."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    q = next(r.embedding for r in rows if r.vec_id == rows[0].vec_id)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    qv = np.array(q, dtype=np.float64)
    exact_order = sorted(
        ((float(((x - qv) ** 2).sum()), r.vec_id) for x, r in zip(X, rows)),
    )[:5]
    want = [vid for _, vid in exact_order]

    books = ann.train_pq_codebooks(emb.orderBy("vec_id"), 8, 16, seed=42)
    enc = ann.pq_encode_kernel(emb.select("vec_id", "embedding"), books)

    full = ann.pq_refined_topk(enc, books, q, k=5, rerank=len(rows)).collect()
    assert [r.vec_id for r in full] == want  # rerank=n == exact ranking

    tight = ann.pq_refined_topk(enc, books, q, k=1, rerank=10).collect()
    assert tight[0].vec_id == want[0] and tight[0].exact_dist == 0.0


def test_ivfpq_refined_topk_exact_when_unconstrained(spark, emb, tmp_path):
    """With every cell probed and rerank = corpus size, the composed
    IVF-PQ + refine stack must reproduce exact squared-euclidean
    ranking; the refine fetch must read only shortlist ids."""
    import numpy as np

    cents = ann.train_ivf_centroids(emb, num_cells=4, seed=42)
    path = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, cents, path)
    indexed, loaded_cents = ann.load_ivf_index(spark, path)
    books = ann.train_pq_codebooks(emb.orderBy("vec_id"), 8, 16, seed=42)
    enc = ann.pq_encode_kernel(
        indexed.select("vec_id", "embedding", "cell"), books
    ).drop("embedding")

    rows = emb.select("vec_id", "embedding").collect()
    q = rows[0].embedding
    qv = np.array(q, dtype=np.float64)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    want = [
        vid
        for _, vid in sorted(
            (float(((x - qv) ** 2).sum()), r.vec_id) for x, r in zip(X, rows)
        )[:5]
    ]

    got = ann.ivfpq_refined_topk(
        enc, indexed, loaded_cents, books, q,
        k=5, rerank=len(rows), nprobe=4,
    ).collect()
    assert [r.vec_id for r in got] == want
    assert got[0].exact_dist == 0.0  # the query vector itself


def test_compact_ivf_cells_repeated_rounds_unique_names(spark, emb, tmp_path):
    """A second compaction round must not collide with (and destroy) the
    first round's compacted-* files — install names are epoch-unique,
    and rows survive fragment -> compact -> fragment -> compact."""
    import glob

    old = emb.where(F.col("vec_id") % 2 == 0)
    cents = ann.train_ivf_centroids(old, num_cells=4, seed=42)
    path = str(tmp_path / "ivf_index")
    ann.write_ivf_index(old, cents, path)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    for i in range(6):
        ann.append_to_ivf_index(rest.where(F.col("vec_id") % 12 == 2 * i + 1), path)
    assert ann.compact_ivf_cells(spark, path, max_files_per_cell=4)
    rows_mid = sorted(r.vec_id for r in spark.read.parquet(f"{path}/corpus").collect())

    # re-fragment and compact again: previous compacted-* files are now
    # among the originals being replaced
    for i in range(6):
        ann.append_to_ivf_index(rest.where(F.col("vec_id") % 12 == 2 * i + 1), path)
    assert ann.compact_ivf_cells(spark, path, max_files_per_cell=1)
    rows_after = sorted(r.vec_id for r in spark.read.parquet(f"{path}/corpus").collect())
    # the duplicate appends collapse: compaction dedups on vec_id so
    # crash leftovers / replayed epochs converge instead of accumulating
    assert rows_after == rows_mid
    for d in glob.glob(f"{path}/corpus/cell=*"):
        assert len(glob.glob(f"{d}/*.parquet")) <= 1


def test_recall_at_k_harness(spark, emb):
    """recall_at_k: 1.0 against itself, correct fraction on a planted
    overlap, 0.0 on an empty exact set."""
    q = emb.orderBy("vec_id").first().embedding
    exact = ann.brute_force_topk(emb, q, k=10)
    assert ann.recall_at_k(exact, exact) == 1.0
    far = (
        emb.orderBy(F.col("vec_id").desc())
        .limit(5)
        .select("vec_id", F.lit(0.0).alias(exact.columns[1]))
    )
    half = exact.limit(5).union(far)
    r = ann.recall_at_k(half, exact)
    assert 0.4 <= r <= 0.7  # 5 guaranteed hits, tail may overlap
    empty = exact.where(F.lit(False))
    assert ann.recall_at_k(exact, empty) == 0.0


def test_ivf_cell_stats_flags_imbalance(spark, emb):
    """Even assignment ~ imbalance near 1; piling everything into one
    cell drives imbalance to n_cells."""
    cents = ann.train_ivf_centroids(emb, num_cells=8, seed=42)
    assigned = ann.assign_ivf_cells(emb, cents)
    st = ann.ivf_cell_stats(assigned)
    assert st["n_cells"] >= 2
    assert st["min"] >= 1 and st["max"] >= st["min"]
    assert 1.0 <= st["imbalance"] < st["n_cells"]
    skew = assigned.withColumn("cell", F.lit(0))
    st2 = ann.ivf_cell_stats(skew)
    assert st2["n_cells"] == 1 and st2["imbalance"] == 1.0
    empty = assigned.where(F.lit(False))
    assert ann.ivf_cell_stats(empty)["n_cells"] == 0


def test_matryoshka_rerank_full_equals_exact(spark, emb):
    """matryoshka_topk with rerank = corpus size must equal the exact
    full-dim brute-force top-k (the shortlist then contains everything);
    a tight shortlist still returns k rows scored at full precision."""
    rows = emb.orderBy("vec_id").select("embedding").first()
    q = rows[0]
    n = emb.count()
    exact = ann.brute_force_topk(emb, q, k=5).collect()
    mrl = ann.matryoshka_topk(emb, q, k=5, prefix_dim=16, rerank=n).collect()
    assert [r.vec_id for r in mrl] == [r.vec_id for r in exact]
    assert [r.score for r in mrl] == [r.score for r in exact]

    tight = ann.matryoshka_topk(emb, q, k=3, prefix_dim=16, rerank=10).collect()
    assert len(tight) == 3
    # the query vector itself must survive any shortlist: its prefix
    # cosine is exactly 1.0 (the maximum)
    assert tight[0].score == 1.0


def test_ivf_recall_audit_monotone_and_full_probe_exact(emb):
    """ivf_recall_audit: recall is non-decreasing in nprobe per query,
    and probing every cell recovers the exact top-10 (recall 1.0)."""
    cents_df = ann.train_ivf_centroids(emb, num_cells=16, seed=42)
    idx = ann.assign_ivf_cells(emb, cents_df, "embedding").cache()
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = ann.ivf_recall_audit(
        idx, cents_df, queries, k=10, nprobes=(1, 4, 16)
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.nprobe] = r.recall_at_10
    for qid, recs in by_q.items():
        assert recs[1] <= recs[4] <= recs[16], (qid, recs)
        assert recs[16] == 1.0


def test_ivf_recall_audit_generic_query_id_type(emb):
    """The probe frame's id type derives from the queries frame — string
    query ids must work end to end (the signature is generic, so the
    internal literal frame cannot hardcode long)."""
    cents_df = ann.train_ivf_centroids(emb, num_cells=8, seed=42)
    idx = ann.assign_ivf_cells(emb, cents_df, "embedding")
    queries = emb.where(F.col("vec_id") < 2).select(
        F.concat(F.lit("q-"), F.col("vec_id")).alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    rows = ann.ivf_recall_audit(
        idx, cents_df, queries, k=5, nprobes=(8,)
    ).collect()
    assert {r.query_id for r in rows} == {"q-0", "q-1"}
    for r in rows:
        assert r.recall_at_5 == 1.0  # full probe recovers the exact top-5
