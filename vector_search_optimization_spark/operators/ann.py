"""Similarity search over embedding columns.

Engine extension (the reference's vector search is delegated to Azure AI
Search; its local analog is the brute-force nearest-centroid scan,
nuevo-kmeans-pre.ipynb:16 c1). Three tiers:

- ``brute_force_topk``       : exact top-k for a single query vector — one
                               scan + TakeOrdered, the correctness baseline.
- ``brute_force_topk_batch`` : exact top-k for a query *table* — broadcast
                               the queries, one window over (query, dist).
- ``ivf_topk`` / ``random_projection_buckets``: the scale paths. IVF
                               partitions the corpus by nearest centroid
                               (coarse quantizer) and probes only the
                               closest nprobe cells; RP-LSH buckets sign
                               patterns for near-dup blocking.

Scale notes: the corpus table never shuffles for brute force (map-side
distance + partial top-k, AQE merges); IVF turns a full scan into a
partition-pruned scan when the corpus is *written* partitioned by cell id
(df.write.partitionBy("cell")), which is the intended layout at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V
from .nearest_centroid import nearest_centroid

_SIMS = ("cosine", "dot")


def _score(vector_col: str, query: Sequence[float], sim: str) -> F.Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    if sim == "cosine":
        return V.cosine_similarity(F.col(vector_col), q)
    if sim == "dot":
        return V.dot(F.col(vector_col), q)
    raise ValueError(f"unknown similarity {sim!r}; one of {_SIMS}")


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    sim: str = "cosine",
) -> DataFrame:
    """Exact top-k rows by similarity to one query vector.

    The query is a plan literal — the scan computes the score map-side and
    Spark's TakeOrderedAndProject keeps k rows per partition, so the
    shuffle is k*num_partitions rows regardless of corpus size.
    """
    return (
        df.select(F.col(id_col), F.round(_score(vector_col, query, sim), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def brute_force_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "query_vec",
    sim: str = "cosine",
) -> DataFrame:
    """Exact top-k per query for a table of queries.

    Broadcast the (small) query table against the corpus — the corpus does
    not shuffle; the window's rank-limit pushdown keeps k rows per query per
    map task before the single (query_id-keyed) shuffle.
    """
    from pyspark.sql import Window

    scored = corpus.crossJoin(
        F.broadcast(queries.select(query_id_col, query_vector_col))
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            V.cosine_similarity(vector_col, query_vector_col)
            if sim == "cosine"
            else V.dot(vector_col, query_vector_col),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def all_pairs_topk(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Global top-k most-similar pairs (cosine), BLAS formulation.

    The corpus matrix is collected once (n x d floats) and shipped to
    executors in the UDF closure; each Arrow batch does one GEMM against it
    and keeps its per-row top-k (a superset of the global top-k pairs,
    since a global-top pair must rank top-k within its own row). Final
    global sort is over <= n*k candidate rows.

    The collect bounds this path to corpora whose matrix fits the driver
    (~1M x 128 floats = 512 MB); beyond that, block with
    random_projection_buckets + dedup.embedding_near_duplicates, or IVF.
    """
    import pandas as pd
    from pyspark.sql import types as T

    rows = df.select(id_col, vector_col).orderBy(id_col).collect()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = np.nan
    unit = mat / norms[:, None]

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_field.dataType),
            T.StructField("id_b", id_field.dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bm = np.asarray(pdf[vector_col].tolist(), dtype=np.float64)
            bn = np.linalg.norm(bm, axis=1)
            bn[bn == 0.0] = np.nan
            sims = (bm / bn[:, None]) @ unit.T                  # (b, n)
            bids = pdf[id_col].to_numpy()
            mask = ids[None, :] <= bids[:, None]                 # keep id_a < id_b
            sims[mask] = -np.inf
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_a, out_b, out_s = [], [], []
            for r in range(len(bids)):
                cols = idx[r][np.isfinite(sims[r, idx[r]])]
                out_a.extend([bids[r]] * len(cols))
                out_b.extend(ids[cols])
                out_s.extend(sims[r, cols])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_sim": out_s})

    cands = df.mapInPandas(kernel, schema=out_schema)
    return (
        cands.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "id_a", "id_b")
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    num_cells: int = 64,
    vector_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 20,
    max_train_rows: int = 100_000,
    method: str = "sample",
) -> DataFrame:
    """Coarse quantizer for IVF: k-means cells over a sample of the corpus.

    Returns a small DataFrame (cell int, centroid array<float>).

    method="sample" (default) is the standard IVF recipe (Faiss trains its
    quantizer the same way): draw a seeded sample capped at max_train_rows,
    collect it to the driver, and run Lloyd's k-means in numpy — at 100 TB
    you still train on ~1e5 vectors, so the training set is driver-bounded
    by construction and the fit costs no Spark jobs beyond the one sample
    scan. method="mllib" keeps the fully-distributed fit for callers whose
    training sample genuinely can't fit on the driver.
    """
    if method == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        sample = df.select(vector_col)
        if sample_fraction:
            sample = sample.sample(fraction=sample_fraction, seed=seed)
        train = sample.select(array_to_vector(F.col(vector_col)).alias("features"))
        model = KMeans(k=num_cells, seed=seed, maxIter=max_iter).fit(train)
        centers = [list(map(float, c)) for c in model.clusterCenters()]
    else:
        sample = df.select(vector_col)
        if sample_fraction:
            sample = sample.sample(fraction=sample_fraction, seed=seed)
        rows = sample.limit(max_train_rows).collect()
        x = np.array([r[0] for r in rows], dtype=np.float64)
        centers = [list(map(float, c)) for c in _lloyd_kmeans(x, num_cells, seed, max_iter)]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        schema="cell int, centroid array<float>",
    )


def _lloyd_kmeans(x: np.ndarray, k: int, seed: int, max_iter: int) -> np.ndarray:
    """Seeded k-means++ init + Lloyd iterations; returns (k, dim) centers.

    Driver-side kernel for quantizer training only — the training set is
    already bounded (≤ max_train_rows)."""
    n = len(x)
    k = min(k, n)
    rng = np.random.RandomState(seed)
    centers = np.empty((k, x.shape[1]))
    centers[0] = x[rng.randint(n)]
    d2 = np.sum((x - centers[0]) ** 2, axis=1)
    for i in range(1, k):
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(n, 1.0 / n)
        centers[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, np.sum((x - centers[i]) ** 2, axis=1))
    for _ in range(max_iter):
        # (n, k) squared distances via ||x||^2 - 2 x.c + ||c||^2
        dist = (
            np.sum(x * x, axis=1)[:, None]
            - 2.0 * (x @ centers.T)
            + np.sum(centers * centers, axis=1)[None, :]
        )
        labels = np.argmin(dist, axis=1)
        new = np.array(
            [
                x[labels == j].mean(axis=0) if np.any(labels == j) else centers[j]
                for j in range(k)
            ]
        )
        if np.allclose(new, centers):
            centers = new
            break
        centers = new
    return centers


def assign_ivf_cells(
    df: DataFrame,
    centroids: DataFrame,
    vector_col: str = "embedding",
) -> DataFrame:
    """Attach the IVF cell id to every corpus row (no shuffle — broadcast
    matrix argmin via the nearest-centroid operator)."""
    return nearest_centroid(
        df,
        centroids,
        vector_col=vector_col,
        centroid_col="centroid",
        label_col="cell",
        metric="sqeuclidean",
        out_label="cell",
        out_dist="cell_dist",
    ).drop("cell_dist")


def ivf_topk(
    indexed: DataFrame,
    centroids: DataFrame,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    sim: str = "cosine",
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest IVF cells.

    ``indexed`` must carry the ``cell`` column from assign_ivf_cells. The
    cell filter is an IN-list literal → partition pruning when the corpus
    is stored partitionBy("cell"); otherwise it's still a pushed-down scan
    filter that skips (1 - nprobe/num_cells) of the data.
    """
    cents = centroids.collect()
    q = np.array(query, dtype=np.float64)
    order = sorted(
        cents, key=lambda r: float(np.sum((np.array(r["centroid"]) - q) ** 2))
    )
    probe = [r["cell"] for r in order[:nprobe]]
    return brute_force_topk(
        indexed.where(F.col("cell").isin(probe)),
        query,
        k=k,
        id_col=id_col,
        vector_col=vector_col,
        sim=sim,
    )


def random_projection_buckets(
    df: DataFrame,
    num_planes: int = 12,
    vector_col: str = "embedding",
    seed: int = 42,
    out_col: str = "rp_bucket",
) -> DataFrame:
    """Sign-pattern LSH bucket id (SRP-LSH, Charikar '02) as a long.

    num_planes seeded random hyperplanes; bit i = sign(<v, plane_i>).
    Cosine-similar vectors collide with probability 1 - theta/pi per bit.
    Pure column expressions over plan-literal plane vectors — scan-speed,
    no UDF. Output feeds dedup.embedding_near_duplicates(group_col=...).
    """
    dim = len(df.select(vector_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (V.dot(F.col(vector_col), plane) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.withColumn(out_col, bucket)
