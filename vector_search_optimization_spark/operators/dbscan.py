"""DBSCAN (SURVEY §2.9 M4) — grid-searched density clustering.

Reference: eps ∈ linspace(0.1, 1.5, 10) x min_samples ∈ {5..50 step 5},
silhouette per combo, best eps=0.5667/ms=5 → silhouette 0.0742
(silhouettes.ipynb:661 c30). MLlib has no DBSCAN; the container has no
sklearn. Two paths:

- ``dbscan_kernel``: exact numpy DBSCAN (BFS region growing) inside one
  task — for reference-scale corpora (the thesis ran it on 5,755 rows) or
  per-partition after blocking.
- ``dbscan_distributed``: the scale path — ε-neighbor pair join (reusing
  the similarity self-join pattern, optionally LSH-blocked) + iterative
  connected components over the core-point graph. Border points attach to
  any adjacent core cluster; noise stays -1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vector as V


def _dbscan_numpy(X: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Textbook DBSCAN; labels -1 noise, 0..C-1 clusters. O(m^2) memory."""
    m = len(X)
    d = np.sqrt(
        np.maximum((X**2).sum(1)[:, None] - 2 * X @ X.T + (X**2).sum(1)[None, :], 0)
    )
    neigh = d <= eps  # includes self, like sklearn
    n_neigh = neigh.sum(axis=1)
    core = n_neigh >= min_samples
    labels = np.full(m, -1, dtype=np.int64)
    cid = 0
    for start in range(m):
        if labels[start] != -1 or not core[start]:
            continue
        # BFS over core connectivity
        stack = [start]
        labels[start] = cid
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.where(neigh[p])[0]:
                if labels[q] == -1:
                    labels[q] = cid
                    stack.append(q)
        cid += 1
    return labels


def dbscan_kernel(
    df: DataFrame,
    eps: float,
    min_samples: int,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "dbscan_label",
) -> DataFrame:
    """Single-task exact DBSCAN (reference scale). The whole table is
    coalesced into one group — use only when m^2 doubles fit a task."""
    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField(out_col, T.LongType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        X = np.asarray(pdf[vector_col].tolist(), dtype=np.float64)
        return pd.DataFrame({id_col: pdf[id_col], out_col: _dbscan_numpy(X, eps, min_samples)})

    return (
        df.select(F.lit(1).alias("__g"), id_col, vector_col)
        .groupBy("__g")
        .applyInPandas(kernel, schema=schema)
    )


def dbscan_distributed(
    df: DataFrame,
    eps: float,
    min_samples: int,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "dbscan_label",
    max_iter: int = 50,
) -> DataFrame:
    """Distributed DBSCAN: ε-join → core points → connected components.

    1. ε-neighbor pairs via self-join on distance <= eps (quadratic
       candidate space — block with ann.random_projection_buckets first on
       big corpora; correctness here, blocking is the caller's knob).
    2. core = points with >= min_samples neighbors (self included).
    3. label = min reachable core id, by iterative min-propagation over
       core-core edges (hash-join per iteration, AQE-coalesced; converges
       in O(graph diameter) rounds).
    4. border points take the min label of adjacent cores; others -1.

    Cluster ids are min-member-ids (stable, not 0..C-1); use
    dense_label_numbering for compact ids when needed.
    """
    pts = df.select(F.col(id_col).alias("pid"), F.col(vector_col).alias("v"))
    a = pts.select(F.col("pid").alias("src"), F.col("v").alias("va"))
    b = pts.select(F.col("pid").alias("dst"), F.col("v").alias("vb"))
    pairs = (
        a.crossJoin(b)
        .where(F.col("src") != F.col("dst"))
        .where(V.euclidean("va", "vb") <= eps)
        .select("src", "dst")
    )
    pairs = pairs.persist()
    degree = pairs.groupBy("src").agg((F.count(F.lit(1)) + 1).alias("deg"))
    core = degree.where(F.col("deg") >= min_samples).select(
        F.col("src").alias("pid")
    )
    core = core.persist()

    core_edges = (
        pairs.join(core.withColumnRenamed("pid", "src"), "src", "left_semi")
        .join(core.withColumnRenamed("pid", "dst"), "dst", "left_semi")
        .persist()
    )

    # iterative min-label propagation over core-core edges
    labels = core.withColumn("lbl", F.col("pid"))
    for _ in range(max_iter):
        neigh_min = (
            core_edges.join(labels.withColumnRenamed("pid", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
            .withColumnRenamed("src", "pid")
        )
        new_labels = (
            labels.join(neigh_min, "pid", "left")
            .select("pid", F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "pid")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    # border points: non-core with a core neighbor → min core label
    border = (
        pairs.join(labels.withColumnRenamed("pid", "dst"), "dst")
        .join(core.withColumnRenamed("pid", "src"), "src", "left_anti")
        .groupBy("src")
        .agg(F.min("lbl").alias("lbl"))
        .withColumnRenamed("src", "pid")
    )
    assigned = labels.unionByName(border)
    return df.join(
        assigned.withColumnRenamed("pid", id_col), id_col, "left"
    ).withColumn(out_col, F.coalesce(F.col("lbl"), F.lit(-1))).drop("lbl")


def dbscan_grid_search(
    df: DataFrame,
    eps_grid: list[float],
    min_samples_grid: list[int],
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[dict]:
    """M4 — the reference's 10x10 hyperparameter grid with silhouette
    scoring (silhouettes.ipynb:661 c30). Combos yielding < 2 clusters get
    silhouette None, like the reference's skip branch."""
    from .clustering import silhouette_exact_distributed

    results = []
    for eps in eps_grid:
        for ms in min_samples_grid:
            lab = dbscan_kernel(df, eps, ms, vector_col, id_col)
            joined = df.join(lab, id_col)
            clustered = joined.where(F.col("dbscan_label") >= 0)
            n_clusters = clustered.select("dbscan_label").distinct().count()
            sil = None
            if n_clusters >= 2:
                sil = silhouette_exact_distributed(
                    clustered, vector_col, "dbscan_label", sample_size=2000,
                    id_cols=[id_col],
                )
            results.append(
                {"eps": eps, "min_samples": ms, "n_clusters": n_clusters,
                 "silhouette": sil}
            )
    return results
