"""Graph stage (SURVEY §2.10 G1-G2).

Reference: clusters-as-nodes co-occurrence graph weighted by shared
document_id (analisis-informe.ipynb:2540-2558 c75-c76), greedy-modularity
community detection → 6 communities, modularity 0.2938 weighted / 0.1848
unweighted (c78-c79).

Spark mapping: edge extraction is distributed (similarity.cooccurrence_edges
— the J10 self-join); the graph itself is tiny (37 nodes), so community
detection runs driver-side on networkx, with a pure-python greedy fallback
when networkx is absent. "Spark builds the edge list at scale, the driver
does the tiny graph algorithm."
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cooccurrence_edges


def build_cluster_graph(
    df: DataFrame, group_col: str, node_col: str
) -> tuple[DataFrame, DataFrame]:
    """G1 — (vertices, weighted edges) DataFrames."""
    vertices = df.select(F.col(node_col).alias("id")).distinct()
    edges = cooccurrence_edges(df, group_col, node_col)
    return vertices, edges


def modularity(edges: list[tuple], communities: list[set], weighted: bool = True) -> float:
    """Newman modularity Q for an undirected weighted graph given a
    community partition. edges: (src, dst, weight)."""
    w = {(min(s, d), max(s, d)): (float(wt) if weighted else 1.0) for s, d, wt in edges}
    two_m = 2.0 * sum(w.values())
    if two_m == 0:
        return 0.0
    deg: dict = {}
    for (s, d), wt in w.items():
        deg[s] = deg.get(s, 0.0) + wt
        deg[d] = deg.get(d, 0.0) + wt
    node_comm = {n: i for i, c in enumerate(communities) for n in c}
    q = 0.0
    for (s, d), wt in w.items():
        if node_comm.get(s) == node_comm.get(d):
            q += 2.0 * wt / two_m
    for c in communities:
        dc = sum(deg.get(n, 0.0) for n in c)
        q -= (dc / two_m) ** 2
    return q


def detect_communities(
    edges_df: DataFrame,
    weighted: bool = True,
    vertices_df: DataFrame | None = None,
) -> dict:
    """G2 — greedy-modularity communities + modularity score.

    Collects the (small) edge list to the driver and runs networkx's
    greedy_modularity_communities; returns {communities: [[node,...]],
    modularity: float, n_communities: int}. Isolated vertices (no edges)
    become singleton communities, as in networkx.
    """
    rows = edges_df.collect()
    edges = [(r["src"], r["dst"], r["weight"]) for r in rows]
    nodes = {r["src"] for r in rows} | {r["dst"] for r in rows}
    if vertices_df is not None:
        nodes |= {r["id"] for r in vertices_df.collect()}
    return detect_communities_kernel(nodes, edges, weighted)


def detect_communities_kernel(nodes, edges, weighted: bool = True) -> dict:
    """Driver-side greedy-modularity kernel (Spark-free; shared with the
    g2 oracle generator). Input is fed to networkx in sorted order so the
    partition is a pure function of the (node, edge) SETS — collection
    order and set-iteration order can't perturb tie-breaking."""
    if not edges:  # edgeless graph: all-singleton partition, Q undefined → 0
        comms_sorted = sorted([n] for n in nodes)
        return {
            "communities": comms_sorted,
            "modularity": 0.0,
            "n_communities": len(comms_sorted),
        }

    nodes_sorted = sorted(nodes)
    edges_sorted = sorted(edges)
    try:
        import networkx as nx
        from networkx.algorithms import community as nxc

        g = nx.Graph()
        g.add_nodes_from(nodes_sorted)
        for s, d, w in edges_sorted:
            g.add_edge(s, d, weight=float(w) if weighted else 1.0)
        comms = [set(c) for c in nxc.greedy_modularity_communities(
            g, weight="weight" if weighted else None
        )]
        q = nxc.modularity(g, comms, weight="weight" if weighted else None)
    except ImportError:  # pragma: no cover - networkx is present here
        comms = _greedy_modularity_fallback(nodes_sorted, edges_sorted, weighted)
        q = modularity(edges_sorted, comms, weighted)

    comms_sorted = sorted(
        (sorted(c) for c in comms), key=lambda c: (-len(c), c)
    )
    return {
        "communities": comms_sorted,
        "modularity": float(q),
        "n_communities": len(comms_sorted),
    }


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str = "pid",
    max_iter: int = 50,
    symmetrize: bool = True,
) -> DataFrame:
    """Distributed connected components by min-label propagation with
    pointer jumping (label <- label(label) each round), so convergence is
    O(log n) rounds, not O(component diameter) — a chain of 1e6 nodes
    converges in ~20 rounds. The corpus-scale building block shared by
    DBSCAN core clustering and near-duplicate canonicalization.

    Edges are undirected; pass ``symmetrize=False`` when the input already
    contains both directions (e.g. an ε-neighbor pair table). Returns
    (id_col, component) with component = min member id. Isolated nodes
    appear only when supplied via ``nodes`` (single-column DataFrame).

    Scale: each round shuffles the (sparse) edge table once for the
    neighbor-min and the label table once for the jump; every round
    localCheckpoints eagerly, which both truncates the doubling plan tree
    and serves as the convergence materialization. Superseded label frames
    are plain checkpointed RDDs — no persist leaks.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.persist()
    pts = e.select(F.col("src").alias(id_col)).distinct()
    if nodes is not None:
        pts = pts.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias(id_col))
        ).distinct()
    labels = pts.withColumn("lbl", F.col(id_col)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neigh_min = (
            e.join(labels.withColumnRenamed(id_col, "dst"), "dst")
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
            .withColumnRenamed("src", id_col)
        )
        stepped = labels.join(neigh_min, id_col, "left").select(
            id_col,
            F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
            (F.coalesce("nlbl", "lbl") < F.col("lbl")).alias("chg"),
        )
        # pointer jumping: follow lbl one hop (label of my label)
        jump = labels.select(
            F.col(id_col).alias("lbl"), F.col("lbl").alias("jlbl")
        )
        new_labels = (
            stepped.join(jump, "lbl", "left")
            .select(
                id_col,
                F.least("lbl", F.coalesce("jlbl", "lbl")).alias("lbl"),
                (
                    F.col("chg") | (F.coalesce("jlbl", "lbl") < F.col("lbl"))
                ).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where("chg").limit(1).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    e.unpersist()
    return labels.withColumnRenamed("lbl", "component")


def _greedy_modularity_fallback(nodes, edges, weighted: bool) -> list[set]:
    """CNM-style greedy merge: start singleton, merge the pair with max
    modularity gain until no positive gain remains."""
    comms = [{n} for n in nodes]
    best_q = modularity(edges, comms, weighted)
    improved = True
    while improved and len(comms) > 1:
        improved = False
        best_pair, best_gain = None, 0.0
        for i in range(len(comms)):
            for j in range(i + 1, len(comms)):
                trial = [c for k, c in enumerate(comms) if k not in (i, j)]
                trial.append(comms[i] | comms[j])
                gain = modularity(edges, trial, weighted) - best_q
                if gain > best_gain:
                    best_gain, best_pair = gain, (i, j)
        if best_pair:
            i, j = best_pair
            merged = comms[i] | comms[j]
            comms = [c for k, c in enumerate(comms) if k not in (i, j)] + [merged]
            best_q += best_gain
            improved = True
    return comms
