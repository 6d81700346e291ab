"""SearchIndex facade: the reference's search-client surface call-for-call
(get_all / keyed get / keyword / vector / hybrid / merge_documents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_optimization_spark.functions import vector as V
from vector_search_optimization_spark.operators.retrieval import (
    SearchIndex,
    bm25_keyword_scores,
)


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        # (doc_id, text, embedding, etiqueta)
        (0, "spark shuffle exchange cost", [1.0, 0.0, 0.0], None),
        (1, "broadcast join beats shuffle join twice shuffle", [0.9, 0.1, 0.0], None),
        (2, "window functions rank rows", [0.0, 1.0, 0.0], None),
        (3, "completely unrelated pastry recipe", [0.0, 0.0, 1.0], None),
        (4, "shuffle shuffle shuffle shuffle", [0.5, 0.5, 0.0], None),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<float>, etiqueta string"
    ).cache()
    return SearchIndex(docs)


def test_get_all_and_keyed_lookup(index):
    assert index.get_all().count() == 5
    assert index.get_all(["doc_id"]).columns == ["doc_id"]
    got = index.get_document(2).collect()
    assert len(got) == 1 and got[0].text.startswith("window")


def test_keyword_search_is_bm25_ranked(index):
    top = index.search_keyword(["shuffle"], k=3).collect()
    ids = [r.doc_id for r in top]
    # doc 4 has the highest saturated tf; 3 (no hit) must be absent
    assert ids[0] == 4
    assert 3 not in ids
    # idf sanity: for a doc containing both terms once, the rare term
    # ("pastry", df=1) outscores the common one ("shuffle", df=4)
    both = bm25_keyword_scores(index.docs, ["pastry", "shuffle"]).collect()
    rare_only = bm25_keyword_scores(index.docs, ["pastry"]).collect()
    common_only = bm25_keyword_scores(index.docs, ["shuffle"]).collect()
    rare_best = max(r.kw_score for r in rare_only)
    common_single_tf = next(
        r.kw_score for r in common_only if r.doc_id == 0  # tf=1, like pastry
    )
    assert rare_best > common_single_tf
    assert max(r.kw_score for r in both) > 0


def test_vector_search_finds_nearest(index):
    top = index.search_vector([1.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id if hasattr(r, "vec_id") else r.doc_id for r in top][0] == 0


def test_hybrid_fuses_both_signals(index):
    # RRF is symmetric in ranks: doc 0 (vec 1 / kw 3) and doc 4 (kw 1 /
    # vec 3) tie exactly at 1/61 + 1/63, broken by doc_id; doc 1 (2/2)
    # lands third at 2/62 — the 1/(k+r) convexity favoring a #1 anywhere
    out = index.search_hybrid(["shuffle"], [0.95, 0.05, 0.0], k=5).collect()
    assert [r.doc_id for r in out[:3]] == [0, 4, 1]
    assert out[0].rrf_score == out[1].rrf_score
    assert out[2].rank_kw == 2 and out[2].rank_vec == 2
    # docs with no keyword hit ride the vector side only (rank_kw
    # coalesced to 0, kw contribution 0) and sink to the bottom
    assert out[-1].doc_id == 3 and out[-1].rank_kw == 0


def test_merge_documents_partial_update(index):
    updates = index.docs.sparkSession.createDataFrame(
        [(0, "motor de consultas")], "doc_id long, etiqueta string"
    )
    merged = index.merge_documents(updates)
    got = {r.doc_id: r for r in merged.get_all().collect()}
    assert got[0].etiqueta == "motor de consultas"
    assert got[0].text == "spark shuffle exchange cost"  # untouched field
    assert got[1].etiqueta is None                        # other rows unchanged
    # chainable: search still works on the merged index
    assert merged.search_keyword(["shuffle"], k=1).count() == 1


class TestMmrRerank:
    def test_mmr_diversifies_across_planted_clusters(self, spark):
        """Query sits in cluster A; plain top-k returns only A members,
        MMR at lam=0.5 pulls in the B representative early."""
        import numpy as np

        from vector_search_optimization_spark.operators.retrieval import (
            mmr_rerank,
        )

        rng = np.random.default_rng(7)
        a = np.array([1.0, 0.0, 0.0])
        b = np.array([0.6, 0.8, 0.0])
        rows = []
        for i in range(8):  # tight cluster around a
            v = a + 0.01 * rng.standard_normal(3)
            rows.append((i, [float(x) for x in v]))
        rows.append((100, [float(x) for x in b]))  # one distinct direction
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = mmr_rerank(df, [1.0, 0.0, 0.0], k=3, shortlist=9, lam=0.3).collect()
        assert [r["rank"] for r in out] == [1, 2, 3]
        assert 100 in {r["vec_id"] for r in out}  # diversity pick
        assert out[0]["max_prior_sim"] is None
        for r in out[1:]:
            assert r["max_prior_sim"] is not None
            assert abs(
                r["mmr_score"]
                - (0.3 * r["sim_q"] - 0.7 * r["max_prior_sim"])
            ) < 1e-12

    def test_kernel_is_plain_topk_at_lambda_one(self, spark):
        """lam=1.0 disables the penalty: selection must equal the plain
        cosine top-k ordering (rounded-score, min-id tie-break)."""
        import numpy as np

        from vector_search_optimization_spark.operators.retrieval import (
            mmr_select,
        )

        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((20, 8))
        q = rng.standard_normal(8)
        picks = mmr_select(list(range(20)), vecs.tolist(), q.tolist(), k=5, lam=1.0)
        vf = vecs.astype(np.float32).astype(np.float64)
        qf = np.asarray(q, dtype=np.float32).astype(np.float64)
        sims = np.round(
            (vf / np.linalg.norm(vf, axis=1, keepdims=True))
            @ (qf / np.linalg.norm(qf)),
            6,
        )
        want = sorted(range(20), key=lambda i: (-sims[i], i))[:5]
        assert [i for _, i, _, _ in picks] == want
