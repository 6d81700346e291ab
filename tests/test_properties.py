"""Property-based tests (hypothesis) for the vector/text kernels.

Strategy: generate small random inputs, run ONE Spark job over the whole
batch (per-example Spark jobs would be minutes-slow), assert the math
properties numpy guarantees.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from vector_search_optimization_spark.functions import vector as V

DIM = 6
finite = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=DIM, max_size=DIM)


@pytest.fixture(scope="module")
def batch(spark):
    """One shared batch of hypothesis-style random pairs, evaluated once."""
    rng = np.random.RandomState(11)
    pairs = []
    for _ in range(200):
        a = rng.uniform(-100, 100, DIM).astype(np.float32)
        b = rng.uniform(-100, 100, DIM).astype(np.float32)
        pairs.append((a.tolist(), b.tolist()))
    pairs.append(([0.0] * DIM, [1.0] * DIM))  # zero-vector edge
    df = spark.createDataFrame(pairs, "a array<float>, b array<float>")
    rows = df.select(
        "a",
        "b",
        V.euclidean("a", "b").alias("e"),
        V.manhattan("a", "b").alias("m"),
        V.cosine_similarity("a", "b").alias("c"),
        V.l2_norm("a").alias("na"),
        V.l2_norm("b").alias("nb"),
        V.l2_norm(V.l2_normalize("a")).alias("ua"),
        V.dot("a", "b").alias("d"),
    ).collect()
    return rows


def test_metric_properties(batch):
    for r in batch:
        a = np.array(r.a, dtype=np.float64)
        b = np.array(r.b, dtype=np.float64)
        # non-negativity and identity
        assert r.e >= 0 and r.m >= 0 and r.na >= 0
        # euclidean <= manhattan (norm inequality)
        assert r.e <= r.m + 1e-9
        # cosine in [-1, 1] (or NULL for zero vectors)
        if r.c is not None:
            assert -1.0 - 1e-9 <= r.c <= 1.0 + 1e-9
        # Cauchy-Schwarz: |<a,b>| <= |a||b|
        assert abs(r.d) <= r.na * r.nb + 1e-6
        # unit norm after normalization (or 0 for the zero vector)
        assert r.ua == pytest.approx(1.0, abs=1e-9) or r.ua == 0.0


def test_triangle_inequality(spark):
    rng = np.random.RandomState(13)
    rows = [
        (
            rng.uniform(-10, 10, DIM).astype(np.float32).tolist(),
            rng.uniform(-10, 10, DIM).astype(np.float32).tolist(),
            rng.uniform(-10, 10, DIM).astype(np.float32).tolist(),
        )
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>, c array<float>")
    got = df.select(
        V.euclidean("a", "c").alias("ac"),
        (V.euclidean("a", "b") + V.euclidean("b", "c")).alias("abc"),
    ).collect()
    for r in got:
        assert r.ac <= r.abc + 1e-9


@settings(max_examples=50, deadline=None)
@given(v=vec)
def test_parse_vector_roundtrip_property(v):
    """String form parses back to the float32 value (pure-python check of
    the same format the Spark expression consumes)."""
    s = "[" + ", ".join(repr(float(np.float32(x))) for x in v) + "]"
    parsed = [float(x) for x in s[1:-1].split(",")]
    assert parsed == pytest.approx([float(np.float32(x)) for x in v], rel=1e-6)


def test_parse_vector_matches_numpy_fromstring(spark):
    """Spark parse_vector == np.fromstring on generated strings
    (main-script1.ipynb:310 c15 parity)."""
    rng = np.random.RandomState(17)
    strs = [
        "[" + ", ".join(f"{x:.6f}" for x in rng.uniform(-5, 5, DIM)) + "]"
        for _ in range(50)
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = df.select(V.parse_vector("s").alias("v")).collect()
    for r, s in zip(got, strs):
        expect = np.fromstring(s[1:-1], sep=",")
        assert r.v == pytest.approx(expect.tolist(), rel=1e-6)


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    )
)
def test_connected_components_matches_reference_union_find(spark, edges):
    """Random graphs: the distributed CC (contraction + driver/loop)
    labels every node with its component's min id, matching a plain
    python union-find."""
    from vector_search_optimization_spark.operators.graph import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.pid: r.component for r in connected_components(df).collect()
    }
    assert got == want


# --- word-window chunking properties -----------------------------------------

@given(
    n_words=st.integers(min_value=0, max_value=60),
    chunk_tokens=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(max_examples=25, deadline=None)
def test_word_chunks_cover_exactly_with_stride(spark, n_words, chunk_tokens, overlap_frac):
    """For any (n, window, overlap): chunk starts are exactly the stride
    grid below n, windows reconstruct the original word sequence, and
    token counts match window sizes."""
    from vector_search_optimization_spark.functions import text as TX

    overlap = min(int(chunk_tokens * overlap_frac), chunk_tokens - 1)
    step = chunk_tokens - overlap
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    chunks = df.select(
        TX.word_chunks("text", chunk_tokens=chunk_tokens, overlap=overlap).alias("c")
    ).first().c

    expected_starts = list(range(0, n_words, step))
    assert len(chunks) == len(expected_starts)
    for c, s in zip(chunks, expected_starts):
        body = words[s : s + chunk_tokens]
        assert c.chunk_text == " ".join(body)
        assert c.n_tokens == len(body)
    # stride-coverage: concatenating each window's non-overlapping tail
    # reproduces the corpus exactly
    rebuilt = []
    for c, s in zip(chunks, expected_starts):
        toks = c.chunk_text.split()
        rebuilt.extend(toks if s == 0 else toks[overlap:] if len(toks) > overlap else [])
    assert rebuilt == words or n_words == 0


# ---------------------------------------------------------------------------
# curation-operator properties
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=25, deadline=None)
def test_redaction_leaves_no_residual_pii(texts):
    """After redact_pii, none of the four detectors may match again —
    redaction is a fixpoint of detection on arbitrary ASCII input.
    (Python re and Spark's Java regex agree on this ASCII subset; the
    Spark-side semantics are pinned by tests/test_curation.py.)"""
    import re

    from vector_search_optimization_spark.functions import redact as RD

    for t in texts:
        red = t
        for pattern, tag in RD.REDACTIONS:
            red = re.sub(pattern, tag, red)
        for pattern, _ in RD.REDACTIONS:
            assert re.search(pattern, red) is None, (t, red, pattern)


def test_fraction_sample_thresholds_nest(spark):
    """sample(f1) ⊆ sample(f2) for f1 <= f2 — hash-threshold membership
    is monotone in the fraction, so samples can grow incrementally."""
    from vector_search_optimization_spark.operators import sampling as SAMP

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    prev: set = set()
    for f in (0.05, 0.15, 0.4, 0.8, 1.0):
        cur = {r.id for r in SAMP.deterministic_sample(df, "id", f).collect()}
        assert prev <= cur
        prev = cur
    # fraction >= 1 keeps EVERY row (regression: a 5-hex-digit bound
    # used to drop ~94% of rows at fraction=1.0)
    assert prev == set(range(300))
