"""Unigram language-model quality scoring (perplexity-style filter).

Standard training-data curation signal (CCNet / Gopher lineage): train a
unigram LM on the corpus, score each document by its mean token
surprisal ``-ln p(w)``; outlier-surprisal documents are boilerplate or
noise. The real pipelines use a KenLM n-gram model — the unigram variant
keeps the identical plan shape (train = one combinable groupBy; score =
broadcast-join + one combinable per-doc agg) with no external model
artifact, and is exactly expressible in ANSI SQL for the oracle.

Add-one smoothing: ``p(w) = (cnt(w) + 1) / (N + V)`` with N = corpus
token count, V = vocab size, so a document scored against a vocabulary
that missed a word (OOV cnt=0) stays finite.

Scale (SCALING.md): tokenize is map-only; vocab is ONE combinable
shuffle; at 100 TB the vocabulary is truncated to the top-K words
(``vocab_top_k``) so the scoring join stays a broadcast — the tail
collapses into the smoothing term, which is the curation-correct
treatment (rare garbage tokens score as near-OOV). Per-doc scoring is
one more combinable shuffle. No window, no cartesian, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

TOKEN_SPLIT_RE = r"\s+"


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens, empty pieces dropped — byte-identical to the
    oracle's ``string_split_regex(text, '\\s+')`` + non-empty filter."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(t, TOKEN_SPLIT_RE), lambda s: s != "")


def train_unigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram counts over the corpus: (word, cnt). One combinable
    groupBy shuffle; partial aggregation happens map-side."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_surprisal(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_top_k: int | None = None,
) -> DataFrame:
    """Per-document mean token surprisal under the unigram LM.

    ``vocab`` is (word, cnt) from train_unigram_lm — possibly trained on
    a different corpus (cross-corpus scoring is the decontamination-style
    use). N and V are measured on the *vocab* (the model, not the scored
    corpus). The scoring join broadcasts the vocabulary; with
    ``vocab_top_k`` only the most frequent k words ship, the rest smooth.
    """
    if vocab_top_k is not None:
        vocab = vocab.orderBy(F.col("cnt").desc(), F.col("word")).limit(vocab_top_k)
    totals = vocab.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    toks = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("word"))
    scored = (
        toks.join(broadcast(vocab), "word", "left")
        .join(broadcast(totals))
        .select(
            id_col,
            (
                -F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0)) / (F.col("n_total") + F.col("v_size")))
            ).alias("surprisal"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("surprisal").alias("avg_surprisal"),
    )
