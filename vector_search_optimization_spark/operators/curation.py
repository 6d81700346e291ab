"""The canonical scrub+gate projection — ONE definition shared by the
batch curation query (`curation_pipeline`), the streaming ingest path
(streaming.curation), and the scale probe, so batch/stream equivalence
and oracle parity hold by construction rather than by parallel edits.

Stateless projection + filter: map-only at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import redact as RD
from .lm_quality import tokenize


def curate_columns(
    df: DataFrame, min_tokens: int = 10, keep_cols: tuple[str, ...] = ("source",)
) -> DataFrame:
    """Adds ``clean`` (PII-redacted text) and ``n_tokens``; keeps rows
    with non-null text and at least ``min_tokens`` whitespace tokens.
    ``keep_cols`` must exist on df (the documents table carries source)."""
    return (
        df.where(F.col("text").isNotNull())
        .withColumn("clean", RD.redact_pii("text"))
        .withColumn("n_tokens", F.size(tokenize("clean")))
        .where(F.col("n_tokens") >= min_tokens)
        .select("doc_id", "lang", *keep_cols, "clean", "n_tokens")
    )
