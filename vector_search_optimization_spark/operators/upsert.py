"""Keyed upsert (SURVEY §2.1 S11).

Reference: Azure AI Search ``merge_documents`` — partial update of selected
fields by document key (ChunkLabelingProcesor.py:47-50,
update-etiquetas.ipynb:171 c9). Plain parquet has no MERGE INTO, so the
engine implements upsert as a left join + coalesce: rows present in the
updates table get the new field values, everything else passes through.

Scale: the updates side is usually small (per-cluster label writeback →
k rows) → broadcast join, no shuffle of the base table. For fact-sized
updates the same plan degrades gracefully to a shuffled hash join on the
key. On a Delta/Iceberg lakehouse this maps 1:1 to MERGE INTO — swap the
sink, keep the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_fields(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    update_cols: list[str] | None = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """merge_documents semantics: per-key partial field update.

    ``update_cols`` defaults to every non-key column of ``updates``. A NULL
    in the updates table means "no change" (coalesce keeps the base value),
    matching merge_documents' treatment of absent fields. Keys in
    ``updates`` that don't exist in ``base`` are ignored (merge_documents
    would fail them; the engine's audit queries surface them instead).
    """
    update_cols = update_cols or [c for c in updates.columns if c != key_col]
    missing = set(update_cols) - set(base.columns)
    if missing:
        raise ValueError(f"update columns not in base table: {sorted(missing)}")

    renamed = updates.select(
        key_col, *[F.col(c).alias(f"__new_{c}") for c in update_cols]
    )
    if broadcast_updates:
        renamed = F.broadcast(renamed)
    joined = base.join(renamed, key_col, "left")
    out = [
        F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
        if c in update_cols
        else F.col(c)
        for c in base.columns
    ]
    return joined.select(*out)
