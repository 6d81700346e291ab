from . import (  # noqa: F401
    ann,
    dedup,
    islands,
    nearest_centroid,
    similarity,
    topk,
    upsert,
)
