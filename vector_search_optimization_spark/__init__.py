"""PySpark-native analytics engine with the query and data-processing
capabilities of CarolinaTorrente/Vector-Search-Optimization.

The reference is a pandas/numpy/sklearn/networkx vector-search analytics
pipeline (see SURVEY.md). This package re-expresses every operator it uses
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Arrow-batched pandas UDFs only where built-ins genuinely can't express the
semantics (per-group sklearn kernels, BLAS nearest-centroid).

Layout
------
- ``session``    : SparkSession builder tuned for local[N] and cluster runs.
- ``schemas``    : explicit StructTypes for all boundary tables (SURVEY §1.2).
- ``sources``    : readers/writers incl. the keyed-upsert sink (S11).
- ``functions``  : scalar/array kernels — vector math, text analysis.
- ``operators``  : relational + vector + ML operators (SURVEY §2).
- ``plans``      : end-to-end pipelines (EP1–EP3 equivalents).
- ``streaming``  : Structured Streaming extensions over the events table.
"""

__version__ = "0.1.0"
