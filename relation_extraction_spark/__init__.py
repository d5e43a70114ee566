"""relation_extraction_spark — PySpark-native knowledge-graph construction.

A from-scratch re-expression of the capabilities of
``markfarrell/relation-extraction`` (a single-node per-document
parse-and-extract compiler; see SURVEY.md §0 — the reference tree at
/root/reference was empty at survey time, so behavioral anchors cite
BASELINE.json, not reference file:line) as an idiomatic Spark lakehouse
transform:

- ``sources``    — synthetic Common-Crawl-style corpus, lakehouse
                   snapshot/manifest tables, entity dictionary.
- ``functions``  — vectorized pandas/Arrow UDF stages (html→text,
                   sentence segmentation, POS tagging, OpenIE-style
                   triple extraction, link scoring, MinHash/SimHash)
                   plus pure-column expression helpers.
- ``operators``  — distributed operators composed from DataFrame
                   primitives: entity linking, LSH canonicalization,
                   connected components, dedup family, ANN similarity,
                   salted skew joins/aggs, as-of join.
- ``plans``      — the stage DAG (ingest→extract→link→canonicalize→
                   materialize→metrics) with checkpoint/resume, and the
                   oracle-checked query registry.
- ``streaming``  — Structured Streaming twins of the batch windows.
"""

__version__ = "0.1.0"
