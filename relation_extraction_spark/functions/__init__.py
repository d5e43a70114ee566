"""Vectorized UDF stages + pure-column expression helpers.

Each module exposes (a) a pure-Python deterministic core, used both by the
pandas-UDF wrappers and by the single-node golden-fixture oracle in tests
(SURVEY.md §5.2), and (b) Spark-facing wrappers (pandas_udf / mapInPandas /
Column expressions).
"""
