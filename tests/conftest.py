"""Shared pytest fixtures (SURVEY.md §5).

One SparkSession for the whole test run (local[8], small shuffle
partition count — fixture data is tiny; scale behavior is exercised by
bench.py / scripts/scaling_bench.py, not pytest).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from relation_extraction_spark.session import get_spark

    s = get_spark(app_name="kg-pytest", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
