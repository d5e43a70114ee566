"""The binding per-row invariant (BASELINE.json:L15): extracted text is
byte-identical to the stored ``text`` column per url — plus generator
determinism across parallelism levels (SURVEY.md §5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from relation_extraction_spark.functions.htmltext import extract_text
from relation_extraction_spark.sources.corpus import synthetic_pages

from .oracle import golden_pages, golden_text

N = 300


def test_extract_text_byte_identity(spark):
    pages = synthetic_pages(spark, N, seed=42, skew=0.1, dup_frac=0.05)
    bad = (
        pages.withColumn("text2", extract_text("html"))
        .filter(F.col("text2") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extraction_matches_python_oracle(spark):
    """Spark UDF output == pure-Python golden extraction, url by url."""
    pages = synthetic_pages(spark, N, seed=42, skew=0.1, dup_frac=0.0)
    got = {
        r["url"]: r["text2"]
        for r in pages.withColumn("text2", extract_text("html"))
        .select("url", "text2")
        .collect()
    }
    want = golden_text(golden_pages(N, seed=42, skew=0.1, dup_frac=0.0))
    assert got == want


def test_generator_partition_invariance(spark):
    """Same corpus regardless of parallelism (parts=2 vs parts=8)."""
    a = synthetic_pages(spark, N, seed=7, dup_frac=0.05, parts=2)
    b = synthetic_pages(spark, N, seed=7, dup_frac=0.05, parts=8)
    cols = ["url", "warc_ts", "text", "lang"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
