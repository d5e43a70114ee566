"""Streaming analogues (SURVEY.md §2.9): the same transform must produce
identical results in batch and in streaming (availableNow over the same
files), and the T6 incremental-extract checkpoint must make re-runs
process only new files."""

from __future__ import annotations

import shutil

from relation_extraction_spark.streaming.jobs import (
    EVENTS_SCHEMA,
    dedup_events,
    incremental_extract,
    read_event_stream,
    run_available_now_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


def _events_dir(spark, tmp_path) -> str:
    """sf0.001 events fixture rewritten as a multi-file stream source."""
    d = str(tmp_path / "events_src")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_windowed_aggs_stream_equals_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(src)
    for i, fn in enumerate([tumbling_counts, sliding_counts, session_counts]):
        stream = read_event_stream(spark, src)
        got = run_available_now_memory(fn(stream), f"t_win_{i}", "complete")
        assert _rows(got) == _rows(fn(batch)), fn.__name__


def test_stateful_dedup_stream_equals_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    # duplicate every file's contents once -> exact dup event_ids
    dup = str(tmp_path / "events_dup")
    base = spark.read.schema(EVENTS_SCHEMA).parquet(src)
    base.unionAll(base).repartition(6).write.mode("overwrite").parquet(dup)

    stream = dedup_events(read_event_stream(spark, dup))
    got = run_available_now_memory(
        stream.groupBy("event_id").agg({"*": "count"}), "t_dedup", "complete"
    )
    n_ids = base.select("event_id").distinct().count()
    rows = got.collect()
    assert len(rows) == n_ids
    assert all(r[1] == 1 for r in rows), "an event_id survived twice"


def test_incremental_extract_checkpoint(spark, tmp_path):
    """T6: second run with the same checkpoint only processes NEW pages."""
    from relation_extraction_spark.operators.extract import triples_from_pages
    from relation_extraction_spark.sources.corpus import synthetic_pages

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")

    first = synthetic_pages(spark, 40, seed=1, dup_frac=0.0)
    first.repartition(2).write.mode("overwrite").parquet(pages_dir)
    incremental_extract(spark, pages_dir, out_dir, ckpt)
    got1 = _rows(spark.read.parquet(out_dir))
    want1 = _rows(triples_from_pages(first))
    assert got1 == want1 and len(got1) > 0

    # append a second batch of pages (new files, distinct urls)
    second = synthetic_pages(spark, 40, seed=2, dup_frac=0.0)
    second.repartition(2).write.mode("append").parquet(pages_dir)
    incremental_extract(spark, pages_dir, out_dir, ckpt)
    got2 = _rows(spark.read.parquet(out_dir))
    want2 = _rows(
        triples_from_pages(first.unionByName(second))
    )
    # exactly-once: no triple from the first batch is duplicated
    assert got2 == want2

    # a THIRD run with nothing new appends nothing
    incremental_extract(spark, pages_dir, out_dir, ckpt)
    assert _rows(spark.read.parquet(out_dir)) == want2
    shutil.rmtree(ckpt, ignore_errors=True)


def test_incremental_clean_dedups_across_batches(spark, tmp_path):
    """Streaming mixture-cleaning twin: quality filter + content
    fingerprint dedup hold ACROSS micro-batch runs — a duplicate
    arriving in a later batch is dropped by checkpointed state, and
    re-running with no new files appends nothing (exactly-once)."""
    import shutil

    from relation_extraction_spark.streaming.jobs import incremental_clean

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt_clean")
    good = (
        "the quick brown fox jumps over the lazy dog and then walks on "
        "through the quiet town for a while watching all of it go by "
        "with his friends from the old mill house by the river bend"
    )
    batch1 = spark.createDataFrame(
        [
            (0, good, "en", "web", len(good)),
            (1, "too short", "en", "web", 9),
            (2, good + " extra tail words here", "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    batch1.write.mode("overwrite").parquet(docs_dir)
    incremental_clean(spark, docs_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    ids1 = {r.doc_id for r in got1.collect()}
    assert ids1 == {0, 2}  # doc 1 fails the quality filter
    assert set(got1.columns) >= {"doc_id", "reasons", "fingerprint"}

    # batch 2: doc 10 duplicates doc 0's CONTENT (different id) -> the
    # checkpointed fingerprint state drops it; doc 11 is new
    batch2 = spark.createDataFrame(
        [
            (10, good, "en", "web", len(good)),
            (11, good + " genuinely different ending for this one", "en", "web", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    batch2.write.mode("append").parquet(docs_dir)
    incremental_clean(spark, docs_dir, out_dir, ckpt)
    ids2 = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert ids2 == {0, 2, 11}

    # third run, nothing new -> nothing appended
    incremental_clean(spark, docs_dir, out_dir, ckpt)
    assert {r.doc_id for r in spark.read.parquet(out_dir).collect()} == ids2
    shutil.rmtree(ckpt, ignore_errors=True)
