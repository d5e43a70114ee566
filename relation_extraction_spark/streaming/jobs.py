"""T1-T6 — windowed/stateful streaming jobs over the events shape, plus
the incremental micro-batch twin of the batch extract stage (T6).

Scale notes (SURVEY.md §2.9):
- Every transform here is also a valid BATCH transform: the same
  Catalyst plan runs in both modes, so correctness is oracle-checkable
  in batch (plans/queries.py window_tumbling_1h etc.) while the
  streaming twin adds watermarks + state.
- ``Trigger.AvailableNow`` drains whatever files exist and stops —
  the lakehouse-friendly incremental-ingest pattern: state (which files
  are done) lives in the checkpoint, mirroring the batch pipeline's
  snapshot-manifest resume (sources/lakehouse.py).
- Watermarks bound state size at scale: a 10^12-row stream with
  unbounded window state OOMs; `withWatermark` lets Spark drop state
  for windows the event-time clock has passed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an events-shaped parquet directory."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _with_event_time(events: DataFrame, watermark: str | None) -> DataFrame:
    # events.ts may load as TIMESTAMP_NTZ; watermarks want TIMESTAMP
    # (session TZ is pinned UTC so the cast is an identity relabel).
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """T1 — events per (window, event_type) tumbling bucket."""
    return (
        _with_event_time(events, watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """T2 — sliding-window counts (each event lands in window/slide buckets)."""
    return (
        _with_event_time(events, watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """T3 — per-user sessions closed by a ``gap`` of inactivity."""
    return (
        _with_event_time(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "user_id",
            "n",
        )
    )


def late_event_filter_batch(
    events: DataFrame,
    delay: str = "30 minutes",
    arrival_col: str = "event_id",
) -> DataFrame:
    """T4 batch twin of the watermark's late-event drop, for ORACLE
    verification: arrival order is modeled by ``arrival_col``, the
    watermark is the running max event time over arrivals minus
    ``delay``, and an event older than the watermark at its arrival is
    dropped — exactly Spark's ``withWatermark`` admission rule.

    Scale note: the true streaming operator keeps O(1) watermark state
    per partition; this batch twin needs a TOTAL arrival order (single-
    partition running-max window), so it exists to make T4 semantics
    DuckDB-checkable at fixture scale, not as a 100-TB batch operator —
    production late-data handling is ``withWatermark`` on the stream
    (tumbling_counts/session_counts above, tests/test_streaming.py).
    """
    from pyspark.sql import Window

    w = (
        Window.orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        df.withColumn("_wm_max", F.max("ts").over(w))
        .filter(F.col("ts") >= F.col("_wm_max") - F.expr(f"INTERVAL {delay}"))
        .drop("_wm_max")
    )


def dedup_events(
    events: DataFrame, watermark: str | None = "2 hours"
) -> DataFrame:
    """T5 — exactly-once by event_id. In streaming the watermark bounds
    the dedup state; in batch this is a plain dropDuplicates."""
    df = _with_event_time(events, watermark)
    if df.isStreaming and watermark is not None:
        return df.dropDuplicatesWithinWatermark(["event_id"])
    return df.dropDuplicates(["event_id"])


def run_available_now(
    df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Drain all currently-available input and stop (T6 trigger). The
    checkpoint makes re-runs incremental: already-seen files are skipped,
    exactly-once into the sink."""
    q = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain to an in-memory table (test/debug sink); returns the result
    as a batch DataFrame."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def incremental_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    lang: str = "en",
) -> None:
    """T6 — the streaming twin of the batch extract stage: watch a
    web_pages parquet directory, segment + extract triples over each new
    micro-batch (the SAME mapInPandas transforms as batch — zero shuffle,
    unbounded-stateless, so it streams safely at any scale), append to a
    triples parquet sink. Re-running with the same checkpoint processes
    only files added since the last run.
    """
    from ..operators.extract import sentences_from_pages, triples_from_sentences

    pages = spark.readStream.schema(
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ).parquet(pages_dir)
    triples = triples_from_sentences(sentences_from_pages(pages, lang=lang))
    run_available_now(triples, out_dir, checkpoint_dir, output_mode="append")


def incremental_clean(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """The streaming twin of the mixture CLEANING plane (plans/
    mixture.py): watch a documents parquet directory and, per
    micro-batch, quality-filter (same Gopher rules as batch) and
    exact-dedup by content fingerprint, appending survivors + their
    audit columns to a parquet sink. Re-running with the same
    checkpoint processes only files added since the last run
    (exactly-once, like incremental_extract).

    Semantics note: ``dropDuplicates`` on a stream keeps state per
    fingerprint FOREVER (no event-time column exists on documents), so
    the incremental form deduplicates across ALL micro-batches ever
    seen — exactly what a continuously-ingesting cleaning pipeline
    wants, with state bounded by the count of DISTINCT clean documents
    (at 100 TB, bound it by sharding the stream on fingerprint prefix
    or adding an ingest-time watermark column; the batch pipeline
    remains the backfill path).
    """
    from ..functions.textstats import quality_filter_exprs
    from ..operators.dedup import normalize_text_expr

    docs = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(docs_dir)
    keep, reasons = quality_filter_exprs("text", "lang")
    cleaned = (
        docs.withColumn("keep", keep)
        .withColumn("reasons", reasons)
        .filter(F.col("keep"))
        .withColumn("fingerprint", F.md5(normalize_text_expr("text")))
        .dropDuplicates(["fingerprint"])
        .drop("keep")
    )
    run_available_now(cleaned, out_dir, checkpoint_dir, output_mode="append")
