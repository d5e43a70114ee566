"""T7 — custom ``applyInPandasWithState`` sessionizer (streaming/stateful.py).

Semantic pins:
- NoTimeout contract: the emitted set is EXACTLY the batch session set
  minus each key's last session (only a later event closes a session) —
  cross-checked against the NATIVE ``F.session_window`` in batch mode.
- Micro-batch-split invariance: 1 batch and 3 time-ordered batches emit
  the same set (state carries open sessions across batches).
- EventTimeTimeout: idle sessions flush once the watermark passes
  ``s_end + gap`` — the emitted set grows beyond the data-closed set but
  never invents a session that batch sessionization doesn't have.

The DuckDB value-hash gate for the registry entry lives in
tests/test_parity.py (stream_stateful_sessionize).
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from relation_extraction_spark.streaming.jobs import (
    EVENTS_SCHEMA,
    run_available_now_memory,
)
from relation_extraction_spark.streaming.stateful import sessionize_stateful

FIXTURE = "/root/testdata/sf0.001/events.parquet"
GAP_MIN = 30

_sink_seq = iter(range(10_000))


def _run(out_stream):
    return run_available_now_memory(
        out_stream, f"t7_sink_{next(_sink_seq)}", output_mode="update"
    )


def _norm(df):
    """(user_id, s_start, s_end, n, round(sum,2)) tuples, second precision."""
    return sorted(
        map(
            tuple,
            df.select(
                "user_id",
                F.date_format("s_start", "yyyy-MM-dd HH:mm:ss").alias("a"),
                F.date_format("s_end", "yyyy-MM-dd HH:mm:ss").alias("b"),
                "n",
                F.round("sum_value", 2).alias("s"),
            ).collect(),
        )
    )


def _batch_sessions(spark):
    """ALL sessions via the native primitive: session_window end = last
    event ts + gap, so s_end = w.end - gap."""
    ev = (
        spark.read.parquet(FIXTURE)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        ev.groupBy(
            F.session_window("ts", f"{GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            (F.col("w.end") - F.expr(f"INTERVAL {GAP_MIN} MINUTES")).alias(
                "s_end"
            ),
            "n",
            "sum_value",
        )
    )


def _all_but_last(spark):
    s = _batch_sessions(spark)
    w = Window.partitionBy("user_id").orderBy(F.desc("s_start"))
    return (
        s.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > 1)
        .drop("_rk")
    )


def _chunked_src(spark, tmp_path, n_chunks=3):
    """The fixture split into n time-ordered files with strictly
    increasing mtimes, so FileStreamSource + maxFilesPerTrigger=1 replays
    the stream in event-time order across micro-batches."""
    import glob
    import shutil

    d = tmp_path / "events_chunks"
    d.mkdir()
    ev = spark.read.parquet(FIXTURE)
    n = ev.count()
    ranked = ev.withColumn(
        "_rk", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    step = (n + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        scratch = str(tmp_path / f"_scratch_{i}")
        (
            ranked.filter(
                (F.col("_rk") > i * step) & (F.col("_rk") <= (i + 1) * step)
            )
            .drop("_rk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(scratch)
        )
        p = str(d / f"chunk-{i:03d}.parquet")
        shutil.move(glob.glob(f"{scratch}/part-*.parquet")[0], p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    return str(d)


def test_emits_all_but_last_sessions(spark):
    # single file -> single availableNow micro-batch (dir + glob filter:
    # the exact shape the registry query uses against the driver's sf dir)
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    got = _norm(_run(sessionize_stateful(ev, gap_minutes=GAP_MIN)))
    want = _norm(_all_but_last(spark))
    assert got == want
    assert len(got) > 0


def test_micro_batch_split_invariant(spark, tmp_path):
    src = _chunked_src(spark, tmp_path)
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = _norm(_run(sessionize_stateful(ev, gap_minutes=GAP_MIN)))
    want = _norm(_all_but_last(spark))
    assert got == want


def test_event_time_timeout_flushes_idle_sessions(spark, tmp_path):
    src = _chunked_src(spark, tmp_path)
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = _norm(
        _run(
            sessionize_stateful(
                ev, gap_minutes=GAP_MIN, timeout=True, watermark="1 minute"
            )
        )
    )
    data_closed = set(_norm(_all_but_last(spark)))
    all_sessions = set(_norm(_batch_sessions(spark)))
    got_set = set(got)
    assert len(got) == len(got_set)  # each session emitted exactly once
    # every data-provable session still emitted, nothing invented, and
    # the watermark flushed at least one idle (per-key-last) session
    assert data_closed <= got_set <= all_sessions
    assert len(got_set) > len(data_closed)
