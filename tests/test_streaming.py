"""Structured Streaming semantics (SURVEY.md §2.7 T1-T4).

Strategy: file-source streams drained with Trigger.AvailableNow.
Complete-mode window aggregates must equal the batch answer on the
same data (determinism ⇒ oracle-checkable); the watermark test feeds
two files in order (maxFilesPerTrigger=1) and asserts the too-late
event is dropped; the stateful test checks keyed state accumulates
across micro-batches.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from etl_geotab_spark.io import load_table
from etl_geotab_spark.streaming import (
    freshness_filter,
    run_collect_batches,
    run_to_memory_table,
    sessionized_counts,
    stream_events,
    user_running_stats,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _ts(h: int, m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


def _write_events(spark, path: str, rows: list[tuple], mtime: float) -> None:
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_streaming_tumbling_equals_batch(spark):
    stream = stream_events(spark, SF_DIR)
    assert stream.isStreaming
    got = run_to_memory_table(windowed_counts(stream, "5 minutes")).collect()
    want = windowed_counts(load_table(spark, SF_DIR, "events"), "5 minutes").collect()
    assert sorted((r.window_start, r.n, r.total_value) for r in got) == sorted(
        (r.window_start, r.n, r.total_value) for r in want
    )


def test_streaming_session_equals_batch(spark):
    stream = stream_events(spark, SF_DIR)
    got = run_to_memory_table(sessionized_counts(stream)).collect()
    want = sessionized_counts(load_table(spark, SF_DIR, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_watermark_drops_late_event(spark, tmp_path):
    """Feed two files in order: file2 contains an event older than the
    watermark established by file1 — it must not appear in any update."""
    src = str(tmp_path / "events_src")
    now = time.time()
    # three files ordered by mtime; maxFilesPerTrigger=1 → one micro-batch
    # each. Spark advances the watermark with a one-batch lag (batch N
    # uses event-time stats from batches < N), so the late row arrives
    # two batches after the event that establishes the 10:50 watermark.
    _write_events(
        spark,
        src,
        [
            (0, _ts(10, 0), 1, 1.0),
            (1, _ts(10, 5), 1, 1.0),
            (2, _ts(11, 0), 1, 1.0),  # ⇒ watermark 10:50 after this batch
        ],
        now - 100,
    )
    _write_events(spark, os.path.join(src, "b2"), [(4, _ts(11, 5), 1, 1.0)], now - 70)
    _write_events(
        spark,
        os.path.join(src, "b3"),
        [
            (3, _ts(10, 2), 1, 100.0),  # LATE: window end 10:10 < watermark
            (5, _ts(11, 6), 1, 1.0),
        ],
        now - 40,
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = windowed_counts(stream, "10 minutes", watermark="10 minutes")
    batches = run_collect_batches(agg, output_mode="update")
    assert len(batches) >= 3
    # across ALL updates, the 10:00 window must never count the late event
    for _bid, rows in batches:
        for r in rows:
            if r.window_start == _ts(10, 0):
                assert r.n == 2, f"late event leaked into 10:00 window: {r}"
                assert r.total_value == 2.0
    # ...but the on-time row in the same late file IS counted
    final_11 = [
        r for _bid, rows in batches for r in rows if r.window_start == _ts(11, 0)
    ]
    assert final_11 and final_11[-1].n == 3


def test_freshness_filter_batch_and_stream(spark):
    ev = load_table(spark, SF_DIR, "events")
    # batch: everything in the 2024 fixture is older than now-1h → empty
    assert freshness_filter(ev).count() == 0
    # stream: becomes a watermark node
    s = freshness_filter(stream_events(spark, SF_DIR))
    assert s.isStreaming
    assert "EventTimeWatermark" in s._jdf.queryExecution().analyzed().toString()


def test_stateful_user_stats_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "ev")
    now = time.time()
    _write_events(
        spark, src, [(0, _ts(10, 0), 7, 1.5), (1, _ts(10, 1), 7, 2.5)], now - 100
    )
    _write_events(
        spark,
        os.path.join(src, "b2"),
        [(2, _ts(10, 2), 7, 4.0), (3, _ts(10, 3), 8, 10.0)],
        now - 50,
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    batches = run_collect_batches(user_running_stats(stream), output_mode="update")
    assert len(batches) == 2
    final = {r.user_id: r for _bid, rows in batches for r in rows}
    # user 7 accumulated across both micro-batches
    assert final[7].n_events == 3
    assert final[7].total_value == pytest.approx(8.0)
    assert final[7].last_ts == _ts(10, 2)
    assert final[8].n_events == 1


def test_stream_stream_join_equals_batch(spark):
    from etl_geotab_spark.streaming.jobs import stream_stream_join

    got = run_to_memory_table(
        stream_stream_join(stream_events(spark, SF_DIR)), output_mode="append"
    ).collect()
    want = stream_stream_join(load_table(spark, SF_DIR, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert got  # non-trivial: fixture has signup→purchase sequences


def test_foreach_batch_exactly_once_replay(spark, tmp_path):
    """The idempotent per-batch-directory sink survives a replay: run
    the same AvailableNow drain twice with the SECOND run given a
    fresh checkpoint (forcing every batch to replay) — output rows are
    identical, not doubled."""
    from etl_geotab_spark.io import load_table
    from etl_geotab_spark.streaming.jobs import run_foreach_batch_exactly_once

    src_dir = str(tmp_path / "src")
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "value")
        .limit(500)
    )
    # two source files → two micro-batches under maxFilesPerTrigger=1
    ev.repartition(2).write.parquet(src_dir)

    def stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )

    out = str(tmp_path / "out")
    run_foreach_batch_exactly_once(stream(), out, str(tmp_path / "ck1"))
    first = sorted(
        map(tuple, spark.read.parquet(out).drop("batch_id").collect())
    )
    # fresh checkpoint → the engine replays every batch from scratch;
    # idempotent per-batch dirs must absorb the replay, not double rows
    run_foreach_batch_exactly_once(stream(), out, str(tmp_path / "ck2"))
    second = sorted(
        map(tuple, spark.read.parquet(out).drop("batch_id").collect())
    )
    assert first == second and len(first) == 500


def test_tws_gated(spark):
    """transformWithStateInPandas is gated on protobuf availability:
    in this container HAS_TWS is False and the operator raises with a
    pointer to the supported fallback; where protobuf exists it must
    produce the same totals as user_running_stats (exercised only in
    such environments)."""
    import pytest

    from etl_geotab_spark.streaming import state as st
    from etl_geotab_spark.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(10)
    if not st.HAS_TWS:
        with pytest.raises(RuntimeError, match="protobuf"):
            st.user_running_stats_tws(ev)
    else:  # pragma: no cover - exercised only where protobuf exists
        df = st.user_running_stats_tws(ev)
        assert set(df.columns) == {"user_id", "n_events", "total_value"}


def test_streaming_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key even when
    the duplicates arrive in DIFFERENT micro-batches (the case plain
    per-batch dedup misses)."""
    import datetime as dt

    from etl_geotab_spark.streaming.jobs import streaming_dedup

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    batch1 = [(1, 100, "click", base)]
    batch2 = [(2, 100, "click", base + dt.timedelta(minutes=1)),  # dup key
              (3, 200, "view", base + dt.timedelta(minutes=2))]
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    src = str(tmp_path / "src")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_dedup(stream, ["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    name = "dedup_xbatch"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        map(tuple, spark.table(name).collect())
    )
    assert rows == [(100, "click"), (200, "view")]


def test_stream_events_directory_shaped_fixture(spark, tmp_path):
    """A Spark-written fixture is a DIRECTORY of part files, and the
    file stream source does not descend into a linked subdirectory:
    before the r15 fix, stream_events linked the directory itself and
    the source listed ZERO files — every downstream drain returned an
    empty (not failed) result. Silent-empty is the worst failure
    shape, so the guard is: a directory-shaped events fixture must
    stream exactly the rows the batch path reads."""
    sf_dir = str(tmp_path / "sfdir")
    os.makedirs(sf_dir)
    src = load_table(spark, SF_DIR, "events")
    # multi-part directory, like the 10x stress replicas
    src.repartition(3).write.parquet(os.path.join(sf_dir, "events.parquet"))
    got = run_to_memory_table(
        windowed_counts(stream_events(spark, sf_dir), "5 minutes")
    )
    want = windowed_counts(load_table(spark, sf_dir, "events"), "5 minutes")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    n_streamed = got.agg(F.sum("n")).collect()[0][0]
    assert n_streamed == src.count()
    # Regenerating the fixture rewrites the directory with NEW part
    # names; the old generation's links dangle in the watch dir and
    # the source would list and then fail on them. stream_events must
    # prune dangling links so a regenerated fixture streams cleanly.
    src.repartition(2).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    got2 = run_to_memory_table(
        windowed_counts(stream_events(spark, sf_dir), "5 minutes")
    )
    assert got2.agg(F.sum("n")).collect()[0][0] == src.count()
