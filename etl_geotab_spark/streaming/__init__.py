"""Structured Streaming surface (SURVEY.md §2.7 T1-T4).

The reference is a *scheduled batch* job (``InvocationType.Schedule``,
task.ts:107) that re-pulls a full snapshot per invocation; its two
stream-shaped semantics are the 1-hour freshness horizon
(task.ts:231, 265-267 → watermark + filter, T1) and cross-invocation
state (task.ts:127-143 → keyed state store, T2). This package
re-expresses both on Spark Structured Streaming, plus the T4 window
family the north star requires.
"""

from etl_geotab_spark.streaming.jobs import (
    freshness_filter,
    run_collect_batches,
    run_foreach_batch_exactly_once,
    run_to_memory_table,
    sessionized_counts,
    stream_events,
    streaming_dedup,
    windowed_counts,
)
from etl_geotab_spark.streaming.state import user_running_stats

__all__ = [
    "freshness_filter",
    "run_foreach_batch_exactly_once",
    "streaming_dedup",
    "run_collect_batches",
    "run_to_memory_table",
    "sessionized_counts",
    "stream_events",
    "user_running_stats",
    "windowed_counts",
]
