"""Streaming windowed aggregation + custom stateful operator.

The reference has no window/stateful operators (SURVEY.md §2.9: its only
state is the cursor + keyed tables), but a CDC engine needs stream-side
observability: per-window change rates (the progress-logger analog T8,
``blockchainetl/progress_logger.py:30-83``) and per-key running
revision counts (the AtomicCounter analog A7). Both are expressed with
Structured Streaming primitives: watermark + tumbling window for late
data, and ``applyInPandasWithState`` for the custom keyed state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_change_rates(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Tumbling-window change-event rates per op type with a watermark
    for late events (T2's event-time analog): the stream-side metrics
    feed. Works identically on a batch DataFrame (same plan)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("doc_id").alias("n_keys"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "op",
            "n_events",
            "n_keys",
        )
    )


REVISION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_revisions", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)

REVISION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_revisions", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("batch_events", T.LongType()),
    ]
)


def _revision_counter(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-doc_id running revision counter across micro-batches —
    Arrow-batched keyed state (the custom stateful operator slot)."""
    if state.exists:
        n_rev, last_seq = state.get
    else:
        n_rev, last_seq = 0, -1
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        n_rev += len(pdf)
        if len(pdf):
            last_seq = max(last_seq, int(pdf["seq"].max()))
    state.update((n_rev, last_seq))
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "n_revisions": [n_rev],
            "last_seq": [last_seq],
            "batch_events": [batch_events],
        }
    )


def running_revision_counts(stream: DataFrame) -> DataFrame:
    """Stateful per-key revision counting via applyInPandasWithState."""
    return (
        stream.select("doc_id", "seq")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _revision_counter,
            outputStructType=REVISION_OUTPUT_SCHEMA,
            stateStructType=REVISION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact dedup: keep the first event per key, dropping
    at-least-once re-deliveries (the stream-side twin of the ledger's
    exactly-once and of batch ``dedup_exact`` — a training-data pipeline
    ingesting a document stream runs this before anything else).

    State is bounded by the watermark: ``dropDuplicatesWithinWatermark``
    expires a key's dedup state once the watermark passes its event
    time, so state size is O(keys per watermark window), not O(all keys
    ever) — the property that keeps this runnable forever at 100 TB.
    ``within_watermark=False`` uses plain ``dropDuplicates`` (exact
    global dedup, state grows with distinct keys — only for bounded key
    domains). Works identically on a batch DataFrame (same plan, minus
    state)."""
    keys = keys or ["doc_id", "seq"]
    out = stream.withWatermark(ts_col, watermark)
    if within_watermark:
        return out.dropDuplicatesWithinWatermark(keys)
    return out.dropDuplicates(keys)


def session_change_activity(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
    key: str = "doc_id",
) -> DataFrame:
    """Per-key SESSION-window change activity: consecutive changes to a
    key closer than ``gap`` apart merge into one session row (n_events,
    session bounds) — the stream-side burst detector for high-churn
    doc_ids (the hot-key signal the salted-repartition path consumes).
    Uses Spark's native ``session_window`` (dynamic gap-merged windows,
    state expired by the watermark so state is O(open sessions), not
    O(keys ever)); the batch twin over the same frame is
    ``ops.temporal.sessionize``, whose gap rule this matches. Works on a
    batch DataFrame identically (same plan, minus state)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
        )
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
