"""ChangeLogTailer — Structured Streaming tail over the change log.

The reference's tail loop (``blockchainetl/streaming/streamer.py:72-103``)
polls the chain head, clamps a target (reorg lag + batch size), exports a
batch, and durably advances a cursor file. Here Spark owns that loop:

* poll + cursor      → file-source ``readStream`` + ``checkpointLocation``
                       (T1/T3; the cursor file becomes the streaming
                       checkpoint's file-offset log),
* batch-size clamp   → ``maxFilesPerTrigger`` (T4, ``streamer.py:105-109``),
* at-least-once body → ``foreachBatch`` (T5) made exactly-once by the
  LakeTable ledger keyed on the *streaming* batch id: on recovery Spark
  replays the last micro-batch with the same id, and the ledger skips it.
  Source-level duplicate delivery (a replayed epoch file with the same
  ``seq`` values) is independently neutralized by versioned-upsert
  semantics (max ``_rev`` wins — same row, same revision, idempotent).
* reorg safety       → compensation D/I events in the log itself (the
  ``--lag`` alternative; SURVEY.md §2.9 T2). An optional ``lag_blocks``
  filter additionally defers the mutable head in batch replays.

Two dedup layers on purpose: ledger for sink replays, ``_rev`` for source
replays — together they give end-to-end exactly-once effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql import types as T

from ..operators.apply import EpochApplier
from ..schemas import CHANGES_SCHEMA


def _with_epoch(schema: T.StructType) -> T.StructType:
    """File layout is `changes/epoch=K/part-*.parquet`; `epoch` is a
    directory-partition column, declared in the read schema."""
    if "epoch" in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField("epoch", T.LongType(), True)]
    )


class ChangeLogTailer:
    def __init__(
        self,
        spark: SparkSession,
        changes_dir: str,
        applier: EpochApplier,
        checkpoint_dir: str,
        schema: T.StructType = CHANGES_SCHEMA,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.changes_dir = changes_dir
        self.applier = applier
        self.checkpoint_dir = checkpoint_dir
        self.schema = _with_epoch(schema)
        self.max_files_per_trigger = max_files_per_trigger
        self.batch_log: list[dict] = []

    def _source(self) -> DataFrame:
        r = self.spark.readStream.schema(self.schema)
        if self.max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return r.option("basePath", self.changes_dir).parquet(self.changes_dir)

    def _apply_batch(self, df: DataFrame, batch_id: int) -> None:
        res = self.applier.apply_epoch(df.sparkSession, df, int(batch_id))
        self.batch_log.append({"batch_id": int(batch_id), **res})

    def start(self, processing_time: str | None = None,
              available_now: bool = False) -> StreamingQuery:
        w = (
            self._source()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        elif processing_time:
            w = w.trigger(processingTime=processing_time)
        return w.start()

    def run_available(self, timeout_s: int = 600) -> list[dict]:
        """Drain everything currently in the log, then stop (the batch
        backfill entry — `export_all` analog, but through the same code
        path as the live tail)."""
        q = self.start(available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        return self.batch_log
