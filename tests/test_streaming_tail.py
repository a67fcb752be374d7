"""Structured Streaming tail: drain, checkpoint resume, exactly-once
under micro-batch replay (T1/T3/T5 analogs — reference
``blockchainetl/streaming/streamer.py:54-134``)."""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import types as T

from bitcoin_etl_spark.changelog import ChangeLogSpec, generate_scenario
from bitcoin_etl_spark.lake import LakeTable
from bitcoin_etl_spark.operators import EpochApplier
from bitcoin_etl_spark.schemas import DOCS_COMPARE_COLUMNS, DOCS_SCHEMA
from bitcoin_etl_spark.streaming import ChangeLogTailer
from tests.helpers import assert_docs_equal, spark_docs_to_pandas


def _payload():
    return T.StructType([f for f in DOCS_SCHEMA.fields if f.name != "_rev"])


def test_stream_drain_resume_exactly_once(spark, tmp_path):
    # 6-epoch scenario; a second 8-epoch run of the same spec provides the
    # "later" epochs + the full-log oracle for the resumed stream.
    spec6 = ChangeLogSpec(n_epochs=6, events_per_epoch=300, n_keys=400,
                          reorgs=[(3, 6)], dup_in_batch_frac=0.1)
    spec8 = ChangeLogSpec(n_epochs=8, events_per_epoch=300, n_keys=400,
                          reorgs=[(3, 6)], dup_in_batch_frac=0.1)
    d6 = str(tmp_path / "s6")
    d8 = str(tmp_path / "s8")
    generate_scenario(d6, spec6)
    generate_scenario(d8, spec8)

    table = LakeTable.create(str(tmp_path / "t"), _payload(), n_buckets=8)
    applier = EpochApplier(table, pipeline_id="stream")
    ckpt = str(tmp_path / "ckpt")

    tail = ChangeLogTailer(spark, f"{d6}/changes", applier, ckpt,
                           max_files_per_trigger=2)
    log1 = tail.run_available()
    assert log1 and not any(b.get("skipped") for b in log1)

    # live tail: two more epochs arrive (deterministic continuation)
    for e in (6, 7):
        shutil.copytree(f"{d8}/changes/epoch={e}", f"{d6}/changes/epoch={e}")

    # resume with a FRESH tailer on the same checkpoint
    applier2 = EpochApplier(table, pipeline_id="stream")
    tail2 = ChangeLogTailer(spark, f"{d6}/changes", applier2, ckpt,
                            max_files_per_trigger=2)
    log2 = tail2.run_available()
    applied_batches = {b["batch_id"] for b in log1}
    assert all(b["batch_id"] not in applied_batches for b in log2)

    actual = spark_docs_to_pandas(
        table.read_final(spark).select(*DOCS_COMPARE_COLUMNS)
    )
    expected = pd.read_parquet(f"{d8}/expected_docs.parquet")[DOCS_COMPARE_COLUMNS]
    assert_docs_equal(actual, expected)

    # crash-replay of the last micro-batch: ledger must skip it
    last = max(b["batch_id"] for b in (log1 + log2))
    sch = tail2.schema
    df = (spark.read.schema(sch).option("basePath", f"{d6}/changes")
          .parquet(f"{d6}/changes"))
    res = applier2.apply_epoch(spark, df, epoch_id=last)
    assert res["skipped"] is True
