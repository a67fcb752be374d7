"""Kafka transport parity (S8 sink / S14 source), offline-testable.

The reference's production transport is Kafka: ``KafkaItemExporter``
JSON-encodes each item dict and sends it to a per-item-type topic
(reference ``blockchainetl/jobs/exporters/kafka_exporter.py:28-46``),
with the topic map fixed in ``bitcoinetl/streaming/streaming_utils.py:22-26``
and ClickHouse tailing the topics with a Kafka engine + materialized view
(reference ``command/ClickHouse:104-128``).

Spark-first re-expression: a Kafka record is a (key, value, topic) frame;
``encode_frames`` builds it with ``to_json(struct(*))`` (JSONEachRow —
the exact wire format the reference produces and ClickHouse consumes) and
``decode_frames`` inverts it with ``from_json``, so the encode→decode
round trip is testable without a broker. The reader/writer option
builders produce the exact ``spark.readStream.format("kafka")`` /
``writeStream.format("kafka")`` configs; only the final ``.format("kafka")``
needs the spark-sql-kafka connector jar (absent in this sandbox), so the
sink/source constructors are gated and everything up to them is tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# reference streaming_utils.py:22-26
ITEM_TYPE_TO_TOPIC = {
    "block": "blocks",
    "transaction": "transactions",
    "input_output": "inputs_outputs",
}

# reference kafka_exporter.py:17 (max_request_size=99000000)
MAX_REQUEST_SIZE = 99_000_000


def parse_kafka_output(output: str) -> str:
    """'kafka/127.0.0.1:9092' → bootstrap servers (reference
    ``kafka_exporter.get_connection_url``, same format contract)."""
    parts = output.split("/")
    if len(parts) < 2 or parts[0] != "kafka" or not parts[1]:
        raise ValueError(
            'Invalid kafka output param, it should be in format of '
            '"kafka/127.0.0.1:9092"'
        )
    return parts[1]


def encode_frames(df: DataFrame, item_type: str,
                  topic_map: dict[str, str] | None = None,
                  key_col: str = "item_id") -> DataFrame:
    """Item rows → Kafka frames: value = JSON of the full row (the
    reference's ``json.dumps(item)``), key = item_id (P13 PK — gives
    per-key partition affinity so a downstream compacted topic or
    per-partition consumer sees revisions in order), topic from the
    item-type map. Pure Column expressions — one narrow map."""
    topics = topic_map or ITEM_TYPE_TO_TOPIC
    if item_type not in topics:
        raise KeyError(
            f'Topic for item type "{item_type}" is not configured.'
        )
    key = (
        F.col(key_col).cast("string").cast("binary")
        if key_col in df.columns
        else F.lit(None).cast("binary")
    )
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*df.columns)).cast("binary").alias("value"),
        F.lit(topics[item_type]).alias("topic"),
    )


def decode_frames(frames: DataFrame, schema: T.StructType) -> DataFrame:
    """Kafka frames → typed item rows (the ClickHouse Kafka-engine +
    JSONEachRow consumer re-expressed: ``from_json`` with the declared
    schema, reference ``command/ClickHouse:104-128``)."""
    return frames.select(
        F.from_json(F.col("value").cast("string"), schema).alias("v")
    ).select("v.*")


def writer_options(output: str, *, checkpoint_dir: str | None = None
                   ) -> dict[str, str]:
    """writeStream.format('kafka') option set; topic comes per-row from
    the frame's ``topic`` column (composite routing, S7)."""
    opts = {
        "kafka.bootstrap.servers": parse_kafka_output(output),
        "kafka.max.request.size": str(MAX_REQUEST_SIZE),
    }
    if checkpoint_dir:
        opts["checkpointLocation"] = checkpoint_dir
    return opts


def reader_options(output: str, topics: list[str] | None = None, *,
                   starting_offsets: str = "earliest",
                   max_offsets_per_trigger: int | None = None
                   ) -> dict[str, str]:
    """readStream.format('kafka') option set — subscribe to the item
    topics with a batch-size bound (T4 analog: ``maxOffsetsPerTrigger``
    is the Kafka-source form of the tailer's maxFilesPerTrigger)."""
    opts = {
        "kafka.bootstrap.servers": parse_kafka_output(output),
        "subscribe": ",".join(topics or sorted(ITEM_TYPE_TO_TOPIC.values())),
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_source(spark: SparkSession, output: str, **kwargs) -> DataFrame:
    """Live Kafka readStream (needs the spark-sql-kafka connector jar —
    not present in this sandbox; everything upstream of this call is
    broker-free and tested)."""
    r = spark.readStream.format("kafka")
    for k, v in reader_options(output, **kwargs).items():
        r = r.option(k, v)
    return r.load()


def kafka_sink(frames: DataFrame, output: str, checkpoint_dir: str):
    """Live Kafka writeStream for encoded frames (same jar gate)."""
    w = frames.writeStream.format("kafka")
    for k, v in writer_options(output, checkpoint_dir=checkpoint_dir).items():
        w = w.option(k, v)
    return w
