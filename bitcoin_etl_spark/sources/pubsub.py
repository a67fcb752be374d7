"""Google Pub/Sub sink shape (S9), offline-testable.

Reference ``blockchainetl/jobs/exporters/google_pubsub_item_exporter.py``
(wired in ``streaming_utils.py:8-18``): JSON message data per item, topic
``<prefix>.blocks`` / ``<prefix>.transactions``, and ``item_id`` carried
as a MESSAGE ATTRIBUTE for subscriber-side dedup/ordering. No Pub/Sub
client or connector exists in this sandbox, so this module produces the
exact message frames — (data bytes, attributes map, topic) — as a
DataFrame; a publisher (Dataflow/Beam connector or a foreachPartition
client loop) consumes them unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MESSAGE_ATTRIBUTES = ("item_id",)  # reference streaming_utils.py:16


def topic_for(output_prefix: str, item_type: str) -> str:
    """'projects/p/topics/crypto_bitcoin' + 'block' →
    'projects/p/topics/crypto_bitcoin.blocks' (reference
    streaming_utils.py:11-14)."""
    return f"{output_prefix}.{item_type}s"


def encode_messages(df: DataFrame, item_type: str,
                    output_prefix: str) -> DataFrame:
    """Item rows → Pub/Sub message frames: data = JSON of the row,
    attributes = {item_id} (P13 PK as routing/dedup attribute), topic
    fixed per type. Pure Column expressions."""
    attrs = F.create_map(
        *[x for a in MESSAGE_ATTRIBUTES
          for x in (F.lit(a), F.col(a).cast("string"))]
    )
    return df.select(
        F.to_json(F.struct(*df.columns)).cast("binary").alias("data"),
        attrs.alias("attributes"),
        F.lit(topic_for(output_prefix, item_type)).alias("topic"),
    )
