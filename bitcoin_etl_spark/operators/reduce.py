"""Per-key last-event-wins pre-reduction.

The BCH duplicate-txid analog (reference fixture
``tests/resources/test_export_blocks_job/bitcoin_cash/block_with_duplicate_txid``)
generalized: within any batch of change events, only the highest-``seq``
event per key matters for the final state, so collapse before the merge.

Implemented as ``groupBy(key).agg(max_by(struct(payload), seq))`` rather
than a row_number window: max_by is a true aggregate, so Spark plans a
map-side partial aggregation that collapses hot keys on each input
partition *before* the shuffle — a Zipf-hot ``doc_id`` contributes one
row per upstream partition instead of flooding a single window
partition. This is the engine's primary skew defense (SURVEY.md §4),
complemented by AQE skew-join splitting for the residual shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def last_event_wins(df: DataFrame, key: str = "doc_id", seq: str = "seq") -> DataFrame:
    """Collapse to one row per key: the event with the max ``seq`` wins.

    Keeps all columns; deterministic given unique ``seq`` per key-event
    (duplicate (key, seq) pairs are identical rows by construction, so
    any winner is correct — the replayed-epoch case).
    """
    payload = [c for c in df.columns if c != key]
    agg = df.groupBy(key).agg(
        F.max_by(F.struct(*payload), F.col(seq)).alias("_latest")
    )
    return agg.select(key, "_latest.*")
