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


def salted_reduce(df: DataFrame, key: str, agg_fn, n_salts: int = 16,
                  seq: str = "seq") -> DataFrame:
    """Explicit two-phase salted reduction for SKEWED keys whose
    aggregate does NOT partial-aggregate well (wide buffers, e.g.
    ``collect_list``, or UDAFs): phase 1 reduces per (key, salt) — the
    hot key's rows spread over ``n_salts`` reducers — phase 2 merges the
    ≤ n_salts partials per key.

    ``agg_fn(gdf)`` must be an ALGEBRAIC aggregation (applicable to both
    raw rows and its own partials — max_by/min/max/sum-style) applied to
    a GroupedData; for last-event-wins pass
    ``lambda g: g.agg(F.max_by(F.struct(...), F.col(seq)).alias(...))``.

    For aggregates Spark already partial-aggregates (max_by here),
    prefer plain ``last_event_wins`` — the map-side partial phase IS the
    salting, done by the engine. This operator exists for the residual
    class and as the explicit SURVEY §4 skew tool."""
    salt = F.pmod(F.xxhash64(F.col(seq)), F.lit(n_salts)).alias("_salt")
    phase1 = agg_fn(df.withColumn("_salt", salt).groupBy(key, "_salt"))
    return agg_fn(phase1.drop("_salt").groupBy(key))


def salted_last_event_wins(df: DataFrame, key: str = "doc_id",
                           seq: str = "seq", n_salts: int = 16) -> DataFrame:
    """last_event_wins via explicit salting: semantically identical to
    ``last_event_wins`` for unique ``seq`` per key-event; shuffles the
    hot key to ``n_salts`` reducers first. max_by is algebraic, so the
    two-phase composition is exact."""

    def _agg(g):
        cols = [c for c in df.columns if c != key]
        return g.agg(
            F.max_by(F.struct(*cols), F.col(seq)).alias("_latest")
        ).select(key, "_latest.*")

    return salted_reduce(df, key, _agg, n_salts=n_salts, seq=seq)
