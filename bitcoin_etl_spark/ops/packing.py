"""Sequence packing: assign documents to fixed-token-budget chunks —
the batching step before LLM training (pack short docs together so a
context window wastes no tokens).

Two variants with different exactness/parallelism trade-offs:

* ``chunk_by_token_budget`` — contiguous chunking by running token
  count: chunk id = floor(start_offset / budget) over a per-partition
  ordered cumulative sum. Pure window expression (partitioned, never
  global), identically computable in SQL — the scalable default. A doc
  may START in chunk c and spill past the boundary (real packers split
  or pad there); the assignment itself is exact and deterministic.
* ``greedy_pack`` — true first-fit greedy packing (a pack NEVER exceeds
  the budget; an oversized doc gets its own pack): sequential state per
  stratum, so it runs as Arrow-batched ``applyInPandas`` per group —
  parallel across groups, exact within each. Use when hard capacity
  matters more than perfectly even group sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql import types as T


def chunk_by_token_budget(df: DataFrame, part_col: str, order_col: str,
                          tok_col: str, budget: int) -> DataFrame:
    """Chunk id per row: floor(cumulative-tokens-before-this-row /
    budget) within each ``part_col`` group ordered by ``order_col``.
    One partitioned window — no global sort, no driver state."""
    w = (
        W.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = F.sum(F.col(tok_col)).over(w) - F.col(tok_col)
    return df.withColumn(
        "chunk_id", F.floor(start / F.lit(budget)).cast("long")
    )


def greedy_pack(df: DataFrame, part_col: str, order_col: str,
                tok_col: str, budget: int) -> DataFrame:
    """First-fit greedy packing within each ``part_col`` group, visiting
    rows in ``order_col`` order: open a new pack when the current doc
    would overflow ``budget``; a single doc larger than the budget gets
    a pack of its own. Adds ``pack_id`` (long, per-group) and
    ``pack_tokens`` (running pack fill after the row).

    Sequential state per group → ``applyInPandas`` (Arrow batches, one
    group per task): parallelism = number of groups, which is the right
    axis at corpus scale (strata/shards are many, packs within a shard
    are order-dependent by definition)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("pack_id", T.LongType(), False),
           T.StructField("pack_tokens", T.LongType(), False)]
    )

    def pack(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pack_ids, fills = [], []
        pid, fill = 0, 0
        for tok in pdf[tok_col].astype("int64"):
            if fill > 0 and fill + tok > budget:
                pid += 1
                fill = 0
            fill += int(tok)
            pack_ids.append(pid)
            fills.append(fill)
        pdf = pdf.copy()
        pdf["pack_id"] = pack_ids
        pdf["pack_tokens"] = fills
        return pdf

    return df.groupBy(part_col).applyInPandas(pack, out_schema)
