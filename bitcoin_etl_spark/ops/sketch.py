"""Deterministic cardinality sketch: KMV (k minimum values).

Spark's own approx_count_distinct (HyperLogLog++) is the right built-in
at scale, but its estimate is engine-internal — no independent oracle
can reproduce it bit-for-bit. KMV keeps the k smallest hash values of
the key: every intermediate is a plain integer computable in any SQL
engine, so the WHOLE sketch (synopsis and estimate) is oracle-checkable,
and two sketches union by merging arrays — the property that lets a
100 TB scan build per-partition synopses and combine them associatively.

Estimator (Bar-Yossef et al. 2002): with h uniform on [0, 2^32) and
h_(k) the k-th smallest distinct hash, distinct ≈ (k-1) * 2^32 / h_(k);
when fewer than k distinct hashes exist the count is exact. Integer
division keeps it reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_SPACE = 1 << 32


def _h32(col) -> "F.Column":
    """Uniform 32-bit hash from md5 — identical in DuckDB via
    ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::UBIGINT."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("long")


# auto-fanout sizing: target ≤ ~256k hashes (≈2 MB of longs) buffered
# per level-1 cell, capped so the level-2 merge input (fanout × k longs
# per group) stays small
CELL_TARGET = 1 << 18
MAX_FANOUT = 4096


def _auto_fanout(df: DataFrame, group_col: str, key_col: str) -> int:
    """Size the level-1 fanout from a cheap pre-pass: the LARGEST
    per-group approximate distinct count (HLL partial-agg, two narrow
    shuffles of O(groups) rows) divided by the per-cell buffer target.
    The pre-pass affects CONFIG only — kmv_distinct's output is
    identical for any sufficient fanout — so the HLL estimate being
    oracle-unreproducible doesn't leak into checked results."""
    row = df.groupBy(group_col).agg(
        F.approx_count_distinct(key_col).alias("d")
    ).agg(F.max("d")).first()
    max_d = row[0] or 0
    return max(1, min(MAX_FANOUT, -(-int(max_d) // CELL_TARGET)))


def kmv_distinct(df: DataFrame, group_col: str, key_col: str,
                 k: int = 64, fanout: int | str = "auto") -> DataFrame:
    """Per-group KMV distinct-count sketch: (group, n_kept, kth_min,
    est_distinct). ``n_kept`` = |synopsis| ≤ k; when n_kept < k the
    estimate is the exact distinct count.

    Shape: distinct (group, hash) — one partial-agg shuffle — then a
    TWO-LEVEL decomposed min-k (k smallest of a union = k smallest of
    the per-part k-smallest): level 1 takes the k smallest per
    (group, hash % fanout) cell, level 2 merges the ≤ fanout×k
    candidates per group. The level-1 state is bounded by k per cell
    AFTER slicing but collect_list holds a cell's distinct hashes
    (~distinct/fanout) during aggregation — ``fanout="auto"`` (default)
    sizes it from an approx_count_distinct pre-pass so every cell
    buffers ≤ ~CELL_TARGET hashes regardless of group cardinality
    (removes the manual-sizing footgun; pass an int to skip the
    pre-pass job when the cardinality is known). A skew-proof variant
    would need a custom JVM Aggregator, which pyspark cannot register.
    No windows, no sorts of the full stream — only array_sort over
    ≤ max(cell, fanout×k) element arrays. Output is fanout-invariant:
    the k smallest of a union don't depend on how cells partition it."""
    if fanout == "auto":
        fanout = _auto_fanout(df, group_col, key_col)
    h = df.select(
        F.col(group_col).alias("grp"), _h32(F.col(key_col)).alias("h")
    ).distinct()
    lvl1 = (
        h.withColumn("_cell", F.col("h") % fanout)
        .groupBy("grp", "_cell")
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("_mins"))
    )
    merged = lvl1.groupBy("grp").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_mins"))), 1, k
        ).alias("_arr")
    )
    n = F.size("_arr").cast("long")
    kth = F.element_at("_arr", k)
    # integer DIV, not floor(float division): (k-1)*2^32 is exact in a
    # double, but a/b can land within 1 ulp of an integer and floor the
    # wrong way vs an oracle's integer division
    est = F.when(n < k, n).otherwise(
        F.expr(
            f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) DIV element_at(_arr, {k})"
        )
    )
    return merged.select(
        F.col("grp").alias(group_col),
        n.alias("n_kept"),
        F.when(n >= k, kth).alias("kth_min"),
        est.alias("est_distinct"),
    )
