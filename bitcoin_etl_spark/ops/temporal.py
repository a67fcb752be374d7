"""Temporal operators: as-of join, gap sessionization, bucketed range
join. The operator family a CDC/event pipeline needs around its change
log — all expressed as compositions of built-in DataFrame ops (window /
explode / equi-join), no UDFs, no theta joins.

Scale design notes per operator are in each docstring; the common theme
is that Spark has no native ASOF or RANGE join (a naive `ON a.ts >= b.ts`
plans as BroadcastNestedLoopJoin — quadratic), so both are re-expressed
as shapes Catalyst CAN execute at 100 TB: one partitioned window for
as-of, an equi-join on time buckets for range containment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _us(col: Column) -> Column:
    """Microseconds-since-epoch as long. unix_micros rejects
    TIMESTAMP_NTZ (the parquet default for naive timestamps); casting
    through TIMESTAMP interprets NTZ in the session timezone — pinned
    to UTC engine-wide — which matches a SQL oracle's epoch_us over the
    same naive value."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(probe: DataFrame, state: DataFrame, key: str, ts: str,
              state_cols: list[str], suffix: str = "_asof",
              split_seconds: int | None = None) -> DataFrame:
    """Left as-of join: for every probe row, attach the ``state_cols``
    of the state row with the LARGEST ``ts`` ≤ the probe's ``ts`` for
    the same ``key`` (inclusive — a state row AT the probe timestamp is
    visible, matching DuckDB/kdb ASOF semantics). Probe rows with no
    preceding state get NULLs.

    Shape: instead of a join at all, the two sides are union-tagged and
    swept by ONE window — ``last(col, ignorenulls)`` over
    (partition by key, order by (ts, tag)) with state tagged 0 so it
    sorts before probes at equal ts. One hash shuffle of rows+state on
    ``key``, map-side running-last, no join build side, no range
    explosion; Spark's own alternative for this semantics is a
    BroadcastNestedLoopJoin theta join (quadratic) or a per-key
    collect_list UDF (driver-bound).

    Hot keys: with the default ``split_seconds=None`` all of one key's
    history lands in ONE window partition — fine until a Zipf key holds
    a material fraction of the data. Pass ``split_seconds`` to pre-split
    every key by a time coarse-bucket: the window partitions on
    (key, bucket) so a hot key's history spreads across
    history_span/split_seconds partitions, and correctness across the
    cut is restored by injecting each bucket's carried-forward closing
    state (per state COLUMN, the latest non-null value from any EARLIER
    bucket — matching the per-column last-ignorenulls semantics of the
    unsplit sweep) as a synthetic state row at the bucket boundary. Costs two extra small shuffles of
    O(keys × buckets) rows (closing-state agg + carry window); choose
    ``split_seconds`` so a hot key emits ~shuffle-partition-sized slices
    per bucket. Result is row-identical to the unsplit path (pinned by
    test against a Zipf fixture)."""
    pcols = probe.columns
    tagged_state = state.select(
        F.col(key), F.col(ts),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"{c}{suffix}") for c in state_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in pcols if c not in (key, ts)],
    )
    tagged_probe = probe.select(
        F.col(key), F.col(ts),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(state.schema[c].dataType).alias(f"{c}{suffix}")
          for c in state_cols],
        *[F.col(c) for c in pcols if c not in (key, ts)],
    )
    if split_seconds is not None:
        carry = _asof_carry_rows(
            tagged_state, probe, key, ts, state_cols, suffix, split_seconds
        )
        both = tagged_state.unionByName(carry).unionByName(tagged_probe)
        bucket = F.floor(_us(F.col(ts)) / (split_seconds * 1_000_000))
        part = [F.col(key), bucket.alias("_split")]
    else:
        both = tagged_state.unionByName(tagged_probe)
        part = [F.col(key)]
    w = (
        W.partitionBy(*part)
        .orderBy(F.col(ts), F.col("_tag"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = both
    for c in state_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return out.filter(F.col("_tag") == 1).drop("_tag")


def _asof_carry_rows(tagged_state: DataFrame, probe: DataFrame, key: str,
                     ts: str, state_cols: list[str], suffix: str,
                     split_seconds: int) -> DataFrame:
    """Synthetic state rows carrying each coarse bucket's opening state.

    For every (key, bucket) that contains probe rows, emit one row at
    the exact bucket-start timestamp carrying, PER STATE COLUMN, the
    key's latest non-null value from any STRICTLY EARLIER bucket
    (same-bucket state must not be backdated past probes that precede
    it). Tagged -1 so it sorts before real state at the boundary
    instant and is superseded by any real in-bucket state via the
    running last(). Buckets with nothing to carry (every column NULL)
    are dropped.

    The carry is per-column, not a whole-row snapshot: the unsplit
    sweep is ``last(col, ignorenulls)`` per column, so a state row may
    contribute its non-null columns while a LATER row supplies others.
    Snapshotting only the latest closing row lost exactly that — a
    probe after a bucket cut saw NULL where the unsplit path returns an
    earlier non-null value (ADVICE r05; pinned by the NULL-bearing
    fixture in test_asof_join_hot_key_split_matches_plain).

    Shuffle cost: one partial agg of state to O(keys × state-buckets)
    closing rows, one key-partitioned window over
    O(keys × (state+probe buckets)) marker rows — both negligible next
    to the main sweep, and the per-key window here is bounded by bucket
    count, not row count, so it cannot itself become the hot partition.
    """
    bs = split_seconds * 1_000_000
    sb = F.floor(_us(F.col(ts)) / bs)
    scols = [f"{c}{suffix}" for c in state_cols]
    # per (key, state-bucket), per COLUMN: latest non-null value by
    # (ts, tag) — max_by's ordering key is NULL for rows where the
    # column is null, and max_by ignores null ordering keys, so each
    # column independently closes at its own last non-null row
    closing = (
        tagged_state
        .withColumn("_split", sb)
        .groupBy(key, "_split")
        .agg(*[
            F.max_by(
                F.col(c),
                F.when(F.col(c).isNotNull(),
                       F.struct(F.col(ts), F.col("_tag"))),
            ).alias(c)
            for c in scols
        ])
        .select(key, "_split", F.lit(0).alias("_mk"), *scols)
    )
    markers = (
        probe
        .select(F.col(key), sb.alias("_split"))
        .distinct()
        .select(key, "_split", F.lit(-1).alias("_mk"),
                *[F.lit(None).cast(tagged_state.schema[c].dataType)
                  .alias(c) for c in scols])
    )
    # marker _mk=-1 sorts BEFORE the same bucket's closing row, so the
    # running last() sees only closings from buckets < marker's bucket
    cw = (
        W.partitionBy(key)
        .orderBy(F.col("_split"), F.col("_mk"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = closing.unionByName(markers)
    for c in scols:
        carried = carried.withColumn(
            c, F.last(c, ignorenulls=True).over(cw)
        )
    any_carry = None
    for c in scols:
        nn = F.col(c).isNotNull()
        any_carry = nn if any_carry is None else (any_carry | nn)
    carried = carried.filter((F.col("_mk") == -1) & any_carry)
    probe_schema = {f.name: f.dataType for f in probe.schema.fields}
    return carried.select(
        F.col(key),
        # bucket-start instant, same type as ts (micros→TIMESTAMP→ts-type
        # mirrors _us's NTZ handling under the UTC-pinned session)
        F.timestamp_micros((F.col("_split") * bs).cast("long"))
        .cast(probe_schema[ts]).alias(ts),
        F.lit(-1).alias("_tag"),
        *scols,
        *[F.lit(None).cast(probe_schema[c]).alias(c)
          for c in probe.columns if c not in (key, ts)],
    )


def sessionize(df: DataFrame, key: str, ts: str,
               gap_seconds: int = 1800,
               order_tiebreak: str | None = None) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds``. Adds
    ``session_idx`` (1-based per key, in time order). Two window
    passes over ONE hash shuffle on ``key`` (lag → boundary flag →
    running sum), integer microsecond arithmetic throughout so the
    boundary rule is exact and portable to any SQL oracle (no
    float epoch, no engine-specific date_diff truncation)."""
    order = [F.col(ts)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = W.partitionBy(key).orderBy(*order)
    us = _us(F.col(ts))
    prev = F.lag(us).over(w)
    boundary = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("_b", boundary).withColumn(
        "session_idx",
        F.sum("_b").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    ).drop("_b")


def range_join_buckets(facts: DataFrame, intervals: DataFrame,
                       ts_col: str, start_col: str, end_col: str,
                       bucket_seconds: int = 3600) -> DataFrame:
    """Interval-containment join (facts.ts ∈ [start, end]) as an
    EQUI-join: each interval explodes into the fixed-width time buckets
    it covers, each fact maps to its single bucket, and the join key is
    the bucket id — then the exact containment predicate filters the
    bucket-coarse matches. A fact's bucket is covered by every interval
    containing the fact, and each (fact, interval) pair meets on exactly
    ONE bucket (the fact's own), so no post-join dedup is needed.

    Spark plans the naive ``ON ts BETWEEN start AND end`` as a
    BroadcastNestedLoopJoin — O(facts × intervals) and undistributable
    when the interval side outgrows a broadcast. This shape shuffles
    O(facts + intervals × buckets_per_interval) rows and hash-joins;
    pick ``bucket_seconds`` ≈ median interval length so the explosion
    factor stays small while bucket selectivity stays high. Returns the
    matched (fact × interval) rows with both sides' columns."""
    f_us = _us(F.col(ts_col))
    s_us = _us(F.col(start_col))
    e_us = _us(F.col(end_col))
    bs = bucket_seconds * 1_000_000
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.floor(s_us / bs), F.floor(e_us / bs))
        ),
    )
    fx = facts.withColumn("_bucket", F.floor(f_us / bs))
    joined = fx.join(iv, "_bucket").where(
        (f_us >= s_us) & (f_us <= e_us)
    )
    return joined.drop("_bucket")
