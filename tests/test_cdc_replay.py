"""End-to-end CDC replay scenarios vs the pandas oracle — the analog of
the reference's golden-fixture job tests
(``tests/bitcoinetl/job/test_export_blocks_job.py:40-95``): replay the
full change log through the engine, assert final table state equals the
independent oracle row-for-row under token-array equality
(FIXTURES.md §4 scenario matrix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitcoin_etl_spark.changelog import ChangeLogSpec, generate_scenario
from bitcoin_etl_spark.lake import LakeTable
from bitcoin_etl_spark.operators import EpochApplier
from bitcoin_etl_spark.operators.repair import (
    count_conservation,
    enrichment_disagreement,
    find_duplicate_keys,
    find_missing_epochs,
    find_unapplied_changes,
    patch_by_replay,
)
from bitcoin_etl_spark.schemas import CHANGES_SCHEMA, DOCS_COMPARE_COLUMNS, DOCS_SCHEMA
from tests.helpers import assert_docs_equal, spark_docs_to_pandas

import pandas as pd


def _read_changes(spark, scen_dir, sub="changes"):
    return (
        spark.read.schema(_schema_with_epoch())
        .option("basePath", f"{scen_dir}/{sub}")
        .parquet(f"{scen_dir}/{sub}")
    )


def _schema_with_epoch():
    # CHANGES_SCHEMA already declares `epoch` (a directory-partition
    # column in the on-disk layout)
    return CHANGES_SCHEMA


def _payload_schema():
    from pyspark.sql import types as T

    return T.StructType([f for f in DOCS_SCHEMA.fields if f.name != "_rev"])


def _replay(spark, scen_dir, table_dir, *, compact_every=0, pandas_udf=False,
            pre_reduce=True, quarantine_mode="eager"):
    table = LakeTable.create(table_dir, _payload_schema(), key="doc_id", n_buckets=8)
    applier = EpochApplier(
        table, compact_every=compact_every, use_pandas_udf_validation=pandas_udf,
        pre_reduce=pre_reduce, quarantine_mode=quarantine_mode,
    )
    changes = _read_changes(spark, scen_dir)
    applier.apply_changes_df(spark, changes)
    return table, applier, changes


def _assert_matches_oracle(spark, table, scen_dir):
    actual = spark_docs_to_pandas(
        table.read_final(spark).select(*DOCS_COMPARE_COLUMNS)
    )
    expected = pd.read_parquet(f"{scen_dir}/expected_docs.parquet")[
        DOCS_COMPARE_COLUMNS
    ]
    assert_docs_equal(actual, expected)


SCENARIOS = {
    "base_insert_only": ChangeLogSpec(
        n_epochs=4, events_per_epoch=400, n_keys=5000, update_frac=0, delete_frac=0
    ),
    "upsert_mix": ChangeLogSpec(n_epochs=6, events_per_epoch=500, n_keys=800),
    "dup_in_batch": ChangeLogSpec(
        n_epochs=4, events_per_epoch=400, n_keys=300, dup_in_batch_frac=0.2
    ),
    "replayed_epoch": ChangeLogSpec(
        n_epochs=5, events_per_epoch=300, n_keys=400, replay_epochs=[1, 3]
    ),
    "reorg_rollback": ChangeLogSpec(
        n_epochs=6, events_per_epoch=300, n_keys=400, reorgs=[(2, 5), (4, 12)]
    ),
    "hot_key_zipf": ChangeLogSpec(
        n_epochs=4, events_per_epoch=2000, n_keys=1000, zipf_a=1.2
    ),
    "bad_rows": ChangeLogSpec(
        n_epochs=4, events_per_epoch=400, n_keys=300, bad_row_frac=0.1
    ),
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_replay_matches_oracle(spark, tmp_path, name):
    scen_dir = str(tmp_path / name)
    generate_scenario(scen_dir, SCENARIOS[name])
    table, applier, changes = _replay(
        spark, scen_dir, str(tmp_path / "t"),
        pandas_udf=(name == "bad_rows"),  # exercise the Arrow-UDF path too
    )
    _assert_matches_oracle(spark, table, scen_dir)
    # invariants (FIXTURES.md §6)
    final = table.read_final(spark)
    assert find_duplicate_keys(final).count() == 0
    assert find_missing_epochs(spark, table).count() == 0
    cons = count_conservation(spark, table, _valid_changes(changes))
    assert cons["conserved"], cons


def _valid_changes(changes):
    from bitcoin_etl_spark.operators.validate import tokens_valid_expr

    return changes.withColumn("_v", tokens_valid_expr()).filter(F.col("_v")).drop("_v")


def test_narrow_append_mode_matches_oracle(spark, tmp_path):
    """pre_reduce=False (ReplacingMergeTree part-insert path: narrow
    append, dedup deferred to read/compact) + lazy quarantine must yield
    the same final state — incl. bad rows and reorgs."""
    spec = ChangeLogSpec(
        n_epochs=5, events_per_epoch=400, n_keys=300, dup_in_batch_frac=0.2,
        bad_row_frac=0.05, reorgs=[(3, 6)],
    )
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, spec)
    table, applier, changes = _replay(
        spark, scen_dir, str(tmp_path / "t"),
        pre_reduce=False, quarantine_mode="lazy",
    )
    _assert_matches_oracle(spark, table, scen_dir)
    table.compact(spark)
    _assert_matches_oracle(spark, table, scen_dir)
    # lazy quarantine: invalid rows derivable from the log, counted in ledger
    nq = applier.scan_quarantine(changes).count()
    assert nq > 0
    lin = table.lineage(spark).toPandas()
    assert lin["quarantined"].sum() == nq


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """Re-applying every epoch a second time must not change the state
    (exactly-once ledger; FIXTURES.md §6.5)."""
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, SCENARIOS["upsert_mix"])
    table, applier, changes = _replay(spark, scen_dir, str(tmp_path / "t"))
    v_before = table.current_version()
    results = applier.apply_changes_df(spark, changes)  # full duplicate replay
    assert all(r["skipped"] for r in results)
    assert table.current_version() == v_before
    _assert_matches_oracle(spark, table, scen_dir)


def test_compaction_preserves_state_and_dedups_files(spark, tmp_path):
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, SCENARIOS["upsert_mix"])
    table, applier, _ = _replay(spark, scen_dir, str(tmp_path / "t"))
    res = table.compact(spark)
    assert res["compacted"]
    m = table.manifest()
    assert all(f["kind"] == "base" for f in m["files"])
    assert all(f["bucket"] is not None for f in m["files"])
    _assert_matches_oracle(spark, table, scen_dir)
    # base fast path: no dedup agg needed; row count equals file meta sum
    assert table.read_final(spark).count() == sum(
        f["rows"] for f in m["files"]
    ) - table.read_raw(spark).filter("_deleted").count()
    # vacuum drops unreferenced deltas but table still reads fine
    removed = table.vacuum(keep_versions=1)
    assert removed > 0
    _assert_matches_oracle(spark, table, scen_dir)


def test_periodic_compaction_during_replay(spark, tmp_path):
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, SCENARIOS["reorg_rollback"])
    table, applier, _ = _replay(
        spark, scen_dir, str(tmp_path / "t"), compact_every=2
    )
    _assert_matches_oracle(spark, table, scen_dir)


def test_gap_and_patch(spark, tmp_path):
    """Withheld epoch → gap detected → patch-by-replay heals (C5/J6)."""
    spec = ChangeLogSpec(
        n_epochs=6, events_per_epoch=300, n_keys=400, withhold_epochs=[2]
    )
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, spec)
    table, applier, changes = _replay(spark, scen_dir, str(tmp_path / "t"))
    missing = find_missing_epochs(spark, table, expected_max=5)
    assert [r["epoch"] for r in missing.collect()] == [2]
    patches = _read_changes(spark, scen_dir, sub="patches")
    patch_by_replay(spark, applier, patches)
    assert find_missing_epochs(spark, table, expected_max=5).count() == 0
    _assert_matches_oracle(spark, table, scen_dir)


def test_bad_rows_are_quarantined(spark, tmp_path):
    spec = SCENARIOS["bad_rows"]
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, spec)
    table, applier, changes = _replay(spark, scen_dir, str(tmp_path / "t"))
    q = applier.quarantined(spark)
    assert q is not None and q.count() > 0
    # every quarantined row violates the validity rule
    from bitcoin_etl_spark.operators.validate import tokens_valid_expr

    assert q.withColumn("_v", tokens_valid_expr()).filter(F.col("_v")).count() == 0
    # lineage records quarantine counts
    lin = table.lineage(spark).toPandas()
    assert lin["quarantined"].sum() == q.count()


def test_repair_probes_clean_after_replay(spark, tmp_path):
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, SCENARIOS["reorg_rollback"])
    table, applier, changes = _replay(spark, scen_dir, str(tmp_path / "t"))
    valid = _valid_changes(changes)
    assert find_unapplied_changes(spark, table, valid).count() == 0
    assert enrichment_disagreement(spark, table, valid).count() == 0


def test_time_travel_and_snapshots(spark, tmp_path):
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, SCENARIOS["upsert_mix"])
    table, applier, _ = _replay(spark, scen_dir, str(tmp_path / "t"))
    snaps = table.snapshots()
    assert len(snaps) >= 2
    # an old snapshot has no more rows than the final one has revisions
    early = table.read_raw(spark, version=1).count()
    late = table.read_raw(spark).count()
    assert early <= late


def test_salted_reduce_matches_unsalted(spark, tmp_path):
    """SURVEY §4 skew tool: the explicit two-phase salted last-event-wins
    is exactly equivalent to the plain partial-agg form on a Zipf-hot
    change log (max_by is algebraic, so phase composition is exact)."""
    from bitcoin_etl_spark.operators.reduce import (
        last_event_wins,
        salted_last_event_wins,
    )

    scen = str(tmp_path / "skew")
    generate_scenario(
        scen,
        ChangeLogSpec(n_epochs=2, events_per_epoch=4000, n_keys=300,
                      zipf_a=1.3, seed=11),
        oracle=False,
    )
    ch = _read_changes(spark, scen)
    a = last_event_wins(ch)
    b = salted_last_event_wins(ch, n_salts=8)
    ka = sorted(tuple(r) for r in a.select("doc_id", "seq", "op").collect())
    kb = sorted(tuple(r) for r in b.select("doc_id", "seq", "op").collect())
    assert ka == kb and len(ka) > 0


def test_incremental_compaction(spark, tmp_path):
    """Minor (L0→L1 fold) + bucket-subset major compaction preserve the
    exact final state at every step — the incremental OPTIMIZE path a
    100 TB table needs instead of full rewrites."""
    scen_dir = str(tmp_path / "scen")
    generate_scenario(scen_dir, SCENARIOS["upsert_mix"])
    # narrow appends → unbucketed delta files
    table, applier, _ = _replay(
        spark, scen_dir, str(tmp_path / "t"), pre_reduce=False
    )
    assert any(f["bucket"] is None for f in table.manifest()["files"])

    res = table.compact_deltas(spark)
    assert res["compacted"]
    m = table.manifest()
    assert all(f["bucket"] is not None for f in m["files"])
    assert all(f["kind"] == "delta" for f in m["files"])
    _assert_matches_oracle(spark, table, scen_dir)

    # major-compact half the buckets: mixed base/delta manifest
    half = set(range(table.n_buckets // 2))
    res = table.compact(spark, buckets=half)
    assert res["compacted"]
    m = table.manifest()
    kinds = {f["kind"] for f in m["files"]}
    assert kinds == {"base", "delta"}
    assert all(
        f["kind"] == "base" for f in m["files"] if f["bucket"] in half
    )
    _assert_matches_oracle(spark, table, scen_dir)

    # compact the remaining buckets → fully base, fast path
    rest = set(range(table.n_buckets)) - half
    res = table.compact(spark, buckets=rest)
    assert res["compacted"]
    assert all(f["kind"] == "base" for f in table.manifest()["files"])
    _assert_matches_oracle(spark, table, scen_dir)

    # idempotent: nothing left to do
    assert table.compact(spark, buckets=half)["compacted"] is False


def test_compaction_retains_tombstones_against_stale_replay(spark, tmp_path):
    """Withheld-epoch replay safety (the patch-by-replay flow, C5):
    compaction must RETAIN tombstones so a replayed OLDER epoch's upsert
    for a deleted-then-compacted key loses max-_rev dedup instead of
    resurrecting the row; `min_retained_rev` purges only tombstones
    below the caller's replay horizon (the purge_tombstones analog)."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)

    def delta(rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=epoch)

    delta([("a", 1, 1, False), ("b", 2, 2, False)], epoch=0)
    delta([("a", None, 5, True)], epoch=1)          # delete a @ rev 5
    table.compact(spark)
    assert [r["doc_id"] for r in table.read_final(spark).collect()] == ["b"]
    raw = table.read_raw(spark)
    assert raw.filter("_deleted").count() == 1      # tombstone survives

    # stale replay: the withheld epoch's upsert of a at rev 3 (< 5)
    delta([("a", 99, 3, False)], epoch=99)
    got = {r["doc_id"]: r["val"] for r in table.read_final(spark).collect()}
    assert got == {"b": 2}, f"deleted key resurrected: {got}"
    table.compact(spark)
    got = {r["doc_id"]: r["val"] for r in table.read_final(spark).collect()}
    assert got == {"b": 2}

    # purge behind the replay horizon: rev 5 < 6 → tombstone dropped
    res = table.compact(spark, min_retained_rev=6)
    assert res["compacted"]
    assert table.read_raw(spark).filter("_deleted").count() == 0
    assert {r["doc_id"] for r in table.read_final(spark).collect()} == {"b"}


def test_read_changes_incremental_feed(spark, tmp_path):
    """Incremental change-feed read (the Iceberg changelog-scan / Delta
    CDF analog): net I/U/D between two snapshots, no-op deletes dropped,
    compaction produces an EMPTY feed, and the scan file-skips every
    file whose footer _rev range predates the from-snapshot."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)

    def delta(rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=epoch)

    delta([("a", 1, 1, False), ("b", 2, 2, False), ("c", 3, 3, False)], 0)
    v0 = table.current_version()
    assert table.rev_high(v0) == 3

    # b updated twice (nets to final), c deleted, d inserted,
    # e deleted-without-ever-existing (must not surface)
    delta([("b", 20, 4, False), ("d", 40, 5, False)], 1)
    delta([("b", 21, 6, False), ("c", None, 7, True),
           ("e", None, 8, True)], 2)
    v1 = table.current_version()

    feed = {
        r["doc_id"]: (r["_change_type"], r["val"])
        for r in table.read_changes(spark, v0, v1).collect()
    }
    assert feed == {
        "b": ("UPDATE_AFTER", 21),
        "c": ("DELETE", None),
        "d": ("INSERT", 40),
    }
    # unclassified single-scan form
    up = {
        r["doc_id"]: r["_change_type"]
        for r in table.read_changes(spark, v0, v1, classify=False).collect()
    }
    assert up == {"b": "UPSERT", "c": "DELETE", "d": "UPSERT", "e": "DELETE"}

    # compaction rewrites files but changes no state: empty feed, and
    # the rewritten base files carry old revs → candidate set is empty
    table.compact(spark)
    v2 = table.current_version()
    assert table.read_changes(spark, v1, v2).count() == 0
    rev_b = table.rev_high(v1)
    cand = [
        f for f in table.manifest(v2)["files"]
        if f.get("rev_max") is None or f["rev_max"] > rev_b
    ]
    assert cand == [], "compacted files must be skippable by rev stats"

    # post-compaction delta: feed reads ONLY the new file
    delta([("a", 100, 9, False)], 3)
    v3 = table.current_version()
    cand = [
        f for f in table.manifest(v3)["files"]
        if f.get("rev_max") is None or f["rev_max"] > rev_b
    ]
    assert len(cand) == 1
    feed = {
        r["doc_id"]: (r["_change_type"], r["val"])
        for r in table.read_changes(spark, v1, v3).collect()
    }
    assert feed == {"a": ("UPDATE_AFTER", 100)}
    # full-range feed from the empty-table snapshot: everything alive
    # is an INSERT at its net value, deleted keys a no-op
    feed0 = {
        r["doc_id"]: (r["_change_type"], r["val"])
        for r in table.read_changes(spark, 0, v3).collect()
    }
    assert feed0 == {
        "a": ("INSERT", 100), "b": ("INSERT", 21), "d": ("INSERT", 40),
    }


def test_dedup_auto_exact_winner_decision(spark, tmp_path, monkeypatch):
    """Strategy semantics on a hot-key table whose 32 delta rows
    collapse to 8 winners, with the broadcast limit patched below the
    row estimate: ``auto`` must stay job-free (falls to the
    serial-phase-free window plan), ``probe`` must discover via the
    exact narrow count that the winners fit and take the broadcast
    join — and every strategy must produce the identical final state."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    monkeypatch.setattr(LakeTable, "_broadcast_winner_limit", 10)

    rows = []
    rev = 0
    for burst in range(5):  # 5 revisions of the same 6 hot keys
        for k in range(6):
            rev += 1
            rows.append((f"k{k}", burst * 10 + k, rev, False))
    rows += [("extra1", 1, rev + 1, False), ("extra2", 2, rev + 2, False)]
    for i in range(0, len(rows), 8):
        df = spark.createDataFrame(
            rows[i:i + 8], "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=i)

    est = sum(f["rows"] or 0 for f in table.manifest()["files"])
    assert est > 10, "fixture must exceed the (patched) broadcast limit"
    expect = {f"k{k}": 40 + k for k in range(6)} | {"extra1": 1, "extra2": 2}
    # auto: est over the limit → job-free window plan, correct result
    final = table.read_final(spark, strategy="auto")
    got = {r["doc_id"]: r["val"] for r in final.collect()}
    assert got == expect
    # probe: exact winner count (8) is under the limit → join path
    probed = {r["doc_id"]: r["val"]
              for r in table.read_final(spark, strategy="probe").collect()}
    assert probed == expect
    # every explicit strategy agrees
    for strat in ("join", "agg", "window"):
        alt = {r["doc_id"]: r["val"]
               for r in table.read_final(spark, strategy=strat).collect()}
        assert alt == expect, strat


def test_dedup_auto_is_parallelism_aware(spark, tmp_path):
    """r06: the job-free auto decision weighs the broadcast build's
    serial cost against the per-core shuffle it saves — when the winner
    bound is within the broadcast budget but bound x parallelism
    exceeds ~2x the row count (rows barely collapse), auto must take
    the window plan, not the broadcast join."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    # 120 rows over 120 distinct keys: winners ~= rows, so the broadcast
    # join would rebuild nearly the whole table driver-side for nothing
    df = spark.createDataFrame(
        [(f"k{i}", i, i, False) for i in range(120)],
        "doc_id string, val long, _rev long, _deleted boolean",
    )
    table.append_delta(df, epoch_id=0)
    bound = sum(f["rows"] for f in table.manifest()["files"])
    kb = table.manifest()["keys_bound"]
    if kb is not None:
        bound = min(bound, int(kb * 1.10) + 16)
    par = spark.sparkContext.defaultParallelism
    assert bound * par > 2 * 120, "fixture must trip the parallelism term"
    plan = table.read_final(spark, strategy="auto") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan[:2000]
    assert "row_number" in plan or "Window" in plan, plan[:2000]
    # results identical to the explicit join plan
    got = sorted((r["doc_id"], r["val"])
                 for r in table.read_final(spark, strategy="auto").collect())
    ref = sorted((r["doc_id"], r["val"])
                 for r in table.read_final(spark, strategy="join").collect())
    assert got == ref


def test_read_changes_across_schema_evolution(spark, tmp_path):
    """A feed spanning an additive schema evolution reads old files with
    the evolved schema: pre-evolution rows that change later surface
    with the new column, and unchanged-but-rewritten rows stay out."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    df = spark.createDataFrame(
        [("a", 1, 1, False), ("b", 2, 2, False)],
        "doc_id string, val long, _rev long, _deleted boolean",
    )
    table.append_delta(df, epoch_id=0)
    v0 = table.current_version()
    # evolved delta: new source_meta column auto-evolves the table
    df2 = spark.createDataFrame(
        [("a", 10, 3, False, "crawl"), ("c", 30, 4, False, "curated")],
        "doc_id string, val long, _rev long, _deleted boolean, source_meta string",
    )
    table.append_delta(df2, epoch_id=1)
    feed = {
        r["doc_id"]: (r["_change_type"], r["val"], r["source_meta"])
        for r in table.read_changes(spark, v0).collect()
    }
    assert feed == {
        "a": ("UPDATE_AFTER", 10, "crawl"),
        "c": ("INSERT", 30, "curated"),
    }
    assert "source_meta" in [f.name for f in table.payload_schema().fields]


def test_read_changes_repair_watermark_forces_snapshot_diff(spark, tmp_path):
    """Patch-by-replay of a withheld epoch writes rows at their ORIGINAL
    low seq — below the feed cursor's rev high-water mark. The appended-
    rev watermark must detect the out-of-order commit inside the feed
    range and fall back to a full snapshot diff, surfacing the net
    changes rev-skipping would drop: a brand-new key inserted by the
    replayed epoch and a delete of a key last touched before it
    (ADVICE r04 medium)."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)

    def delta(rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=epoch)

    # epochs 1 (revs 1-2) and 3 (revs 7-8) applied; epoch 2 (revs 4-6)
    # withheld. 'old' is last touched in epoch 1.
    delta([("old", 1, 1, False), ("a", 2, 2, False)], 1)
    delta([("a", 30, 7, False), ("b", 40, 8, False)], 3)
    v_cursor = table.current_version()
    assert table.rev_high(v_cursor) == 8

    # the withheld epoch 2: inserts brand-new key 'new' (rev 4), deletes
    # 'old' (rev 5, beats old's rev 1), and re-updates 'a' (rev 6 — must
    # LOSE to a's rev-7 image, no feed row)
    delta([("new", 99, 4, False), ("old", None, 5, True),
           ("a", 777, 6, False)], 2)
    v_after = table.current_version()

    # watermark sees the low-rev commit in range
    assert table._min_appended_rev(v_cursor, v_after) == 4
    feed = {
        r["doc_id"]: (r["_change_type"], r["val"])
        for r in table.read_changes(spark, v_cursor, v_after).collect()
    }
    assert feed == {"new": ("INSERT", 99), "old": ("DELETE", None)}
    up = {
        r["doc_id"]: r["_change_type"]
        for r in table.read_changes(
            spark, v_cursor, v_after, classify=False).collect()
    }
    assert up == {"new": "UPSERT", "old": "DELETE"}

    # a feed range NOT containing the repair stays on the fast path and
    # still sees later in-order commits
    delta([("c", 5, 9, False)], 4)
    v_final = table.current_version()
    assert table._min_appended_rev(v_after, v_final) == 9
    feed2 = {
        r["doc_id"]: (r["_change_type"], r["val"])
        for r in table.read_changes(spark, v_after, v_final).collect()
    }
    assert feed2 == {"c": ("INSERT", 5)}

    # full-range feed from the empty snapshot nets everything correctly
    # (repair included: 'old' inserted then deleted → absent)
    feed0 = {
        r["doc_id"]: (r["_change_type"], r["val"])
        for r in table.read_changes(spark, 0, v_final).collect()
    }
    assert feed0 == {
        "a": ("INSERT", 30), "b": ("INSERT", 40),
        "new": ("INSERT", 99), "c": ("INSERT", 5),
    }


def test_read_changes_retention_guard(spark, tmp_path):
    """A feed cursor lagging beyond vacuum retention must fail LOUDLY
    (never reconstruct a partial from-state): read_changes raises a
    ValueError naming the vacuumed snapshot once its data files are
    gone (ADVICE r04: ChangeFeedTailer retention guard)."""
    import pytest
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)

    def delta(rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=epoch)

    delta([("a", 1, 1, False)], 0)
    v_old = table.current_version()
    delta([("b", 2, 2, False)], 1)
    # compaction rewrites everything; vacuum(1) then deletes v_old's files
    table.compact(spark)
    removed = table.vacuum(keep_versions=1)
    assert removed > 0
    with pytest.raises(ValueError, match="no longer retained"):
        table.read_changes(spark, v_old)
    # the head snapshot is always readable
    head = table.current_version()
    assert table.read_changes(spark, head).count() == 0


def test_point_lookup_prunes_by_bucket_and_key_range(spark, tmp_path):
    """Single-key read path: point_lookup must return the latest live
    image while scanning ONLY files admitted by the hash bucket and the
    manifest's footer key-range stats — the Iceberg lower/upper-bounds
    skip. Deleted keys return empty; absent keys scan at most the
    bucket's files."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=8)

    def delta(rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=epoch)

    rows0 = [(f"k{i:03d}", i, i + 1, False) for i in range(40)]
    delta(rows0, 0)
    delta([("k007", 777, 100, False), ("k009", None, 101, True)], 1)
    table.compact(spark)  # bucketed base files with key stats
    delta([("k007", 778, 102, False)], 2)  # fresh delta on top

    # key stats present on every bucketed file
    m = table.manifest()
    assert all("key_min" in f for f in m["files"] if f["rows"]), m["files"]

    got = table.point_lookup(spark, "k007").collect()
    assert len(got) == 1 and got[0]["val"] == 778 and got[0]["_rev"] == 102
    assert table.point_lookup(spark, "k009").count() == 0  # deleted
    assert table.point_lookup(spark, "nope").count() == 0  # absent

    # pruning is real: candidates for one key are a strict subset
    bucket = int(spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("k007")), F.lit(8))).first()[0])
    cand = table._point_lookup_files("k007", bucket)
    n_files = len([f for f in m["files"] if f["rows"]])
    assert 0 < len(cand) < n_files, (len(cand), n_files)
    # every candidate is either k007's bucket or unbucketed
    assert all(f.get("bucket") in (None, bucket) for f in cand)


def test_keys_bound_enables_jobfree_broadcast_compaction(spark, tmp_path,
                                                         monkeypatch):
    """The manifest's running keys_bound (per-commit HLL distinct-key
    estimates observed on the apply write job) must let the auto dedup
    strategy pick the broadcast join from PURE METADATA when file rows
    overcount winners — the job-free replacement for the round-4
    exact-count probe — and full compaction must reset the bound to the
    exact base row count."""
    from pyspark.sql import types as T

    from bitcoin_etl_spark.operators import EpochApplier
    from bitcoin_etl_spark.schemas import CHANGES_SCHEMA

    payload = T.StructType([f for f in CHANGES_SCHEMA.fields
                            if f.name in ("doc_id", "tokens", "n_tok",
                                          "source")])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    applier = EpochApplier(table, pre_reduce=False, quarantine_mode="lazy")

    def epoch_df(e, n_rows, n_keys):
        rows = [
            (e * 10_000 + i, f"doc_{i % n_keys}", "U",
             [1, 2, 3], 3, "synthetic", e)
            for i in range(n_rows)
        ]
        return spark.createDataFrame(
            rows,
            "seq long, doc_id string, op string, tokens array<int>, "
            "n_tok int, source string, epoch long",
        )

    # 3 epochs x 400 rows over the SAME 50 hot keys: 1200 file rows,
    # ~150 distinct-key bound
    for e in range(3):
        applier.apply_epoch(spark, epoch_df(e, 400, 50), e)

    kb = table.manifest()["keys_bound"]
    assert kb is not None and 100 <= kb <= 200, kb
    est_rows = sum(f["rows"] for f in table.manifest()["files"])
    assert est_rows == 1200

    # limit between the key bound and the row estimate: only the HLL
    # bound can justify the broadcast join, with no count job
    monkeypatch.setattr(LakeTable, "_broadcast_winner_limit", 1000)
    plan = table.read_final(spark, strategy="auto") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, plan[:2000]

    # full compaction resets the bound to the exact base count
    table.compact(spark)
    assert table.manifest()["keys_bound"] == 50
    # post-compact appends keep accumulating
    applier.apply_epoch(spark, epoch_df(9, 100, 10), 9)
    kb2 = table.manifest()["keys_bound"]
    assert kb2 is not None and 55 <= kb2 <= 70, kb2
    # and a stats-less raw append poisons the bound to None (unknown)
    raw = spark.createDataFrame(
        [("doc_x", [1], 1, "synthetic", 999_999, False)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_rev long, _deleted boolean",
    )
    table.append_delta(raw, epoch_id=777)
    assert table.manifest()["keys_bound"] is None


def test_assume_unique_rev_skips_safety_dedup(spark, tmp_path):
    """The assume_unique_rev table property (writer guarantees globally
    unique (key, _rev) — true for the engine's own ledgered apply path)
    must produce the identical final state with a join plan that skips
    the winner-sized dedup shuffle, and must round-trip through
    LakeTable.load."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])

    def build(path, props):
        t = LakeTable.create(path, payload, n_buckets=4, properties=props)
        for e in range(3):
            rows = [(f"k{i}", e * 100 + i, e * 50 + i, False)
                    for i in range(30)]
            t.append_delta(spark.createDataFrame(
                rows, "doc_id string, val long, _rev long, _deleted boolean"
            ), epoch_id=e)
        return t

    plain = build(str(tmp_path / "a"), None)
    fast = build(str(tmp_path / "b"), {"assume_unique_rev": True})
    assert LakeTable.load(str(tmp_path / "b")).assume_unique_rev is True
    assert LakeTable.load(str(tmp_path / "a")).assume_unique_rev is False

    exp = {r["doc_id"]: r["val"]
           for r in plain.read_final(spark, strategy="join").collect()}
    got = {r["doc_id"]: r["val"]
           for r in fast.read_final(spark, strategy="join").collect()}
    assert got == exp and len(got) == 30

    # the skip is visible in the plan: one Aggregate (the narrow winner
    # agg) instead of two (winner agg + dedup)
    def n_aggs(t):
        plan = t.read_final(spark, strategy="join") \
            ._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("Aggregate ")

    assert n_aggs(fast) == n_aggs(plain) - 1


def test_write_audit_publish_staged_commits(spark, tmp_path):
    """Write-audit-publish (Iceberg WAP / branch-commit pattern): a
    staged append is invisible to every committed reader until
    publish_staged; read_staged exposes the would-be state for audits;
    abort removes the staged files; publish is conflict-checked against
    commits that landed after staging; vacuum never collects pending
    staged files."""
    import pytest
    from pyspark.sql import types as T

    from bitcoin_etl_spark.lake.table import CommitConflict

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)

    def df_of(rows):
        return spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )

    table.append_delta(df_of([("a", 1, 1, False), ("b", 2, 2, False)]),
                       epoch_id=0)
    v0 = table.current_version()

    # stage a batch that fails audit (negative value = bad)
    res = table.append_delta(df_of([("c", -99, 3, False)]),
                             epoch_id=1, staged=True)
    assert res["staged"] and res["parent_version"] == v0
    sid_bad = res["staging_id"]
    # invisible to committed readers; visible to the audit surface
    assert table.current_version() == v0
    assert table.read_final(spark).count() == 2
    staged_state = {r["doc_id"]: r["val"]
                    for r in table.read_staged(spark, sid_bad).collect()}
    assert staged_state == {"a": 1, "b": 2, "c": -99}
    # audit fails -> abort; files gone, nothing committed, epoch NOT in
    # the ledger (it can be retried)
    bad_rows = table.read_staged(spark, sid_bad).filter("val < 0").count()
    assert bad_rows == 1
    table.abort_staged(sid_bad)
    assert table.staged_commits() == []
    assert 1 not in table.committed_epochs("default")
    assert table.read_final(spark).count() == 2

    # stage a good batch; vacuum while pending must keep its files
    res = table.append_delta(df_of([("c", 30, 4, False)]),
                             epoch_id=1, staged=True)
    sid_good = res["staging_id"]
    table.vacuum(keep_versions=1)
    out = table.publish_staged(sid_good)
    assert out["version"] == v0 + 1
    assert {r["doc_id"]: r["val"] for r in table.read_final(spark).collect()} \
        == {"a": 1, "b": 2, "c": 30}
    assert 1 in table.committed_epochs("default")
    # the published ledger row makes a replay idempotent
    assert table.append_delta(df_of([("c", 30, 4, False)]),
                              epoch_id=1)["skipped"] is True

    # conflict: a commit lands between stage and publish
    res = table.append_delta(df_of([("d", 5, 5, False)]),
                             epoch_id=2, staged=True)
    table.append_delta(df_of([("e", 6, 6, False)]), epoch_id=3)
    with pytest.raises(CommitConflict, match="re-stage"):
        table.publish_staged(res["staging_id"])
    table.abort_staged(res["staging_id"])
    assert table.staged_commits() == []


def test_bucket_count_evolution(spark, tmp_path):
    """compact(new_n_buckets=...) re-hashes the table into a new bucket
    count (full rewrite), records it in the manifest, and point_lookup
    keeps working against both the new head and (version-aware) the old
    snapshot; a subset compaction with a resize is refused."""
    import pytest
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    rows = [(f"k{i}", i, i + 1, False) for i in range(60)]
    table.append_delta(spark.createDataFrame(
        rows, "doc_id string, val long, _rev long, _deleted boolean"
    ), epoch_id=0)
    table.compact(spark)
    v_old = table.current_version()
    assert table.manifest()["n_buckets"] == 4

    with pytest.raises(ValueError, match="full compaction"):
        table.compact(spark, buckets={0}, new_n_buckets=16)

    res = table.compact(spark, new_n_buckets=16)
    assert res["compacted"]
    assert table.manifest()["n_buckets"] == 16
    assert table.n_buckets == 16
    buckets = {f["bucket"] for f in table.manifest()["files"]}
    assert len(buckets) > 4  # rows actually spread over the new count

    # state identical; point_lookup works on the new layout AND the old
    # snapshot (old manifest keeps n_buckets=4)
    assert table.read_final(spark).count() == 60
    got = table.point_lookup(spark, "k37").collect()
    assert len(got) == 1 and got[0]["val"] == 37
    old = table.point_lookup(spark, "k37", version=v_old).collect()
    assert len(old) == 1 and old[0]["val"] == 37
    # loading fresh picks up the evolved count
    assert LakeTable.load(str(tmp_path / "t")).n_buckets == 16


def test_bucketed_files_are_key_sorted(spark, tmp_path):
    """Bucketed data files must come out key-sorted (the near-free
    clustering rider on the dynamic-partition writer's sort), so
    parquet row-group key stats are tight for point-lookup pruning."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    rows = [(f"k{i:04d}", i, i + 1, False) for i in range(500)]
    import random

    random.Random(3).shuffle(rows)
    table.append_delta(spark.createDataFrame(
        rows, "doc_id string, val long, _rev long, _deleted boolean"
    ), epoch_id=0)
    table.compact(spark)
    m = table.manifest()
    checked = 0
    for f in m["files"]:
        if not f["rows"]:
            continue
        col = pq.read_table(
            f"{table.path}/{f['path']}", columns=["doc_id"]
        )["doc_id"].to_pylist()
        assert col == sorted(col), f["path"]
        checked += 1
    assert checked >= 4


def test_plan_compaction_schedules_due_buckets(spark, tmp_path):
    """plan_compaction decides maintenance from manifest stats only: an
    all-base table owes nothing; raw epoch appends surface as L0 debt
    (minor fold first); after the fold, only buckets whose delta debt
    crosses the thresholds are scheduled, and running the suggested
    plan clears the debt."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)

    def delta(rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=epoch)

    delta([(f"k{i}", i, i + 1, False) for i in range(80)], 0)
    table.compact(spark)
    assert table.plan_compaction() == {
        "minor": False, "buckets": set(), "unbucketed_files": 0,
        "unbucketed_rows": 0, "delta_rows_by_bucket": {},
    }

    # two raw epoch appends: L0 debt counted against every bucket
    delta([(f"k{i}", 100 + i, 200 + i, False) for i in range(30)], 1)
    delta([(f"k{i}", 200 + i, 300 + i, False) for i in range(30, 60)], 2)
    plan = table.plan_compaction(max_delta_rows_per_bucket=10)
    assert plan["minor"] and plan["unbucketed_rows"] == 60

    table.compact_deltas(spark)
    plan = table.plan_compaction(max_delta_rows_per_bucket=10)
    assert not plan["minor"]
    assert plan["buckets"], "folded delta debt must localize to buckets"
    assert plan["buckets"] <= {0, 1, 2, 3}
    # generous threshold: nothing due
    assert table.plan_compaction(
        max_delta_rows_per_bucket=10_000,
        max_delta_files_per_bucket=100,
    )["buckets"] == set()

    # run the suggested subset compaction; debt clears, state correct
    table.compact(spark, buckets=plan["buckets"])
    after = table.plan_compaction(max_delta_rows_per_bucket=10)
    assert after["buckets"] == set() and not after["minor"]
    got = {r["doc_id"]: r["val"] for r in table.read_final(spark).collect()}
    assert len(got) == 80 and got["k0"] == 100 and got["k59"] == 259


def test_point_lookup_and_scan_keys_on_long_key(spark, tmp_path):
    """ADVICE r05: a NON-string key column must hash to the same bucket
    at lookup time as at write time — a Python-int literal hashed as
    int32 (or a key frame typed string) lands in the wrong bucket and
    the pruned scan silently returns empty."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("val", T.StringType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=8)
    df = spark.createDataFrame(
        [(i, f"v{i}", i, False) for i in range(64)],
        "doc_id long, val string, _rev long, _deleted boolean",
    )
    table.append_delta(df, epoch_id=0)
    table.compact(spark)
    for k in (0, 7, 63):
        got = table.point_lookup(spark, k).collect()
        assert len(got) == 1 and got[0]["val"] == f"v{k}", k
    got = {r["doc_id"]: r["val"]
           for r in table.scan_keys(spark, [1, 33, 62]).collect()}
    assert got == {1: "v1", 33: "v33", 62: "v62"}


def test_scan_keys_batch_point_lookup(spark, tmp_path):
    """scan_keys returns the latest live images for a key list in one
    pruned scan: updated keys at their newest value, deleted and absent
    keys omitted, and the candidate file set is the union of the keys'
    bucket-admitted files (a strict subset of the table)."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=8)

    def delta(rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        table.append_delta(df, epoch_id=epoch)

    delta([(f"k{i:03d}", i, i + 1, False) for i in range(50)], 0)
    table.compact(spark)
    delta([("k007", 700, 100, False), ("k011", None, 101, True)], 1)

    got = {r["doc_id"]: r["val"] for r in table.scan_keys(
        spark, ["k007", "k011", "k020", "nope"]).collect()}
    assert got == {"k007": 700, "k020": 20}

    import pytest
    with pytest.raises(ValueError):
        table.scan_keys(spark, [])


def test_append_commit_retry_on_conflict(spark, tmp_path, monkeypatch):
    """Optimistic commit retry: when a concurrent writer takes the
    version, append_delta replans ONLY the manifest JSON on the new
    head (data files are parent-independent) and commits — and when the
    racing writer committed the SAME epoch, the append returns skipped
    and removes its orphaned files (exactly-once survives the race)."""
    import glob as _glob
    import os

    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    a = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    b = LakeTable.load(str(tmp_path / "t"))

    def df_of(rows):
        return spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )

    real_publish = LakeTable._publish
    state = {"armed": None}

    def racing(self, manifest):
        if state["armed"] and self is a \
                and manifest.get("operation") == "append-delta":
            payload_fn = state["armed"]
            state["armed"] = None
            payload_fn()  # the concurrent writer lands first
        return real_publish(self, manifest)

    monkeypatch.setattr(LakeTable, "_publish", racing)

    # race 1: different epochs — A must retry on the new head and land
    state["armed"] = lambda: b.append_delta(
        df_of([("b1", 1, 1, False)]), epoch_id=50)
    res = a.append_delta(df_of([("a1", 2, 2, False)]), epoch_id=1)
    assert res["skipped"] is False
    got = {r["doc_id"]: r["val"] for r in a.read_final(spark).collect()}
    assert got == {"a1": 2, "b1": 1}
    assert {1, 50} <= set(a.committed_epochs("default"))

    # race 2: SAME epoch committed by the racer — A skips and cleans up
    state["armed"] = lambda: b.append_delta(
        df_of([("w", 9, 9, False)]), epoch_id=7)
    res = a.append_delta(df_of([("w", 8, 8, False)]), epoch_id=7)
    assert res == {"skipped": True, "epoch": 7}
    got = {r["doc_id"]: r["val"] for r in a.read_final(spark).collect()}
    assert got["w"] == 9  # the racer's image won; A's attempt left no rows
    # no orphans: every parquet on disk is referenced by the manifest
    on_disk = {os.path.relpath(p, a.path) for p in _glob.glob(
        f"{a.path}/data/**/*.parquet", recursive=True)}
    referenced = {f["path"] for f in a.manifest()["files"]}
    assert on_disk == referenced, on_disk - referenced


def test_stats_and_shallow_clone(spark, tmp_path):
    """stats() summarizes the manifest with no job; clone_to hard-links
    the snapshot into an independent table: identical state, divergent
    after independent commits, and vacuum on the clone never harms the
    original (link counts protect shared inodes)."""
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)

    def delta(t, rows, epoch):
        df = spark.createDataFrame(
            rows, "doc_id string, val long, _rev long, _deleted boolean"
        )
        t.append_delta(df, epoch_id=epoch)

    delta(table, [(f"k{i}", i, i + 1, False) for i in range(20)], 0)
    table.compact(spark)
    assert table.stats()["keys_bound"] == 20  # exact after full compact
    delta(table, [("k0", 99, 100, False)], 1)

    s = table.stats()
    assert s["base_rows"] == 20 and s["delta_rows"] == 1
    assert s["rev_high"] == 100 and s["committed_epochs"] == {"default": 2}
    # the raw append carried no HLL stats -> bound honestly unknown
    assert s["keys_bound"] is None

    clone = table.clone_to(str(tmp_path / "fork"))
    assert {r["doc_id"]: r["val"] for r in clone.read_final(spark).collect()} \
        == {r["doc_id"]: r["val"] for r in table.read_final(spark).collect()}
    # clone's ledger carried over: replaying epoch 1 into the clone skips
    assert clone.append_delta(spark.createDataFrame(
        [("k0", 99, 100, False)],
        "doc_id string, val long, _rev long, _deleted boolean",
    ), epoch_id=1)["skipped"] is True

    # divergence: clone takes new data the original never sees
    delta(clone, [("only_fork", 7, 200, False)], 5)
    assert clone.read_final(spark).count() == 21
    assert table.read_final(spark).count() == 20

    # clone compacts + vacuums its own chain; original still reads fine
    clone.compact(spark)
    removed = clone.vacuum(keep_versions=1)
    assert removed > 0
    assert table.read_final(spark).count() == 20
    assert {r["doc_id"] for r in table.point_lookup(spark, "k0").collect()} \
        == {"k0"}


def test_read_changes_rejects_backward_range(spark, tmp_path):
    """A feed cursor ahead of the requested to_version is a caller bug
    (cursor corruption / manual rollback past a vacuum): loud error, no
    silent garbage feed."""
    import pytest
    from pyspark.sql import types as T

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    for e in range(2):
        table.append_delta(spark.createDataFrame(
            [(f"k{e}", e, e + 1, False)],
            "doc_id string, val long, _rev long, _deleted boolean",
        ), epoch_id=e)
    with pytest.raises(ValueError, match="ahead of"):
        table.read_changes(spark, 2, 1)
