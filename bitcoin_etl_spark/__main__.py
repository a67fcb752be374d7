"""CLI — the ``bitcoinetl`` command-line analog (reference
``bitcoinetl.py`` + ``blockchainetl/cli/*``), reshaped for the CDC
engine. Run as ``python -m bitcoin_etl_spark <cmd>`` (or via
``spark-submit --py-files`` on a cluster).

Commands:
  generate   synthesize a deterministic change-log scenario (mock source)
  replay     batch-replay a change log into a lake table (export_all analog)
  tail       stream-tail a change log with checkpointing (stream analog)
  compact    OPTIMIZE-FINAL the table
  repair     gap/dup/conservation probes (ClickHouse script analogs)
  lineage    print per-epoch lineage/metrics
  snapshots  list table snapshots
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F, types as T


def _spark(args):
    from .session import get_spark

    return get_spark(app_name=f"bitcoin_etl_spark_{args.cmd}", cores=args.cores)


def _payload_schema():
    from .schemas import DOCS_SCHEMA

    return T.StructType([f for f in DOCS_SCHEMA.fields if f.name != "_rev"])


def _open_table(args, create: bool = False):
    from .lake import LakeTable

    if create:
        return LakeTable.create(args.table, _payload_schema(),
                                n_buckets=args.buckets)
    return LakeTable.load(args.table)


def cmd_generate(args):
    from .changelog import ChangeLogSpec, generate_scenario

    spec = ChangeLogSpec(
        n_epochs=args.epochs,
        events_per_epoch=args.events // args.epochs,
        n_keys=args.keys,
        seed=args.seed,
        zipf_a=args.zipf if args.zipf > 0 else None,
        bad_row_frac=args.bad_frac,
        evolution_epoch=args.evolution_epoch,
    )
    man = generate_scenario(args.out, spec, oracle=not args.no_oracle)
    print(json.dumps({k: man[k] for k in ("total_events", "n_blocks")}))


def cmd_replay(args):
    from .operators import EpochApplier
    from .schemas import CHANGES_SCHEMA

    spark = _spark(args)
    table = _open_table(args, create=args.create)
    applier = EpochApplier(
        table, pipeline_id=args.pipeline, pre_reduce=not args.no_reduce,
        quarantine_mode=args.quarantine, compact_every=args.compact_every,
    )
    df = (
        spark.read.schema(CHANGES_SCHEMA).option("basePath", args.changes)
        .parquet(args.changes)
    )
    if args.lag_blocks:
        # T2 reorg-lag clamp: defer the mutable head
        hi = df.agg(F.max("block")).collect()[0][0] or 0
        df = df.filter(F.col("block") <= hi - args.lag_blocks)
    results = applier.apply_changes_df(spark, df)
    print(json.dumps({"epochs": len(results),
                      "applied": sum(1 for r in results if not r.get("skipped")),
                      "skipped": sum(1 for r in results if r.get("skipped"))}))


def cmd_tail(args):
    from .operators import EpochApplier
    from .streaming import ChangeLogTailer

    spark = _spark(args)
    table = _open_table(args, create=args.create)
    applier = EpochApplier(table, pipeline_id=args.pipeline)
    tailer = ChangeLogTailer(
        spark, args.changes, applier, args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    if args.once:
        log = tailer.run_available()
        print(json.dumps({"batches": len(log)}))
    else:
        q = tailer.start(processing_time=args.trigger)
        q.awaitTermination()


def cmd_compact(args):
    spark = _spark(args)
    table = _open_table(args)
    if getattr(args, "auto", False):
        # manifest-stats scheduling: minor L0 fold if due, then only the
        # buckets whose merge-on-read debt crossed the thresholds
        plan = table.plan_compaction()
        out = {"plan": {**plan, "buckets": sorted(plan["buckets"])}}
        if plan["minor"]:
            out["minor"] = table.compact_deltas(spark)
            plan = table.plan_compaction()
        if plan["buckets"]:
            out["major"] = table.compact(spark, buckets=plan["buckets"])
        print(json.dumps(out))
        return
    print(json.dumps(table.compact(spark)))


def cmd_repair(args):
    from .operators.repair import (
        count_conservation,
        find_duplicate_keys,
        find_missing_epochs,
    )
    from .schemas import CHANGES_SCHEMA

    spark = _spark(args)
    table = _open_table(args)
    missing = [
        r["epoch"] for r in find_missing_epochs(
            spark, table, args.pipeline, args.expected_max
        ).collect()
    ]
    dups = find_duplicate_keys(table.read_final(spark)).count()
    out = {"missing_epochs": missing, "duplicate_keys": dups}
    if args.changes:
        # A1 count-conservation check against the source change log
        from .operators.validate import tokens_valid_expr

        changes = (
            spark.read.schema(CHANGES_SCHEMA)
            .option("basePath", args.changes)
            .parquet(args.changes)
            .withColumn("_v", tokens_valid_expr())
            .filter(F.col("_v"))
            .drop("_v")
        )
        out["conservation"] = count_conservation(spark, table, changes)
    print(json.dumps(out))


def cmd_lineage(args):
    spark = _spark(args)
    _open_table(args).lineage(spark).orderBy("pipeline_id", "epoch").show(
        100, truncate=False
    )


def cmd_snapshots(args):
    print(json.dumps(_open_table(args).snapshots()))


def cmd_stats(args):
    print(json.dumps(_open_table(args).stats()))


def cmd_changes(args):
    """Incremental change feed between two snapshots as JSON lines —
    the downstream-consumer surface of LakeTable.read_changes."""
    spark = _spark(args)
    table = _open_table(args)
    to_v = args.to_version if args.to_version is not None else (
        table.current_version()
    )
    feed = table.read_changes(
        spark, args.from_version, to_v, classify=not args.no_classify
    )
    for line in feed.toJSON().toLocalIterator():
        print(line)


def cmd_lookup(args):
    """Single-key point lookup (bucket + footer key-range pruned)."""
    spark = _spark(args)
    rows = _open_table(args).point_lookup(spark, args.key).toJSON().collect()
    for line in rows:
        print(line)


def cmd_staged(args):
    """Write-audit-publish control: list / publish / abort staged
    commits (stage with the library's append_delta(staged=True))."""
    table = _open_table(args)
    if args.action == "list":
        print(json.dumps(table.staged_commits()))
        return
    if not args.id:  # ADVICE r05: fail as a usage error, not a
        # confusing 'no staged commit None' FileNotFoundError
        raise SystemExit(
            f"staged {args.action} requires --id <staging-id> "
            f"(see `staged list`)"
        )
    if args.action == "publish":
        print(json.dumps(table.publish_staged(args.id)))
    else:
        print(json.dumps(table.abort_staged(args.id)))


def cmd_mirror(args):
    """Drain available upstream changes into a downstream derived
    table (TableMirror; creates the downstream on --create)."""
    from .lake import LakeTable
    from .streaming.feed import TableMirror

    spark = _spark(args)
    up = LakeTable.load(args.table)
    if args.create and not os.path.exists(
        os.path.join(args.downstream, "manifest")
    ):
        LakeTable.create(
            args.downstream, up.payload_schema(), key=up.key,
            n_buckets=up.n_buckets,
        )
    down = LakeTable.load(args.downstream)
    mirror = TableMirror(
        spark, up, down, args.cursor,
        where=args.where,
        select=args.select.split(",") if args.select else None,
    )
    print(json.dumps(mirror.run_available()))


def main(argv=None):
    p = argparse.ArgumentParser(prog="bitcoin_etl_spark")
    p.add_argument("--cores", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=100_000)
    g.add_argument("--epochs", type=int, default=10)
    g.add_argument("--keys", type=int, default=20_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--zipf", type=float, default=0.0)
    g.add_argument("--bad-frac", type=float, default=0.0)
    g.add_argument("--evolution-epoch", type=int, default=None)
    g.add_argument("--no-oracle", action="store_true")

    def table_args(sp, with_changes=True):
        sp.add_argument("--table", required=True)
        sp.add_argument("--pipeline", default="default")
        sp.add_argument("--buckets", type=int, default=64)
        if with_changes:
            sp.add_argument("--changes", required=True)
            sp.add_argument("--create", action="store_true")

    r = sub.add_parser("replay")
    table_args(r)
    r.add_argument("--no-reduce", action="store_true")
    r.add_argument("--quarantine", default="eager", choices=["eager", "lazy"])
    r.add_argument("--compact-every", type=int, default=0)
    r.add_argument("--lag-blocks", type=int, default=0)

    t = sub.add_parser("tail")
    table_args(t)
    t.add_argument("--checkpoint", required=True)
    t.add_argument("--max-files-per-trigger", type=int, default=None)
    t.add_argument("--trigger", default="10 seconds")
    t.add_argument("--once", action="store_true")

    for name in ("compact", "lineage", "snapshots", "stats"):
        sp = sub.add_parser(name)
        table_args(sp, with_changes=False)
        if name == "compact":
            sp.add_argument("--auto", action="store_true",
                            help="schedule from manifest stats "
                                 "(plan_compaction) instead of a full "
                                 "rewrite")

    rp = sub.add_parser("repair")
    table_args(rp, with_changes=False)
    rp.add_argument("--expected-max", type=int, default=None)
    rp.add_argument("--changes", default=None,
                    help="change-log dir for count-conservation check")

    ch = sub.add_parser(
        "changes", help="incremental change feed between two snapshots"
    )
    table_args(ch, with_changes=False)
    ch.add_argument("--from-version", type=int, required=True)
    ch.add_argument("--to-version", type=int, default=None)
    ch.add_argument("--no-classify", action="store_true",
                    help="single-scan UPSERT/DELETE feed (skip I/U split)")

    lk = sub.add_parser("lookup", help="point lookup for one key")
    table_args(lk, with_changes=False)
    lk.add_argument("--key", required=True)

    mi = sub.add_parser(
        "mirror", help="maintain a derived table off the change feed"
    )
    table_args(mi, with_changes=False)
    mi.add_argument("--downstream", required=True)
    mi.add_argument("--cursor", required=True)
    mi.add_argument("--where", default=None)
    mi.add_argument("--select", default=None,
                    help="comma-separated payload columns to keep")
    mi.add_argument("--create", action="store_true")

    st = sub.add_parser("staged",
                        help="write-audit-publish staged commits")
    table_args(st, with_changes=False)
    st.add_argument("action", choices=["list", "publish", "abort"])
    st.add_argument("--id", default=None,
                    help="staging id (publish/abort)")

    args = p.parse_args(argv)
    {
        "generate": cmd_generate,
        "replay": cmd_replay,
        "tail": cmd_tail,
        "compact": cmd_compact,
        "repair": cmd_repair,
        "lineage": cmd_lineage,
        "snapshots": cmd_snapshots,
        "stats": cmd_stats,
        "changes": cmd_changes,
        "lookup": cmd_lookup,
        "mirror": cmd_mirror,
        "staged": cmd_staged,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
