"""Benchmark harness — one JSON line on stdout.

Measures (a) the authoritative metric: change-events/sec for an
end-to-end CDC replay (generate→validate→reduce→merge-commit→compact)
into a LakeTable, and (b) wall time for the headline analytical queries
at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] cores (default 32)
  BENCH_CDC_EVENTS    override CDC event count (default 20M * sf)
  BENCH_CDC_ONLY=1    skip analytical queries (used by BENCH/scaling.py)

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": <sf>, "cdc": {...}}
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitcoin_etl_spark.session import get_spark  # noqa: E402

HEADLINE_QUERIES = [
    # round-1 set (kept stable for cross-round comparability)
    "cdc_replay_last_wins",
    "cdc_enrich_join",
    "cdc_gap_detect",
    "tx_derived_aggregates",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "events_sessionize",
    "explode_tokens_stats",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    # round-2 additions
    "q10_returned_items",
    "dedup_simhash_hamming",
    "kafka_codec_roundtrip",
    "text_token_counts",
    # round-3 additions: the dedup pipeline END-TO-END (candidate pairs +
    # iterative connected-components canonicalization) so the per-round
    # driver-sync cost of the iterative algorithm is measured, not just
    # correct
    "dedup_lsh_banded",
    "dedup_components",
    # char-level winnowing fingerprint pairs (the third, tokenization-
    # independent member of the near-dup family; exercises the
    # materialize-then-window projection split)
    "dedup_winnow_pairs",
    # Arrow-vectorized ANN scan beside the exact one — the bench carries
    # the production-vs-reference scorer A/B every round
    "ann_cosine_topk_fast",
    # round-4 additions: temporal family (as-of via single-window sweep,
    # range containment via bucket equi-join), the 13-gram
    # decontamination join after its zero-shuffle corpus-stream fix, and
    # the KMV sketch (distinct + two-level min-k merge)
    "events_asof_join",
    "events_range_join",
    "decontaminate_overlap",
    "events_kmv_distinct",
]

CACHE_ROOT = os.environ.get(
    "BENCH_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache"),
)
# Where the table under test lives. The sandbox has ONE virtual disk
# (~280 MB/s) shared by all cores, so disk-backed runs measure the disk,
# not the plan (BENCH/ENVIRONMENT.md); default the table and shuffle
# dirs to tmpfs when available (a real cluster scales disks with
# executors). The change-log cache stays on disk (persistent).
def _default_work() -> str | None:
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark_graft_bench/work"
        os.makedirs(d, exist_ok=True)
        return d
    return None


WORK_DIR = os.environ.get("BENCH_WORK_DIR") or _default_work()
if "SPARK_LOCAL_DIRS" not in os.environ and os.path.isdir("/dev/shm"):
    _ld = "/dev/shm/spark_graft_bench/local"
    os.makedirs(_ld, exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = _ld


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def ensure_changelog(n_events: int, n_epochs: int, n_keys: int) -> str:
    """Deterministic change log for the CDC bench, cached across runs."""
    from bitcoin_etl_spark.changelog import ChangeLogSpec, generate_scenario

    tag = f"v3_ev{n_events}_ep{n_epochs}_k{n_keys}"
    out = os.path.join(CACHE_ROOT, tag)
    if os.path.exists(os.path.join(out, "manifest.json")):
        return out
    spec = ChangeLogSpec(
        n_epochs=n_epochs,
        events_per_epoch=n_events // n_epochs,
        n_keys=n_keys,
        zipf_a=1.2,          # hot-key skew ON in the bench (north_rule)
        update_frac=0.3,
        delete_frac=0.05,
        reorgs=[(n_epochs // 2, 5)],
    )
    generate_scenario(out, spec, oracle=False)
    return out


def run_cdc_replay(spark, scen_dir: str, n_buckets: int,
                   warm: bool = True) -> dict:
    import glob

    from pyspark.sql import functions as F, types as T

    from bitcoin_etl_spark.lake import LakeTable
    from bitcoin_etl_spark.operators import EpochApplier
    from bitcoin_etl_spark.schemas import CHANGES_SCHEMA, DOCS_SCHEMA

    payload = T.StructType([f for f in DOCS_SCHEMA.fields if f.name != "_rev"])
    tdir = tempfile.mkdtemp(prefix="cdc_bench_table_", dir=WORK_DIR)
    shutil.rmtree(tdir)
    # assume_unique_rev: the change-log seq is unique by construction and
    # the ledger makes epoch commits exactly-once, so (key, _rev) pairs
    # are globally unique — the compaction join may skip its safety dedup
    # (the Iceberg/Delta MERGE source-uniqueness contract; see
    # LakeTable._dedup_latest)
    table = LakeTable.create(
        tdir, payload, n_buckets=n_buckets,
        properties={"assume_unique_rev": True},
    )
    # RMT-style scale path: narrow append per epoch, dedup deferred to
    # compaction (see EpochApplier.pre_reduce docstring); quarantine lazy
    # so validation rides the write as an observed metric.
    applier = EpochApplier(
        table, pipeline_id="bench", pre_reduce=False, quarantine_mode="lazy"
    )
    epoch_dirs = sorted(
        glob.glob(f"{scen_dir}/changes/epoch=*"),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    # Untimed warmup on a throwaway table: JIT/codegen/parquet-codec/Arrow
    # first-use costs are one-time per JVM, not part of steady-state
    # throughput (the authoritative 10^10-event replay target is
    # steady-state); leaving them in the timed region biases the faster
    # parallelism level downward in the scaling comparison.
    if warm:
        wdir = tempfile.mkdtemp(prefix="cdc_bench_warm_", dir=WORK_DIR)
        shutil.rmtree(wdir)
        wtable = LakeTable.create(wdir, payload, n_buckets=n_buckets)
        wapplier = EpochApplier(
            wtable, pipeline_id="warm", pre_reduce=False,
            quarantine_mode="lazy"
        )
        wdf = (
            spark.read.schema(CHANGES_SCHEMA).parquet(epoch_dirs[0])
            .withColumn("epoch", F.lit(0).cast("long")).limit(100_000)
        )
        wapplier.apply_epoch(spark, wdf, 0)
        wtable.compact(spark)
        shutil.rmtree(wdir, ignore_errors=True)

    n_events = 0
    t0 = time.time()
    for d in epoch_dirs:
        e = int(d.rsplit("=", 1)[1])
        df = spark.read.schema(CHANGES_SCHEMA).parquet(d).withColumn(
            "epoch", F.lit(e).cast("long")
        )
        res = applier.apply_epoch(spark, df, e)
        n_events += res.get("upserts", 0) + res.get("deletes", 0)
    apply_s = time.time() - t0
    t1 = time.time()
    table.compact(spark)
    compact_s = time.time() - t1
    rows = table.read_final(spark).count()
    total = time.time() - t0
    shutil.rmtree(tdir, ignore_errors=True)
    return {
        "events": n_events,
        "final_rows": rows,
        "apply_sec": round(apply_s, 3),
        "compact_sec": round(compact_s, 3),
        "total_sec": round(total, 3),
        "events_per_sec": round(n_events / total, 1),
        "events_per_sec_apply_only": round(n_events / apply_s, 1),
    }


def _steal_totals() -> tuple[int, int]:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except OSError:
        return 0, 0


def probe_ceiling(spark, cores: int) -> dict:
    """Same-session host-weather probe: a fixed pure-compute burn
    (whole-stage-codegen range→sum, zero IO) timed at 1 partition and at
    ``cores`` partitions. The single-partition wall calibrates per-core
    compute speed against a quiet-host reference; the ratio shows how
    much parallel headroom the box has RIGHT NOW. Run before and after
    the timed sweep so a verdict can separate host weather from plan
    changes mechanically (round-4 lesson: 2x query 'regressions' were
    unadjudicable without in-artifact ceiling evidence)."""
    burn = 2_500_000_000  # ~2-3 s/core quiet-host
    # cap total parallel work at 8 single-burns: at local[32] a full
    # per-core burn would run ~40 s against this VM's ~2x single-JVM
    # thread ceiling; 8x keeps the probe ~10 s while still exposing the
    # parallel headroom of the moment
    factor = min(cores, 8)
    spark.range(10_000_000, numPartitions=1).selectExpr(
        "sum(id % 7919)").collect()  # codegen warm
    t0 = time.time()
    spark.range(burn, numPartitions=1).selectExpr("sum(id % 7919)").collect()
    one = time.time() - t0
    t0 = time.time()
    spark.range(burn * factor, numPartitions=cores).selectExpr(
        "sum(id % 7919)").collect()
    alln = time.time() - t0
    return {
        "burn_1part_sec": round(one, 3),
        "burn_parallel_sec": round(alln, 3),
        "burn_parallel_factor": factor,
        "parallel_speedup": round(one * factor / alln, 2) if alln else None,
        "cores": cores,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    cdc_only = os.environ.get("BENCH_CDC_ONLY") == "1"

    n_events = int(os.environ.get("BENCH_CDC_EVENTS", str(int(20_000_000 * sf))))
    n_epochs = int(os.environ.get("BENCH_CDC_EPOCHS", "4"))
    n_keys = max(1000, n_events // 4)
    scen_dir = ensure_changelog(n_events, n_epochs, n_keys)

    spark = get_spark(
        app_name="bitcoin_etl_spark_bench", cores=cores, shuffle_partitions=cores,
        extra_conf={
            # smaller splits: enough scan tasks to feed every core even
            # when an epoch is a handful of files
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "BENCH_MAX_PARTITION_BYTES", "16m"
            ),
        },
    )

    steal0, jiff0 = _steal_totals()
    # default: probe in the driver/full bench, skip under scaling.py
    # (BENCH_CDC_ONLY) which runs its own pinned ceiling protocol
    ceiling_probes = os.environ.get(
        "BENCH_CEILING_PROBE", "0" if cdc_only else "1"
    ) == "1"
    ceil_before = probe_ceiling(spark, cores) if ceiling_probes else None

    # bucket count FIXED across parallelism levels (comparable layouts).
    # Median of BENCH_CDC_REPEATS full replays (fresh table each; JVM
    # warmup only before the first) — the replay is as noise-exposed as
    # the queries, so the headline gets the same median treatment.
    cdc_repeats = int(os.environ.get("BENCH_CDC_REPEATS", "3"))
    cdc_runs = [
        run_cdc_replay(spark, scen_dir, n_buckets=64, warm=(i == 0))
        for i in range(cdc_repeats)
    ]
    cdc_runs.sort(key=lambda r: r["total_sec"])
    cdc = cdc_runs[len(cdc_runs) // 2]
    cdc["all_total_sec"] = [r["total_sec"] for r in cdc_runs]

    queries: dict[str, float] = {}
    query_stats: dict[str, dict] = {}
    if not cdc_only:
        from bitcoin_etl_spark.plans.queries import QUERIES

        # untimed page-cache warm of the input tables: the sandbox's one
        # ~280 MB/s virtio disk + aggressive host page-cache reclaim
        # otherwise turn a random query's first scan into a disk
        # benchmark (observed 6x swings on identical queries)
        for f in sorted(os.listdir(sf_dir)):
            if f.endswith(".parquet"):
                with open(os.path.join(sf_dir, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass

        # medians over repeats: single-shot timings on this noise-prone
        # box cannot distinguish a plan regression from host noise
        # (BENCH/BASELINE.md documents ~12% swings on identical runs and
        # round 2 showed unexplained 2x single-shot outliers). Per query
        # we report the MEDIAN of `repeats` runs plus min/max spread.
        repeats = int(os.environ.get("BENCH_QUERY_REPEATS", "5"))
        for name in HEADLINE_QUERIES:
            times = []
            for _i in range(repeats):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).count()
                times.append(time.time() - t0)
            times.sort()
            med = times[len(times) // 2] if repeats % 2 else (
                times[repeats // 2 - 1] + times[repeats // 2]) / 2
            queries[name] = round(med, 3)
            query_stats[name] = {
                "median": round(med, 3),
                "min": round(times[0], 3),
                "max": round(times[-1], 3),
                "runs": repeats,
            }

    ceil_after = probe_ceiling(spark, cores) if ceiling_probes else None
    steal1, jiff1 = _steal_totals()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / max(1, jiff1 - jiff0), 2)
        if jiff1 > jiff0 else None
    )

    # timed regions only: CDC replay wall + per-query walls (the JVM/codec
    # warmup pass inside run_cdc_replay is deliberately untimed)
    total = round(cdc["total_sec"] + sum(queries.values()), 3)
    out = {
        "metric": "cdc_replay_plus_headline_queries_wall_sec",
        # protocol v3: per-query value = median of `repeats` runs (v2 =
        # single shot after JVM warmup + page-cache warm; v1 = fully cold).
        # Cross-round comparisons must match protocols — see
        # BENCH/BASELINE.md "Measurement protocol".
        "protocol": "v3-median-of-repeats",
        "query_repeats": int(os.environ.get("BENCH_QUERY_REPEATS", "5")),
        "value": total,
        "unit": "sec",
        "queries": queries,
        "query_stats": query_stats,
        "sf": sf,
        "cores": cores,
        "cdc": cdc,
        # host-weather evidence (see probe_ceiling): quiet-host reference
        # on this VM is burn_1part ~2.4 s and parallel_speedup within the
        # BENCH/ENVIRONMENT.md single-JVM thread ceiling (~2x at 32
        # threads; ~3.75x at 4 isolated cores). A burn_1part far above
        # the reference or a large before/after drift marks the sweep as
        # taken in a noisy window; steal_pct >6% marks host CPU theft.
        "ceiling": {
            "before": ceil_before,
            "after": ceil_after,
            "steal_pct": steal_pct,
        },
    }
    spark.stop()
    # the summary is deliberately the FINAL stdout line with nothing
    # after it (driver parsers read one JSON object per line)
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
