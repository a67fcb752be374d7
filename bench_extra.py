"""Optimization-round measurement harness (bench.py is FROZEN — this
file adds the guide §1 instrumentation without touching the driver
contract).

Modes:
  python bench_extra.py time  [query ...]   noop-sink wall time (median of N)
  python bench_extra.py count [query ...]   .count() wall time (driver bench's
                                            methodology) median of N
  python bench_extra.py plan  [query ...]   dump .explain("formatted") to
                                            plans/r06/<query>_<tag>.txt
  python bench_extra.py cdc                 time the CDC replay stages

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf1.0 — the driver's
                        round-end measurement scale)
  SPARK_GRAFT_CPUS     (default 32)
  BENCH_EXTRA_REPEATS  (default 3)
  BENCH_EXTRA_TAG      plan-file suffix (default "before")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitcoin_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")

DEFAULT_QUERIES = [
    "dedup_simhash_hamming",
    "dedup_winnow_pairs",
    "decontaminate_overlap",
    "dedup_components",
    "kafka_codec_roundtrip",
    "dedup_lsh_banded",
    "q10_returned_items",
    "cdc_replay_last_wins",
    "dedup_minhash_lsh",
    "cdc_gap_detect",
    "cdc_enrich_join",
    "tx_derived_aggregates",
    "ann_cosine_topk",
    "q3_shipping_priority",
]


def _spark():
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        app_name="bench_extra", cores=cores, shuffle_partitions=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "BENCH_MAX_PARTITION_BYTES", "16m"
            ),
        },
    )


def _warm_cache():
    for f in sorted(os.listdir(SF_DIR)):
        if f.endswith(".parquet"):
            with open(os.path.join(SF_DIR, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass


def cmd_time(names: list[str], use_count: bool) -> None:
    from bitcoin_etl_spark.plans.queries import QUERIES

    spark = _spark()
    _warm_cache()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = []
        for _ in range(REPEATS):
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        times.sort()
        out[name] = {"median": times[len(times) // 2], "all": times}
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps({n: v["median"] for n, v in out.items()}))
    spark.stop()


def cmd_plan(names: list[str]) -> None:
    from bitcoin_etl_spark.plans.queries import QUERIES

    spark = _spark()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r06/{name}_{TAG}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


def cmd_cdc() -> None:
    import bench

    spark = _spark()
    sf = bench.sf_of(SF_DIR)
    n_events = int(os.environ.get("BENCH_CDC_EVENTS", str(int(20_000_000 * sf))))
    n_epochs = int(os.environ.get("BENCH_CDC_EPOCHS", "4"))
    n_keys = max(1000, n_events // 4)
    scen = bench.ensure_changelog(n_events, n_epochs, n_keys)
    reps = int(os.environ.get("BENCH_CDC_REPEATS", str(REPEATS)))
    runs = [
        bench.run_cdc_replay(spark, scen, n_buckets=64, warm=(i == 0))
        for i in range(reps)
    ]
    runs.sort(key=lambda r: r["total_sec"])
    med = runs[len(runs) // 2]
    med["all_total_sec"] = [r["total_sec"] for r in runs]
    med["all_apply_sec"] = [r["apply_sec"] for r in runs]
    med["all_compact_sec"] = [r["compact_sec"] for r in runs]
    print(json.dumps(med))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or DEFAULT_QUERIES
    if mode == "cdc":
        cmd_cdc()
    elif mode == "plan":
        cmd_plan(names)
    elif mode == "count":
        cmd_time(names, use_count=True)
    else:
        cmd_time(names, use_count=False)
