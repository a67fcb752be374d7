"""LakeTable — a snapshot-isolated, versioned parquet table with keyed
upsert semantics and an embedded commit-epoch dedup ledger.

This is the engine's sink abstraction. The primary production target is
an Iceberg table (``MERGE INTO`` + snapshot commits); this sandbox has no
network to fetch the iceberg-spark-runtime jar, so LakeTable implements
the same contract on plain parquet + an atomic JSON manifest chain:

* **Insert-wins versioned upsert** — the ClickHouse
  ``ReplacingMergeTree(revision)`` analog (reference
  ``pipelines/bitcoin.py:128-131``): every row carries ``_rev`` (the
  change's ``seq``); the max-``_rev`` row per ``doc_id`` wins. Deletes are
  tombstone rows (``_deleted=true``) — merge-on-read, like RMT parts.
* **Read-time finality** — ``read_final()`` is the ``SELECT … FINAL``
  analog (reference ``pipelines/block_sync_pipeline.py:269-291``):
  aggregate ``max_by(struct(*), _rev)`` per key, drop tombstones. max_by
  does map-side partial aggregation, so hot keys collapse *before* the
  shuffle — the skew mitigation SURVEY.md §4 calls for.
* **Explicit compaction** — ``compact()`` is the ``OPTIMIZE TABLE …
  FINAL`` analog (reference ``clickhouse/clickhouse_final_block_partition
  .py:61-76``): folds all delta files into hash-bucketed base files.
* **Atomic commits + snapshot isolation** — each commit writes data files
  then publishes manifest ``v{N}.json`` via an exclusive hard-link (POSIX
  ``link(2)`` fails if the target exists → optimistic concurrency).
  Readers resolve the highest committed version; time travel via
  ``version=``. This supplies the cross-statement transactionality the
  reference lacks (SURVEY.md §3.3).
* **Commit-epoch dedup ledger** — exactly-once apply over an
  at-least-once stream (the reference is at-least-once with cursor-file
  commit, ``streamer.py:97-103``; replays produce duplicates). The ledger
  lives *inside the manifest*, so data + ledger commit in one atomic
  rename — an epoch already in the ledger is skipped idempotently.
* **Additive schema evolution** — manifest carries the current schema;
  old files are read with the evolved schema (missing columns null-fill),
  mirroring Iceberg add-column semantics (the multi-chain field-variance
  analog, SURVEY.md §1.2).

Scale notes: data files are hash-bucketed on the merge key
(``pmod(xxhash64(doc_id), n_buckets)``), so point-lookups and future
bucket-local compaction prune files; at cluster scale n_buckets is sized
so a bucket fits an executor. All heavy work is DataFrame ops; the
manifest is O(files) JSON handled on the driver.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import merge_schemas, schema_from_json

REV_COL = "_rev"
DELETED_COL = "_deleted"
BUCKET_COL = "_bucket"

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


class CommitConflict(RuntimeError):
    """Another writer committed the same version first (optimistic CC)."""


class LakeTable:
    def __init__(self, path: str, key: str = "doc_id", n_buckets: int = 64):
        self.path = path
        self.key = key
        self.n_buckets = n_buckets
        self._manifest_dir = os.path.join(path, "manifest")
        self._data_dir = os.path.join(path, "data")
        self._manifest_cache: dict[int, dict] = {}
        # writer contract: (key, _rev) pairs are globally unique (set via
        # the table property of the same name) — lets the broadcast-join
        # dedup skip its winner-sized safety shuffle
        self.assume_unique_rev = False

    # ------------------------------------------------------------------ setup
    @classmethod
    def create(
        cls,
        path: str,
        schema: T.StructType,
        key: str = "doc_id",
        n_buckets: int = 64,
        properties: dict | None = None,
    ) -> "LakeTable":
        """Create an empty table (schema = payload columns; engine adds
        ``_rev``/``_deleted``)."""
        t = cls(path, key=key, n_buckets=n_buckets)
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        if t.current_version() is not None:
            raise ValueError(f"table already exists at {path}")
        full = cls._with_engine_cols(schema)
        t.assume_unique_rev = bool(
            (properties or {}).get("assume_unique_rev", False)
        )
        t._publish(
            {
                "version": 0,
                "parent": None,
                "schema": json.loads(full.json()),
                "key": key,
                "n_buckets": n_buckets,
                "files": [],
                "ledger": {},
                "properties": properties or {},
                "keys_bound": 0,
                "committed_at": time.time(),
            }
        )
        return t

    @classmethod
    def load(cls, path: str) -> "LakeTable":
        t = cls(path)
        m = t.manifest()
        t.key = m["key"]
        t.n_buckets = m["n_buckets"]
        t.assume_unique_rev = bool(
            m.get("properties", {}).get("assume_unique_rev", False)
        )
        return t

    @staticmethod
    def _with_engine_cols(schema: T.StructType) -> T.StructType:
        names = {f.name for f in schema.fields}
        fields = list(schema.fields)
        if REV_COL not in names:
            fields.append(T.StructField(REV_COL, T.LongType(), False))
        if DELETED_COL not in names:
            fields.append(T.StructField(DELETED_COL, T.BooleanType(), False))
        return T.StructType(fields)

    # ------------------------------------------------------------- manifests
    def current_version(self) -> int | None:
        if not os.path.isdir(self._manifest_dir):
            return None
        versions = [
            int(m.group(1))
            for f in os.listdir(self._manifest_dir)
            if (m := _MANIFEST_RE.match(f))
        ]
        return max(versions) if versions else None

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        if v not in self._manifest_cache:
            with open(os.path.join(self._manifest_dir, f"v{v}.json")) as f:
                self._manifest_cache[v] = json.load(f)
        return self._manifest_cache[v]

    def _publish(self, manifest: dict) -> None:
        """Atomically publish manifest v{N}: hard-link from a temp file —
        link(2) is atomic and fails with EEXIST if v{N} was already
        committed by a concurrent writer."""
        v = manifest["version"]
        tmp = os.path.join(self._manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(self._manifest_dir, f"v{v}.json")
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            raise CommitConflict(f"version {v} already committed") from e
        finally:
            os.unlink(tmp)

    def schema(self, version: int | None = None) -> T.StructType:
        return schema_from_json(json.dumps(self.manifest(version)["schema"]))

    def payload_schema(self, version: int | None = None) -> T.StructType:
        full = self.schema(version)
        return T.StructType(
            [f for f in full.fields if f.name not in (REV_COL, DELETED_COL)]
        )

    def snapshots(self) -> list[dict]:
        out = []
        v = 0
        while os.path.exists(os.path.join(self._manifest_dir, f"v{v}.json")):
            m = self.manifest(v)
            out.append(
                {
                    "version": v,
                    "files": len(m["files"]),
                    "rows": sum(f["rows"] for f in m["files"]),
                    "committed_at": m.get("committed_at"),
                    "operation": m.get("operation"),
                }
            )
            v += 1
        return out

    # ---------------------------------------------------------------- ledger
    def committed_epochs(self, pipeline_id: str) -> set[int]:
        return {int(e) for e in self.manifest()["ledger"].get(pipeline_id, {})}

    def ledger(self, pipeline_id: str | None = None) -> dict:
        led = self.manifest()["ledger"]
        return led.get(pipeline_id, {}) if pipeline_id else led

    def lineage(self, spark: SparkSession) -> DataFrame:
        """Per-epoch lineage/metrics as a DataFrame (T8/A7 analog —
        reference ``progress_logger.py:30-83``)."""
        rows = []
        for pipe, epochs in self.manifest()["ledger"].items():
            for epoch, info in epochs.items():
                rows.append(
                    {
                        "pipeline_id": pipe,
                        "epoch": int(epoch),
                        "rows": int(info.get("rows", 0)),
                        "upserts": int(info.get("upserts", 0)),
                        "deletes": int(info.get("deletes", 0)),
                        "quarantined": int(info.get("quarantined", 0)),
                        "version": int(info.get("version", -1)),
                        "committed_at": float(info.get("committed_at", 0.0)),
                        "duration_ms": float(info.get("duration_ms", 0.0)),
                        "max_seq": int(info.get("max_seq", -1)),
                    }
                )
        schema = (
            "pipeline_id string, epoch long, rows long, upserts long, "
            "deletes long, quarantined long, version long, committed_at double, "
            "duration_ms double, max_seq long"
        )
        return spark.createDataFrame(rows, schema=schema)

    # ----------------------------------------------------------------- reads
    def _read_files(
        self, spark: SparkSession, files: list[dict], schema: T.StructType
    ) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, f["path"]) for f in files]
        # recursiveFileLookup disables hive partition inference so mixed
        # snapshot dir layouts never surface phantom partition columns;
        # explicit schema null-fills columns absent from old files
        # (additive evolution).
        return (
            spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(*paths)
        )

    def read_raw(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """All row versions incl. tombstones (the unmerged-parts view)."""
        m = self.manifest(version)
        return self._read_files(spark, m["files"], self.schema(version))

    def read_final(
        self,
        spark: SparkSession,
        version: int | None = None,
        strategy: str = "auto",
    ) -> DataFrame:
        """Latest row image per key, tombstones dropped — ``FINAL``.

        Fast path: if only compacted base files exist, they are already
        unique-per-key, so no dedup aggregation is planned at all.

        Dedup strategies over deltas:
        * ``agg``  — ``groupBy(key).max_by(struct(payload), _rev)``: one
          shuffle of the full (wide) rows, planned as a SortAggregate
          because the buffer holds arrays. Partial phase collapses hot
          keys map-side. Right when the winner set is huge.
        * ``join`` — hash-aggregate the NARROW ``(key, max(_rev))``
          winner set, then broadcast-semi-join it back: the wide rows
          are never shuffled or sorted at all; only the winner rows
          (≤ live keys) pass through a small dedup. Right when winners
          fit the broadcast budget — the common compaction case.
        * ``auto`` — decided ENTIRELY from manifest statistics, no job
          and no driver sync: ``join`` when the winner-count upper
          bound fits ``broadcast_winner_limit``, ``window`` otherwise.
          The bound is min(summed file rows, running ``keys_bound``) —
          the latter accumulates each append commit's HLL distinct-key
          estimate (observed on the write job itself, zero extra cost)
          and is reset exact by full compaction, so a hot-key replay
          whose 16M delta rows cover 1.1M keys still picks the
          broadcast join from pure metadata. This replaces the
          round-4 exact-count probe whose ``count()`` sync was a fixed
          driver-serial phase at every cluster size.
        * ``probe`` — the exact-count variant: run a narrow
          (key, max_rev) pass, decide join-vs-agg on its TRUE winner
          count, and reuse the checkpointed winners in the join. Best
          absolute wall on few cores when file stats badly overcount
          winners (A/B'd: wins/ties window at 1 and 4 isolated
          executors at 16M events), but its count sync + broadcast
          build are driver-serial — prefer ``auto`` on real clusters.
        * ``window`` — one key-hash exchange → sort → row_number: no
          broadcast collect/build and no count sync (serial-phase-free;
          see ``compact``'s docstring for the A/B).
        """
        m = self.manifest(version)
        schema = self.schema(version)
        files = m["files"]
        if all(f.get("kind") == "base" for f in files):
            df = self._read_files(spark, files, schema)
            return df.filter(~F.col(DELETED_COL)).drop(DELETED_COL)
        # bucket-pruned dedup after PARTIAL compaction: buckets whose
        # files are all base are already unique-per-key — read them
        # straight and pay the dedup aggregate only for the buckets that
        # still carry deltas. Merge-on-read cost stays proportional to
        # the uncompacted fraction, not the table. (Any unbucketed file
        # forces the global path: its rows span every bucket.)
        if all(f.get("bucket") is not None for f in files):
            delta_buckets = {
                f["bucket"] for f in files if f.get("kind") != "base"
            }
            clean = [
                f for f in files
                if f["kind"] == "base" and f["bucket"] not in delta_buckets
            ]
            dirty = [f for f in files if f["bucket"] in delta_buckets]
            if clean and dirty:
                base_part = self._read_files(spark, clean, schema).filter(
                    ~F.col(DELETED_COL)
                ).drop(DELETED_COL)
                merged = self._dedup_final(
                    spark, dirty, schema, strategy, m.get("keys_bound")
                )
                return base_part.unionByName(merged)
        return self._dedup_final(
            spark, files, schema, strategy, m.get("keys_bound")
        )

    def _dedup_final(self, spark: SparkSession, files: list[dict],
                     schema: T.StructType, strategy: str,
                     keys_bound: int | None = None) -> DataFrame:
        latest = self._dedup_latest(spark, files, schema, strategy, keys_bound)
        return latest.filter(~F.col(DELETED_COL)).drop(DELETED_COL)

    def _dedup_latest(self, spark: SparkSession, files: list[dict],
                      schema: T.StructType, strategy: str,
                      keys_bound: int | None = None) -> DataFrame:
        """Latest row image per key, tombstones KEPT (``_deleted`` flags
        the losers-of-nothing: keys whose newest event is a delete)."""
        df = self._read_files(spark, files, schema)
        winners = None
        if strategy == "auto":
            # job-free decision from manifest stats only — NO winner
            # count job, NO driver sync. Two independent upper bounds on
            # the distinct winner count: (a) summed file rows (base
            # files are unique-per-key; delta rows overcount rewritten
            # keys), and (b) the manifest's running keys_bound — the
            # per-commit HLL distinct estimates accumulated by
            # append_delta (inflated 10% for HLL error). (b) is what
            # makes hot-key replays pick the broadcast join without the
            # old exact-count probe: 16M delta rows over 1.1M keys bound
            # to ~1.2M, not 16M. "join" chosen here is broadcast-safe
            # because both are near-upper bounds (see the ±10% HLL
            # caveat above); past the budget the plan degrades to the
            # serial-phase-free window — exactly where a billion-key
            # table needs the shuffle plan anyway.
            #
            # r06 refinement — the choice is also PARALLELISM-aware:
            # the broadcast path's cost is serial-ish in the winner
            # count (driver collect + hash-relation build, then the
            # relation ships to every executor: ~bound x parallelism
            # bytes of traffic), while the window plan's cost is the
            # wide-row shuffle spread over the cluster (~rows / cores
            # per core). So the join only pays off while
            # bound x parallelism stays within ~2x the row count.
            # Interleaved A/B at sf1.0 local[32] (20.4M rows, 1.42M
            # winners): join 6.3-21.2 s (driver-serial build is host-
            # weather-exposed) vs window 5.2-6.0 s; at 1-4 process-
            # isolated executors with 1.1M winners the join won ~2x
            # (round-5 A/B) — both regimes fall out of this rule with
            # no count job and no driver sync.
            est = sum(f["rows"] or 0 for f in files)
            bound = est
            if keys_bound is not None:
                # 2-sigma margin over HLL's default 5% rsd
                bound = min(est, int(keys_bound * 1.10) + 16)
            par = spark.sparkContext.defaultParallelism
            strategy = (
                "join"
                if (bound <= self._broadcast_winner_limit
                    and bound * par <= 2 * est)
                else "window"
            )
        elif strategy == "probe":
            # exact-count variant: pay one narrow (key, max_rev) pass to
            # learn the TRUE winner count before committing to a plan.
            # The checkpointed winners feed the join when it fits, so
            # the pass is reused — but when the answer is "agg" the
            # checkpoint is abandoned, so explicitly release its
            # executor-storage blocks (localCheckpoint blocks are
            # non-replicated and are NOT lineage-recoverable).
            est = sum(f["rows"] or 0 for f in files)
            if est <= self._broadcast_winner_limit:
                strategy = "join"
            else:
                winners = df.groupBy(self.key).agg(
                    F.max(REV_COL).alias(REV_COL)
                ).localCheckpoint()
                n = winners.count()
                if n <= self._broadcast_winner_limit:
                    strategy = "join"
                else:
                    # Dataset.unpersist is a no-op for checkpoint blocks
                    # (they belong to the RDD, not the SQL cache) — free
                    # the LogicalRDD directly
                    from ..util import free_local_checkpoint

                    free_local_checkpoint(winners)
                    winners = None
                    strategy = "agg"
        if strategy == "window":
            # compaction's plan: ONE hash exchange on the key, sort,
            # row_number — no broadcast collect/build, no winner count
            # sync, no second dedup shuffle. The window is partitioned
            # (never the global-sort anti-pattern); map-side partial agg
            # is worth little here because epoch deltas are already
            # pre-reduced per key, so the serial-phase-free plan scales
            # with cores where the broadcast path pays fixed driver
            # costs at every cluster size.
            from pyspark.sql import Window as W

            w = W.partitionBy(self.key).orderBy(F.col(REV_COL).desc())
            out = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        elif strategy == "join":
            if winners is None:
                winners = df.groupBy(self.key).agg(
                    F.max(REV_COL).alias(REV_COL)
                )
            joined = df.join(
                F.broadcast(winners), [self.key, REV_COL], "left_semi"
            )
            # duplicate-delivery safety: identical (key, _rev) rows may
            # exist across replayed delta files; tiny winner-sized dedup.
            # Tables whose writer guarantees (key, _rev) uniqueness — the
            # engine's own apply path does: the ledger makes epochs
            # exactly-once and the change-log seq is unique — can set
            # the assume_unique_rev property to skip this shuffle (the
            # same source-uniqueness contract an Iceberg/Delta MERGE
            # places on its source); the agg/window strategies never
            # needed it (one row per key by construction).
            if self.assume_unique_rev:
                out = joined
            else:
                out = joined.dropDuplicates([self.key, REV_COL])
        else:
            payload = [f.name for f in schema.fields if f.name != self.key]
            # max_by = partial-agg last-writer-wins: hot keys pre-collapse
            # map-side instead of flooding one window partition.
            agg = df.groupBy(self.key).agg(
                F.max_by(F.struct(*payload), F.col(REV_COL)).alias("_latest")
            )
            out = agg.select(self.key, "_latest.*")
        return out

    # winners above this row estimate fall back to the shuffle plan
    # (5M keys ≈ 200 MB broadcast — inside the default 1g driver-result
    # / executor-broadcast budgets with 2x headroom; 10M was flagged as
    # aggressive in round-1 review)
    _broadcast_winner_limit = 5_000_000

    # dedup strategy used by compact(): "auto" (job-free, every phase
    # executor-parallel — the scaling-safe default), or any explicit
    # strategy from read_final ("probe" trades a driver-serial exact
    # count + broadcast build for the best absolute wall on few cores)
    dedup_strategy = "auto"

    def read_bucket_files(
        self, spark: SparkSession, buckets: set[int]
    ) -> DataFrame:
        """Bucket-pruned raw read (point-lookup / partial-compaction path)."""
        m = self.manifest()
        picked = [
            f for f in m["files"] if f.get("bucket") is None or f["bucket"] in buckets
        ]
        return self._read_files(spark, picked, self.schema())

    def _point_lookup_files(self, value: str, bucket: int,
                            version: int | None = None) -> list[dict]:
        """Files that can possibly contain ``value``: bucket-pruned
        (a bucketed file only holds its bucket's keys) then key-range
        pruned from the manifest's footer min/max stats (the Iceberg
        lower/upper-bounds skip). Unbucketed or stats-less files are
        always candidates (never silently skipped)."""
        out = []
        for f in self.manifest(version)["files"]:
            if f.get("bucket") is not None and f["bucket"] != bucket:
                continue
            if "key_min" in f and not (f["key_min"] <= value <= f["key_max"]):
                continue
            out.append(f)
        return out

    def point_lookup(self, spark: SparkSession, value,
                     version: int | None = None) -> DataFrame:
        """Latest live row image for ONE key — the O(1)-ish read path.

        Scan cost is the handful of files whose hash bucket AND footer
        key range admit the key (``_point_lookup_files``), not the
        table: at 10^10 rows with 4k buckets and compacted bases this is
        typically 1-2 files, each further row-group-pruned by parquet's
        own key statistics under the pushed ``key = value`` filter.
        Returns an empty frame if the key is absent or deleted."""
        nb = self.manifest(version).get("n_buckets", self.n_buckets)
        schema = self.schema(version)
        # hash the lookup value AS the table's key type: xxhash64 over a
        # Python-inferred literal type (e.g. int32 for a small int, or
        # string for a stringified number) yields a DIFFERENT hash than
        # the write-side xxhash64 over the actual column, silently
        # pruning the right bucket to an empty result (ADVICE r05)
        ktype = schema[self.key].dataType
        bucket_row = spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(value).cast(ktype)), F.lit(nb))
        ).first()
        cand = self._point_lookup_files(value, int(bucket_row[0]), version)
        if not cand:
            return spark.createDataFrame([], schema).filter(
                ~F.col(DELETED_COL)
            ).drop(DELETED_COL)
        df = self._read_files(spark, cand, schema).filter(
            F.col(self.key) == F.lit(value)
        )
        latest = self._dedup_latest_frame(df, schema)
        return latest.filter(~F.col(DELETED_COL)).drop(DELETED_COL)

    def _dedup_latest_frame(self, df: DataFrame,
                            schema: T.StructType) -> DataFrame:
        """max_by last-writer-wins over an already-loaded frame (the agg
        strategy, for tiny pre-pruned inputs)."""
        payload = [f.name for f in schema.fields if f.name != self.key]
        agg = df.groupBy(self.key).agg(
            F.max_by(F.struct(*payload), F.col(REV_COL)).alias("_latest")
        )
        return agg.select(self.key, "_latest.*")

    def scan_keys(self, spark: SparkSession, values: list,
                  version: int | None = None) -> DataFrame:
        """Latest live images for a SMALL key list (batch point lookup):
        union of the keys' bucket+key-range-admitted files scanned ONCE
        with an IN filter (pushed to parquet), then the tiny max_by
        dedup. Scan cost ∝ files admitted for the requested keys, not
        the table; for corpus-sized key sets use a broadcast/semi join
        against ``read_final`` instead — this path computes one bucket
        hash per requested key on the driver."""
        if not values:
            raise ValueError("scan_keys needs at least one key")
        nb = self.manifest(version).get("n_buckets", self.n_buckets)
        # the key frame is typed from the TABLE schema, not assumed
        # string: a non-string key hashed as string lands in the wrong
        # buckets and the scan silently misses every row (ADVICE r05)
        ktype = self.schema(version)[self.key].dataType
        brows = spark.createDataFrame(
            [(v,) for v in values],
            T.StructType([T.StructField(self.key, ktype)]),
        ).select(
            self.key,
            F.pmod(F.xxhash64(F.col(self.key)), F.lit(nb)).alias("b"),
        ).collect()
        cand_paths: dict[str, dict] = {}
        for r in brows:
            for f in self._point_lookup_files(r[self.key], int(r["b"]),
                                              version):
                cand_paths[f["path"]] = f
        schema = self.schema(version)
        if not cand_paths:
            return spark.createDataFrame([], schema).filter(
                ~F.col(DELETED_COL)
            ).drop(DELETED_COL)
        df = self._read_files(
            spark, list(cand_paths.values()), schema
        ).filter(F.col(self.key).isin(*values))
        latest = self._dedup_latest_frame(df, schema)
        return latest.filter(~F.col(DELETED_COL)).drop(DELETED_COL)

    # ---------------------------------------------------------------- writes
    def _bucket_expr(self):
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets))

    def _write_data(
        self, df: DataFrame, subdir: str, by_bucket: bool,
        shuffle: bool = True,
    ) -> list[dict]:
        """Write df under data/<subdir>/ and return manifest file entries.

        ``by_bucket=True`` writes one directory per key-hash bucket
        (partitionBy) so entries carry a bucket id for pruning.
        ``shuffle=False`` replaces the bucket repartition with a narrow
        ``coalesce`` — for callers whose frame is ALREADY key-hash
        partitioned (e.g. the compaction dedup output): every row of a
        bucket then still lands in files of that bucket's directory, the
        writer-task cap still holds, and one full-data exchange is
        saved (a bucket may span several files, which the manifest
        layout already supports).
        """
        out_dir = os.path.join(self._data_dir, subdir)
        if by_bucket:
            # Writer-task cap: repartition to min(cap, n_buckets) tasks,
            # each writing its buckets' dirs sequentially via partitionBy
            # — same per-bucket file layout (pruning unaffected), bounded
            # concurrent writers. n_buckets concurrent single-file writer
            # tasks anti-scale on kernels whose write path degrades past
            # ~8 concurrent writers (this sandbox — BENCH/ENVIRONMENT.md);
            # on a real cluster writers spread across nodes, so set
            # SPARK_GRAFT_MAX_WRITERS to executor count or higher.
            cap = int(os.environ.get("SPARK_GRAFT_MAX_WRITERS", "8"))
            out = df.withColumn(BUCKET_COL, self._bucket_expr())
            out = (
                out.coalesce(min(cap, self.n_buckets)) if not shuffle
                else out.repartition(min(cap, self.n_buckets), BUCKET_COL)
            )
            # near-free key clustering: the dynamic-partition writer
            # sorts each task's rows by the partition column anyway (to
            # keep one open file per dir); extending that sort with the
            # merge key makes every data file key-sorted, so parquet's
            # per-row-group key min/max become tight and point lookups
            # prune ROW GROUPS inside the (bucket, key-range)-admitted
            # files — the ORDER BY clustering Iceberg's
            # rewrite_data_files sort strategy provides.
            out = out.sortWithinPartitions(BUCKET_COL, self.key)
            (
                out.write.partitionBy(BUCKET_COL)
                .mode("errorifexists")
                .parquet(out_dir)
            )
        else:
            df.write.mode("errorifexists").parquet(out_dir)
        entries: list[dict] = []
        for root, _dirs, names in os.walk(out_dir):
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, self.path)
                bucket = None
                mb = re.search(rf"{BUCKET_COL}=(\d+)", rel)
                if mb:
                    bucket = int(mb.group(1))
                entries.append({"path": rel, "bucket": bucket, "rows": None})
        return entries

    @staticmethod
    def _count_rows(entries: list[dict], table_path: str,
                    key: str | None = None) -> None:
        """Fill per-file row counts, ``_rev`` min/max, and (when ``key``
        is given) merge-key min/max from parquet footer statistics (no
        data read). The rev range drives file-skipping in
        ``read_changes``; the key range drives file-skipping in
        ``point_lookup`` — the Iceberg lower_bounds/upper_bounds
        manifest-stats analog."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def _minmax(md, name):
            try:
                idx = md.schema.names.index(name)
            except ValueError:
                return None
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None  # stats disabled: never skipped
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            return (lo, hi) if hi is not None else None

        def _one(e):
            done_key = key is None or "key_max" in e
            if e["rows"] is not None and "rev_max" in e and done_key:
                return
            md = pq.ParquetFile(
                os.path.join(table_path, e["path"])
            ).metadata
            e["rows"] = md.num_rows
            if md.num_rows == 0:
                # an empty part file can't contain changes: give it a
                # below-everything rev range so read_changes skips it
                e["rev_min"] = e["rev_max"] = -(1 << 62)
                return
            mm = _minmax(md, REV_COL)
            if mm is not None:
                e["rev_min"], e["rev_max"] = int(mm[0]), int(mm[1])
            if key is not None:
                km = _minmax(md, key)
                if km is not None:
                    lo, hi = km
                    if isinstance(lo, bytes):
                        lo, hi = lo.decode("utf-8", "replace"), \
                            hi.decode("utf-8", "replace")
                    e["key_min"], e["key_max"] = lo, hi

        with ThreadPoolExecutor(max_workers=16) as ex:
            list(ex.map(_one, entries))

    def rev_high(self, version: int | None = None) -> int:
        """Highest ``_rev`` committed as of ``version`` (the snapshot's
        change-log cursor). Served from manifest file entries; legacy
        entries written before rev stats existed fall back to a
        footer-only scan (no data read)."""
        m = self.manifest(version)
        legacy = [f for f in m["files"] if "rev_max" not in f]
        if legacy:
            self._count_rows(legacy, self.path)
        return max(
            (f["rev_max"] for f in m["files"] if f.get("rev_max") is not None),
            default=-(1 << 62),
        )

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        classify: bool = True,
    ) -> DataFrame:
        """Incremental change feed between two committed snapshots — the
        Iceberg changelog-scan / Delta Change Data Feed analog: the NET
        row-level change per key from the table state at ``from_version``
        to the state at ``to_version`` (default: current), as the
        after-image plus a ``_change_type`` column (INSERT /
        UPDATE_AFTER / DELETE). A key changed and changed back nets to
        its final state; a delete of a never-alive key is dropped.

        Scale shape: only files whose footer ``_rev`` range can exceed
        ``rev_high(from_version)`` are read (file skipping from manifest
        stats — compaction rewrites carry old revs and are skipped
        entirely, so the scan is proportional to NEW data, not table
        size). ``classify=True`` additionally semi-joins the
        ``from_version`` state restricted to the changed keys to split
        INSERT from UPDATE_AFTER; pass ``classify=False`` for the
        single-scan UPSERT/DELETE feed when the distinction doesn't
        matter downstream.

        The fast path requires ``_rev`` values monotone across commits
        (true for the change-log ``seq`` the streaming tail applies).
        Patch-by-replay of a withheld epoch breaks that: its rows carry
        their ORIGINAL low seq as ``_rev``, and although existing
        winners can't change (tombstones retained through compaction
        guarantee no resurrection), the replay CAN insert brand-new keys
        or delete keys last touched before it — net changes below
        ``rev_high(from_version)`` that rev-based skipping would drop.
        Every append commit therefore records the rev range it added
        (``appended_rev_min`` watermark); when any commit in
        ``(from, to]`` appended revs ≤ ``rev_high(from_version)``, this
        method falls back to a FULL SNAPSHOT DIFF of the two states
        (correct for any rev order; costs two dedup scans + one
        key join instead of a new-files-only scan). Commits older than
        the watermark field are detected via manifest file-list diffs.

        Retention: ``from_version``'s snapshot must still be fully
        retained — ``vacuum(keep_versions=...)`` deletes data files of
        old snapshots, so a consumer whose cursor lags beyond retention
        gets a loud error here (never a silently wrong feed). When
        tombstones are purged via ``compact(min_retained_rev=...)``,
        the same lower bound applies to the feed cursor: keep
        ``rev_high(cursor) ≥ min_retained_rev``."""
        m_to = self.manifest(to_version)
        if from_version > m_to["version"]:
            raise ValueError(
                f"read_changes from_version {from_version} is ahead of "
                f"to_version {m_to['version']} — a feed cursor can only "
                f"move forward"
            )
        schema = self.schema(to_version)
        self._check_retained(from_version)
        rev_a = self.rev_high(from_version)
        lo = self._min_appended_rev(from_version, m_to["version"])
        if lo is not None and lo <= rev_a:
            return self._snapshot_diff_feed(
                spark, from_version, to_version, classify
            )
        cand = [
            f for f in m_to["files"]
            if f.get("rev_max") is None or f["rev_max"] > rev_a
        ]
        changed = self._read_files(spark, cand, schema).filter(
            F.col(REV_COL) > rev_a
        )
        payload = [f.name for f in schema.fields if f.name != self.key]
        latest = changed.groupBy(self.key).agg(
            F.max_by(F.struct(*payload), F.col(REV_COL)).alias("_x")
        ).select(self.key, "_x.*")
        if not classify:
            return latest.withColumn(
                "_change_type",
                F.when(F.col(DELETED_COL), "DELETE").otherwise("UPSERT"),
            ).drop(DELETED_COL)
        before = self._dedup_latest(
            spark,
            self.manifest(from_version)["files"],
            self.schema(from_version),
            "auto",
            self.manifest(from_version).get("keys_bound"),
        )
        keys = latest.select(self.key)
        before_alive = (
            before.join(keys, self.key, "left_semi")
            .filter(~F.col(DELETED_COL))
            .select(self.key, F.lit(True).alias("_was"))
        )
        out = latest.join(before_alive, self.key, "left")
        ct = (
            F.when(F.col(DELETED_COL) & F.col("_was").isNotNull(), "DELETE")
            .when(F.col(DELETED_COL), F.lit(None).cast("string"))
            .when(F.col("_was").isNotNull(), "UPDATE_AFTER")
            .otherwise("INSERT")
        )
        return (
            out.withColumn("_change_type", ct)
            .filter(F.col("_change_type").isNotNull())
            .drop("_was", DELETED_COL)
        )

    def _check_retained(self, version: int | None) -> None:
        """Raise loudly if ``version``'s data files were vacuumed away.

        ``vacuum(keep_versions=K)`` deletes files referenced only by
        manifests older than the last K — a change-feed consumer whose
        cursor lags more than K versions behind must not get a partial
        (silently wrong) state reconstruction."""
        m = self.manifest(version)
        missing = [
            f["path"] for f in m["files"]
            if not os.path.exists(os.path.join(self.path, f["path"]))
        ]
        if missing:
            raise ValueError(
                f"snapshot v{m['version']} is no longer retained: "
                f"{len(missing)} data file(s) (first: {missing[0]}) were "
                f"removed, most likely by vacuum(keep_versions=...). A "
                f"change-feed cursor must stay within the vacuum "
                f"retention window; re-seed the consumer from a full "
                f"read_final snapshot instead."
            )

    def _min_appended_rev(self, from_version: int,
                          to_version: int) -> int | None:
        """Smallest ``_rev`` ADDED by any append commit in
        ``(from_version, to_version]`` — the out-of-order (repair)
        detector for read_changes. Served from the per-commit
        ``appended_rev_min`` watermark; append manifests written before
        the watermark existed fall back to a file-list diff against
        their parent (footer stats only, no data read)."""
        lo: int | None = None
        prev_paths: set[str] | None = None
        for v in range(from_version + 1, to_version + 1):
            m = self.manifest(v)
            if m.get("operation") not in (None, "append-delta"):
                prev_paths = {f["path"] for f in m["files"]}
                continue
            if "appended_rev_min" in m:
                v_lo = m["appended_rev_min"]
            else:
                if prev_paths is None:
                    prev_paths = {
                        f["path"] for f in self.manifest(v - 1)["files"]
                    }
                added = [f for f in m["files"] if f["path"] not in prev_paths]
                need = [f for f in added if "rev_min" not in f]
                if need:
                    self._count_rows(need, self.path)
                revs = [f["rev_min"] for f in added
                        if f.get("rev_min") is not None and f.get("rows")]
                v_lo = min(revs) if revs else None
            prev_paths = {f["path"] for f in m["files"]}
            if v_lo is not None and (lo is None or v_lo < lo):
                lo = v_lo
        return lo

    def _snapshot_diff_feed(self, spark: SparkSession, from_version: int,
                            to_version: int | None,
                            classify: bool) -> DataFrame:
        """Change feed as a full state diff — the correct-under-any-rev-
        order fallback used when a repair commit wrote revs below the
        feed cursor's high-water mark. Net change per key between the
        two snapshots' latest images: rows whose (``_rev``,
        ``_deleted``) pair differs, classified against the BEFORE
        liveness (a key dead on both sides nets to nothing; a
        never-alive delete is dropped — in classify=False mode this is
        strictly NETTER than the fast path, which emits such DELETEs
        because it never consults the before-state)."""
        before = self._dedup_latest(
            spark, self.manifest(from_version)["files"],
            self.schema(from_version), "auto",
            self.manifest(from_version).get("keys_bound"),
        ).select(
            F.col(self.key),
            F.col(REV_COL).alias("_b_rev"),
            F.col(DELETED_COL).alias("_b_del"),
        )
        schema = self.schema(to_version)
        after = self._dedup_latest(
            spark, self.manifest(to_version)["files"], schema, "auto",
            self.manifest(to_version).get("keys_bound"),
        )
        j = after.join(before, self.key, "left")
        changed = j.filter(
            F.col("_b_rev").isNull()
            | (F.col(REV_COL) != F.col("_b_rev"))
            | (F.col(DELETED_COL) != F.col("_b_del"))
        )
        was_alive = F.col("_b_rev").isNotNull() & ~F.col("_b_del")
        if classify:
            ct = (
                F.when(F.col(DELETED_COL) & was_alive, "DELETE")
                .when(F.col(DELETED_COL), F.lit(None).cast("string"))
                .when(was_alive, "UPDATE_AFTER")
                .otherwise("INSERT")
            )
        else:
            ct = (
                F.when(F.col(DELETED_COL) & was_alive, "DELETE")
                .when(F.col(DELETED_COL), F.lit(None).cast("string"))
                .otherwise("UPSERT")
            )
        payload = [f.name for f in schema.fields if f.name != self.key]
        return (
            changed.withColumn("_change_type", ct)
            .filter(F.col("_change_type").isNotNull())
            .select(self.key, *[c for c in payload if c != DELETED_COL],
                    "_change_type")
        )

    def _next_manifest(self, operation: str) -> dict:
        m = self.manifest()
        return {
            "version": m["version"] + 1,
            "parent": m["version"],
            "schema": m["schema"],
            "key": m["key"],
            "n_buckets": m["n_buckets"],
            "files": list(m["files"]),
            "ledger": json.loads(json.dumps(m["ledger"])),
            "properties": dict(m["properties"]),
            # running upper bound on the table's distinct keys (None =
            # unknown, e.g. a pre-field table or a stats-less append);
            # appends add their HLL estimate, full compaction resets it
            # to the exact base row count
            "keys_bound": m.get("keys_bound"),
            "committed_at": time.time(),
            "operation": operation,
        }

    def evolve_schema(self, extra: T.StructType) -> None:
        """Additive column / numeric-widening evolution committed as its
        own snapshot (no-op when nothing changes; widening changes
        TYPES, not names, so the comparison is on the full schema)."""
        cur = self.schema()
        merged = merge_schemas(cur, extra)
        if json.loads(merged.json()) == json.loads(cur.json()):
            return
        nm = self._next_manifest("evolve-schema")
        nm["schema"] = json.loads(merged.json())
        self._publish(nm)

    def _align(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project df onto schema: missing columns → typed nulls, order fixed."""
        have = set(df.columns)
        cols = [
            F.col(f.name).cast(f.dataType) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
        return df.select(*cols)

    def append_delta(
        self,
        df: DataFrame,
        *,
        pipeline_id: str = "default",
        epoch_id: int | None = None,
        stats: dict | None = None,
        stats_cb=None,
        staged: bool = False,
    ) -> dict:
        """Append an upsert/tombstone delta commit (the RMT part insert).

        ``df`` must carry payload columns + ``_rev`` + ``_deleted``. If
        ``epoch_id`` is given and already in the ledger, the commit is
        SKIPPED (exactly-once over at-least-once delivery). Ledger row and
        data files land in one atomic manifest publish.

        ``staged=True`` is the write half of write-audit-publish (the
        Iceberg WAP / branch-commit pattern): data files are written and
        the would-be manifest is saved UNSTAGED (``staged-<id>.json``,
        not linked into the version chain — invisible to every reader).
        Audit the staged state with ``read_staged``, then
        ``publish_staged`` (atomic, conflict-checked against commits
        that landed meanwhile) or ``abort_staged`` (removes the staged
        files). Returns ``{"staged": True, "staging_id": ...}``."""
        t0 = time.time()
        if epoch_id is not None and epoch_id in self.committed_epochs(pipeline_id):
            return {"skipped": True, "epoch": epoch_id}
        # auto-evolve: source carries columns the table lacks yet, or a
        # strictly wider lossless numeric type for an existing column
        # (int->long / float->double, Iceberg promotion rules)
        cur = self.schema()
        evolved = merge_schemas(cur, df.schema)
        if json.loads(evolved.json()) != json.loads(cur.json()):
            self.evolve_schema(df.schema)
        schema = self.schema()
        aligned = self._align(df, schema)
        sub = f"delta-{uuid.uuid4().hex[:12]}"
        entries = self._write_data(aligned, sub, by_bucket=False)
        for e in entries:
            e["kind"] = "delta"
        self._count_rows(entries, self.path, key=self.key)
        rows = sum(e["rows"] for e in entries)
        extra = dict(stats or {})
        if stats_cb is not None:
            # data write (the action) is done — observed metrics are ready;
            # they land in the SAME atomic manifest commit as the data.
            extra.update(stats_cb() or {})

        def build_nm() -> dict:
            """Metadata for this append ON TOP OF the current head —
            rebuilt per commit attempt, so a lost publish race replans
            ONLY this JSON (the data files are immutable and
            parent-independent), never the data write: the Iceberg
            optimistic-commit-retry model."""
            nm = self._next_manifest("append-delta")
            nm["files"].extend(entries)
            # repair watermark: the rev range this commit ADDS.
            # read_changes uses it to detect out-of-order commits
            # (patch-by-replay of a withheld epoch carries its ORIGINAL
            # low seq as _rev) inside a feed range and fall back to a
            # full snapshot diff — rev-based file skipping would
            # silently drop such a commit's net changes (new keys
            # inserted, or old keys deleted, at a rev below the
            # consumer's high-water mark).
            revs = [e["rev_min"] for e in entries
                    if e.get("rev_min") is not None and e["rows"]]
            if revs:
                nm["appended_rev_min"] = min(revs)
                nm["appended_rev_max"] = max(
                    e["rev_max"] for e in entries
                    if e.get("rev_max") is not None and e["rows"]
                )
            # running distinct-key upper bound: this commit's HLL
            # estimate (riding the write job as an Observation — zero
            # extra cost) adds to the parent's bound. A stats-less
            # append poisons the bound to None (unknown) until the next
            # full compaction resets it to the exact base count. The
            # sum of per-commit EXACT distincts upper-bounds the union;
            # HLL carries ~2% relative error per term, so the consumer
            # (_dedup_latest auto) inflates the bound by 10% before
            # comparing it to the broadcast budget.
            dk = extra.get("distinct_keys")
            kb = nm.get("keys_bound")
            nm["keys_bound"] = (
                kb + int(dk) if (kb is not None and dk is not None)
                else None
            )
            if epoch_id is not None:
                led = nm["ledger"].setdefault(pipeline_id, {})
                led[str(epoch_id)] = {
                    "rows": rows,
                    "version": nm["version"],
                    "committed_at": time.time(),
                    "duration_ms": (time.time() - t0) * 1000.0,
                    **extra,
                }
            return nm

        nm = build_nm()
        if staged:
            sid = uuid.uuid4().hex[:12]
            spath = os.path.join(self._manifest_dir, f"staged-{sid}.json")
            with open(spath, "w") as f:
                json.dump(
                    {
                        "manifest": nm,
                        "added": [e["path"] for e in entries],
                        "data_sub": sub,
                        "staged_at": time.time(),
                    },
                    f,
                )
            return {"skipped": False, "staged": True, "staging_id": sid,
                    "epoch": epoch_id, "rows": rows,
                    "parent_version": nm["parent"]}
        retries = int(os.environ.get("SPARK_GRAFT_COMMIT_RETRIES", "3"))
        for attempt in range(retries + 1):
            try:
                self._publish(nm)
                return {"skipped": False, "epoch": epoch_id, "rows": rows,
                        "version": nm["version"]}
            except CommitConflict:
                # a concurrent writer took our version. The expensive
                # half (data files) is parent-independent — replan the
                # metadata on the new head and retry; only give up (and
                # clean the orphaned files) when retries are exhausted
                # or the racing writer committed OUR epoch.
                if (epoch_id is not None
                        and epoch_id in self.committed_epochs(pipeline_id)):
                    shutil.rmtree(os.path.join(self._data_dir, sub),
                                  ignore_errors=True)
                    return {"skipped": True, "epoch": epoch_id}
                if attempt == retries:
                    shutil.rmtree(os.path.join(self._data_dir, sub),
                                  ignore_errors=True)
                    raise
                nm = build_nm()

    # -------------------------------------------------- write-audit-publish
    def _staged_path(self, staging_id: str) -> str:
        return os.path.join(self._manifest_dir, f"staged-{staging_id}.json")

    def _load_staged(self, staging_id: str) -> dict:
        p = self._staged_path(staging_id)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"no staged commit {staging_id} at {self.path} (already "
                f"published or aborted?)"
            )
        with open(p) as f:
            return json.load(f)

    def read_staged(self, spark: SparkSession, staging_id: str,
                    strategy: str = "auto") -> DataFrame:
        """The table state AS IF the staged commit were published — the
        audit surface of write-audit-publish. Runs the normal final-state
        dedup over the staged manifest's file set; no committed reader
        can see any of it."""
        st = self._load_staged(staging_id)
        nm = st["manifest"]
        schema = schema_from_json(json.dumps(nm["schema"]))
        return self._dedup_final(
            spark, nm["files"], schema, strategy, nm.get("keys_bound")
        )

    def publish_staged(self, staging_id: str) -> dict:
        """Atomically link a staged commit into the version chain.

        Conflict rule (strict, like Iceberg's fast-forward): the staged
        manifest's parent must still be the table head — a commit that
        landed after staging raises ``CommitConflict`` (re-stage on the
        new head; data files are immutable so re-staging re-plans only
        metadata). The ledger row staged with the commit publishes with
        it, so exactly-once still holds end-to-end."""
        st = self._load_staged(staging_id)
        nm = st["manifest"]
        head = self.current_version()
        if nm["parent"] != head:
            raise CommitConflict(
                f"staged commit {staging_id} has parent v{nm['parent']} "
                f"but the table head is v{head}: a commit landed after "
                f"staging. Abort and re-stage on the current head."
            )
        self._publish(nm)
        os.unlink(self._staged_path(staging_id))
        return {"published": True, "version": nm["version"],
                "staging_id": staging_id}

    def abort_staged(self, staging_id: str) -> dict:
        """Drop a staged commit: its data files (referenced by no
        committed manifest) and its staged metadata."""
        st = self._load_staged(staging_id)
        shutil.rmtree(
            os.path.join(self._data_dir, st["data_sub"]), ignore_errors=True
        )
        os.unlink(self._staged_path(staging_id))
        return {"aborted": True, "staging_id": staging_id,
                "removed_files": len(st["added"])}

    def staged_commits(self) -> list[str]:
        """Ids of pending staged commits (audit queue)."""
        return sorted(
            f[len("staged-"):-len(".json")]
            for f in os.listdir(self._manifest_dir)
            if f.startswith("staged-") and f.endswith(".json")
        )

    def compact_deltas(self, spark: SparkSession) -> dict:
        """MINOR compaction: fold the UNBUCKETED delta files (narrow
        epoch appends) into hash-bucketed delta files — every row
        version kept, no merge, one capped-writer repartition pass.
        After this, every file carries a bucket id, which is what makes
        bucket-subset major compaction possible: a bucket's rows then
        live ONLY in that bucket's files. This is the LSM L0→L1 fold;
        at 10^10-event scale it runs continuously on recent epochs while
        major compaction visits each bucket on its own cadence."""
        m = self.manifest()
        todo = [f for f in m["files"] if f.get("bucket") is None]
        if not todo:
            return {"compacted": False, "reason": "no-unbucketed-files"}
        df = self._read_files(spark, todo, self.schema())
        sub = f"deltab-v{m['version'] + 1}-{uuid.uuid4().hex[:8]}"
        entries = self._write_data(df, sub, by_bucket=True)
        for e in entries:
            e["kind"] = "delta"
        self._count_rows(entries, self.path, key=self.key)
        nm = self._next_manifest("compact-minor")
        drop = {f["path"] for f in todo}
        nm["files"] = [
            f for f in nm["files"] if f["path"] not in drop
        ] + entries
        self._publish(nm)
        return {
            "compacted": True,
            "version": nm["version"],
            "bucketed_files": len(entries),
            "replaced_files": len(drop),
        }

    def compact(self, spark: SparkSession,
                buckets: set[int] | None = None,
                min_retained_rev: int | None = None,
                new_n_buckets: int | None = None) -> dict:
        """Fold deltas into unique-per-key, hash-bucketed base files —
        the ``OPTIMIZE TABLE … FINAL`` analog. Old files are dropped
        from the manifest (garbage-collectable); ledger is preserved.

        Tombstones are RETAINED in the base by default (one row per
        deleted key at its delete ``_rev``), mirroring the Iceberg sink's
        merge contract (``lake/iceberg.py``): a later replay of an OLDER
        withheld epoch (patch-by-replay, C5) carries a lower ``_rev``
        than the tombstone, so the delete keeps winning max-``_rev``
        dedup and the key cannot be resurrected. ``read_final`` filters
        tombstones at read time so results are unchanged. Pass
        ``min_retained_rev`` to PURGE tombstones with
        ``_rev < min_retained_rev`` — the replay horizon below which the
        caller guarantees no epoch will ever be replayed (the
        ``purge_tombstones_sql`` analog; running compact with a horizon
        on an all-base table is the standalone purge pass).

        ``buckets=None`` rewrites the whole table. ``buckets={...}``
        is MAJOR compaction of a bucket subset: only those buckets'
        files are read and rewritten — the incremental form a 100 TB
        table needs (never a full rewrite; each bucket compacts on its
        own schedule). Unbucketed deltas are folded first
        (``compact_deltas``) so the subset's rows are self-contained.

        ``new_n_buckets`` evolves the bucket count (grow when per-bucket
        size outruns executor memory) — a FULL rewrite by definition
        (every row re-hashes), so it requires ``buckets=None``. Older
        snapshots keep their own ``n_buckets`` in their manifests; the
        version-aware readers (``point_lookup``) use the manifest's
        value, never the live attribute."""
        if new_n_buckets is not None and buckets is not None:
            raise ValueError(
                "bucket-count evolution re-hashes every row: it requires "
                "a full compaction (buckets=None)"
            )
        if buckets is not None:
            self.compact_deltas(spark)
        m = self.manifest()
        if buckets is None:
            target = list(m["files"])
        else:
            target = [f for f in m["files"] if f["bucket"] in buckets]
        if not target:
            return {"compacted": False, "reason": "no-files"}
        if (all(f.get("kind") == "base" for f in target)
                and min_retained_rev is None
                and (new_n_buckets is None
                     or new_n_buckets == self.n_buckets)):
            return {"compacted": False, "reason": "already-base"}
        if new_n_buckets is not None:
            self.n_buckets = new_n_buckets
        schema = self.schema()
        # job-free auto dedup (broadcast join while the manifest row
        # bound fits the budget, single-exchange window beyond) +
        # shuffle-free bucket write. Rationale: the exact-count "probe"
        # variant wins/ties on absolute wall at 1 and 4 isolated
        # executors (its winner collect is small next to the saved wide
        # sort) but its count() sync is a fixed driver-serial phase. The
        # shipped auto gets the SAME broadcast-join plan with NO job:
        # the manifest's running keys_bound (per-commit HLL estimates
        # accumulated at append time, riding the write job) bounds the
        # winner count, so a 16M-row/1.1M-key replay compaction decides
        # "join" from pure metadata — A/B'd: the window plan is ~2x
        # slower at BOTH 1 and 4 isolated executors with the same ~2.3x
        # internal scaling, so avoiding the wide shuffle+sort wins at
        # every cluster size while the bound fits the broadcast budget.
        final = self._dedup_latest(
            spark, target, schema, self.dedup_strategy,
            m.get("keys_bound"),
        )
        if min_retained_rev is not None:
            final = final.filter(
                ~F.col(DELETED_COL) | (F.col(REV_COL) >= min_retained_rev)
            )
        final = self._align(final, schema)
        sub = f"base-v{m['version'] + 1}-{uuid.uuid4().hex[:8]}"
        entries = self._write_data(final, sub, by_bucket=True, shuffle=False)
        for e in entries:
            e["kind"] = "base"
        self._count_rows(entries, self.path, key=self.key)
        nm = self._next_manifest(
            "compact" if buckets is None else "compact-buckets"
        )
        nm["n_buckets"] = self.n_buckets
        drop = {f["path"] for f in target}
        kept = [f for f in nm["files"] if f["path"] not in drop]
        nm["files"] = kept + entries if buckets is not None else entries
        if buckets is None:
            # full compaction: base rows are exactly one per key (live +
            # retained tombstones) — reset the running HLL bound to the
            # exact count, healing any None poisoning from stats-less
            # appends
            nm["keys_bound"] = sum(e["rows"] for e in entries)
        self._publish(nm)
        return {
            "compacted": True,
            "version": nm["version"],
            "base_files": len(entries),
            "rows": sum(e["rows"] for e in entries),
            "replaced_files": len(drop),
        }

    def stats(self) -> dict:
        """Operational summary from the manifest chain only (no job):
        sizes, layout, merge-on-read debt, commit counts — the
        DESCRIBE EXTENDED / table-metrics surface."""
        m = self.manifest()
        files = m["files"]
        base = [f for f in files if f.get("kind") == "base"]
        delta = [f for f in files if f.get("kind") != "base"]
        plan = self.plan_compaction()
        return {
            "version": m["version"],
            "n_buckets": m["n_buckets"],
            "files": len(files),
            "base_files": len(base),
            "delta_files": len(delta),
            "base_rows": sum(f["rows"] or 0 for f in base),
            "delta_rows": sum(f["rows"] or 0 for f in delta),
            "keys_bound": m.get("keys_bound"),
            "rev_high": self.rev_high(),
            "committed_epochs": {
                p: len(led) for p, led in m["ledger"].items()
            },
            "staged_commits": self.staged_commits(),
            "compaction_due": bool(plan["minor"] or plan["buckets"]),
            "schema_fields": len(m["schema"].get("fields", [])),
        }

    def clone_to(self, dest: str) -> "LakeTable":
        """Zero-copy snapshot clone: hard-link the CURRENT version's
        data files under ``dest`` and start a fresh manifest chain at
        v0 referencing them — the Delta SHALLOW CLONE / Iceberg
        snapshot-table analog for dev/test forks. The clone is fully
        independent going forward (its own commits, ledger, vacuum);
        hard links mean the shared immutable files cost no extra
        storage, and either side vacuuming its link never deletes the
        other's (link count protects the inode). Requires dest on the
        same filesystem."""
        m = self.manifest()
        os.makedirs(os.path.join(dest, "manifest"), exist_ok=False)
        os.makedirs(os.path.join(dest, "data"), exist_ok=True)
        files = []
        for f in m["files"]:
            src = os.path.join(self.path, f["path"])
            dst = os.path.join(dest, f["path"])
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.link(src, dst)
            files.append(dict(f))
        t = LakeTable(dest, key=self.key, n_buckets=m["n_buckets"])
        t.assume_unique_rev = self.assume_unique_rev
        t._publish({
            "version": 0,
            "parent": None,
            "schema": m["schema"],
            "key": m["key"],
            "n_buckets": m["n_buckets"],
            "files": files,
            "ledger": json.loads(json.dumps(m["ledger"])),
            "properties": dict(m["properties"]),
            "keys_bound": m.get("keys_bound"),
            "committed_at": time.time(),
            "operation": f"clone-of-{self.path}@v{m['version']}",
        })
        return t

    def plan_compaction(
        self,
        max_delta_rows_per_bucket: int = 1_000_000,
        max_delta_files_per_bucket: int = 8,
        max_unbucketed_files: int = 32,
    ) -> dict:
        """Maintenance scheduling from MANIFEST STATS ONLY (no job, no
        scan): which buckets' merge-on-read debt exceeds the thresholds,
        and whether the unbucketed L0 (raw epoch appends) needs a minor
        fold first. The per-bucket cadence a 10^10-row table runs on —
        call on a timer, feed ``buckets`` into ``compact``:

            plan = table.plan_compaction()
            if plan["minor"]:
                table.compact_deltas(spark)
            if plan["buckets"]:
                table.compact(spark, buckets=plan["buckets"])

        Unbucketed delta rows are counted against EVERY bucket's debt
        (their rows may land anywhere), which is why the minor fold runs
        first — it converts L0 debt into per-bucket debt that this
        planner can then localize."""
        m = self.manifest()
        unb_files = [f for f in m["files"] if f.get("bucket") is None]
        unb_rows = sum(f["rows"] or 0 for f in unb_files)
        rows: dict[int, int] = {}
        nfiles: dict[int, int] = {}
        for f in m["files"]:
            b = f.get("bucket")
            if b is None or f.get("kind") == "base":
                continue
            rows[b] = rows.get(b, 0) + (f["rows"] or 0)
            nfiles[b] = nfiles.get(b, 0) + 1
        due = {
            b for b in set(rows) | set(nfiles)
            if rows.get(b, 0) + unb_rows > max_delta_rows_per_bucket
            or nfiles.get(b, 0) > max_delta_files_per_bucket
        }
        minor = (
            len(unb_files) > max_unbucketed_files
            or unb_rows > max_delta_rows_per_bucket
            or (bool(unb_files) and bool(due))
        )
        return {
            "minor": minor,
            "buckets": due,
            "unbucketed_files": len(unb_files),
            "unbucketed_rows": unb_rows,
            "delta_rows_by_bucket": rows,
        }

    def vacuum(self, keep_versions: int = 2) -> int:
        """Delete data files unreferenced by the last ``keep_versions``
        manifests (snapshot-expiry analog). Returns #files removed."""
        cur = self.current_version() or 0
        keep: set[str] = set()
        for v in range(max(0, cur - keep_versions + 1), cur + 1):
            if os.path.exists(os.path.join(self._manifest_dir, f"v{v}.json")):
                keep.update(f["path"] for f in self.manifest(v)["files"])
        # pending staged (write-audit-publish) commits reference files no
        # committed manifest does yet — they are not garbage
        for sid in self.staged_commits():
            staged = self._load_staged(sid)
            keep.update(f["path"] for f in staged["manifest"]["files"])
        removed = 0
        for root, _dirs, names in os.walk(self._data_dir):
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(root, name), self.path)
                if rel not in keep:
                    os.unlink(os.path.join(root, name))
                    removed += 1
        return removed
