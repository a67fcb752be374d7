"""IcebergDocsTable — the production sink this engine targets.

The sandbox has no network to fetch ``iceberg-spark-runtime``, so
``LakeTable`` (same contract, parquet + manifest chain) carries the test
suite; this module is the Iceberg realization for real clusters
(``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-…``
+ a catalog config). Everything is driven through SQL statements so the
statement *generation* is unit-testable offline; execution requires the
jar (``iceberg_available`` gates it).

Mapping of the engine contract onto Iceberg:

* versioned upsert (C1)    → ``MERGE INTO … WHEN MATCHED AND s._rev >
  t._rev THEN UPDATE … WHEN NOT MATCHED THEN INSERT`` — last-writer-wins
  by revision; tombstones are RETAINED rows (``_deleted = true``), never
  a physical DELETE, so a replayed older epoch cannot resurrect a
  deleted key; ``purge_tombstones_sql`` drops them behind the replay
  horizon at compaction time.
* exactly-once ledger (T5) → a ``<table>_ledger`` Iceberg table written
  in the same ``foreachBatch`` body; Iceberg's snapshot isolation plus
  the ledger-check-before-merge gives idempotent epochs (WAP/branch
  commits are the strict-atomicity upgrade, noted below).
* compaction (C2)          → ``CALL <catalog>.system.rewrite_data_files``.
* schema evolution         → ``ALTER TABLE … ADD COLUMN`` (additive).
* bucketing                → partition spec ``bucket(N, doc_id)``.
* time travel              → ``VERSION AS OF`` / ``TIMESTAMP AS OF``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime + SQL extensions are on the
    classpath (jvm class probe; no side effects)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


def _sql_type(dt: T.DataType) -> str:
    return dt.simpleString()


class IcebergDocsTable:
    """Keyed CDC target table on Iceberg. All methods return the SQL
    they execute (for offline statement tests); ``run=False`` skips
    execution."""

    def __init__(self, spark: SparkSession, name: str,
                 key: str = "doc_id", n_buckets: int = 64):
        self.spark = spark
        self.name = name
        self.ledger_name = f"{name}_ledger"
        self.key = key
        self.n_buckets = n_buckets

    # ------------------------------------------------------------- DDL
    def create_sql(self, payload_schema: T.StructType) -> list[str]:
        cols = ", ".join(
            f"{f.name} {_sql_type(f.dataType)}" for f in payload_schema.fields
        )
        return [
            f"CREATE TABLE IF NOT EXISTS {self.name} ("
            f"{cols}, _rev BIGINT, _deleted BOOLEAN) USING iceberg "
            f"PARTITIONED BY (bucket({self.n_buckets}, {self.key})) "
            "TBLPROPERTIES ('write.merge.mode'='merge-on-read', "
            "'write.distribution-mode'='hash', 'format-version'='2')",
            f"CREATE TABLE IF NOT EXISTS {self.ledger_name} ("
            "pipeline_id STRING, epoch BIGINT, rows BIGINT, upserts BIGINT, "
            "deletes BIGINT, quarantined BIGINT, max_seq BIGINT, "
            "committed_at TIMESTAMP) USING iceberg",
        ]

    def evolve_sql(self, field: T.StructField) -> str:
        # no IF NOT EXISTS: Spark's ALTER TABLE ADD COLUMNS has no column
        # -level existence guard (a real-parser test caught the invalid
        # syntax this used to emit) — callers check the table schema
        # before evolving, as apply-side code already must
        return (
            f"ALTER TABLE {self.name} ADD COLUMNS "
            f"({field.name} {_sql_type(field.dataType)})"
        )

    # ----------------------------------------------------------- MERGE
    def merge_sql(self, source_view: str, payload_cols: list[str]) -> str:
        """Tombstones are RETAINED rows (``_deleted = true``), exactly
        like LakeTable's max-_rev semantics — never a physical DELETE.
        A physical delete would let a later replay of an OLDER epoch
        (the supported withheld-epoch patch-by-replay flow) hit the
        NOT-MATCHED branch and resurrect a stale image of a deleted key;
        with the tombstone retained, the stale upsert loses on
        ``s._rev > t._rev``. Tombstones are purged only at compaction
        (``purge_tombstones_sql``), once no older replays can arrive."""
        sets = ", ".join(
            [f"t.{c} = s.{c}" for c in payload_cols]
            + ["t._rev = s._rev", "t._deleted = s._deleted"]
        )
        ins_cols = ", ".join([self.key, *payload_cols, "_rev", "_deleted"])
        ins_vals = ", ".join(
            [f"s.{self.key}", *[f"s.{c}" for c in payload_cols],
             "s._rev", "s._deleted"]
        )
        return (
            f"MERGE INTO {self.name} t USING {source_view} s "
            f"ON t.{self.key} = s.{self.key} "
            # last-writer-wins by revision; stale replays no-op
            f"WHEN MATCHED AND s._rev > t._rev THEN UPDATE SET {sets} "
            # inserts include tombstones: a delete arriving before any
            # insert must still outrank later stale upserts
            f"WHEN NOT MATCHED THEN INSERT "
            f"({ins_cols}) VALUES ({ins_vals})"
        )

    def ledger_check_sql(self, pipeline_id: str, epoch: int) -> str:
        return (
            f"SELECT count(*) AS n FROM {self.ledger_name} "
            f"WHERE pipeline_id = '{pipeline_id}' AND epoch = {epoch}"
        )

    def ledger_insert_sql(self, pipeline_id: str, epoch: int,
                          stats: dict) -> str:
        return (
            f"INSERT INTO {self.ledger_name} VALUES ("
            f"'{pipeline_id}', {epoch}, {stats.get('rows', 0)}, "
            f"{stats.get('upserts', 0)}, {stats.get('deletes', 0)}, "
            f"{stats.get('quarantined', 0)}, {stats.get('max_seq', -1)}, "
            "current_timestamp())"
        )

    def compact_sql(self, catalog: str) -> str:
        return (
            f"CALL {catalog}.system.rewrite_data_files(table => "
            f"'{self.name}', options => map('min-input-files','2'))"
        )

    def purge_tombstones_sql(self, min_retained_rev: int) -> str:
        """Physically drop tombstones older than the replay horizon —
        run at compaction time only (the C2 background-merge moment),
        with ``min_retained_rev`` = the lowest ``_rev`` any future
        replay could still carry."""
        return (
            f"DELETE FROM {self.name} "
            f"WHERE _deleted AND _rev < {min_retained_rev}"
        )

    # ------------------------------------------------------- execution
    def apply_epoch(self, reduced: DataFrame, pipeline_id: str,
                    epoch: int, stats: dict | None = None) -> dict:
        """foreachBatch body: ledger check → MERGE → ledger insert.

        Iceberg gives per-statement snapshot isolation; the
        check-then-merge pair is idempotent under replay because the
        replayed batch re-reads the ledger first (and `_rev` guards make
        double-MERGEs no-ops anyway). For strict single-commit atomicity
        across both tables, wrap in a WAP branch
        (`spark.wap.branch`) and fast-forward after both statements.
        """
        if not iceberg_available(self.spark):
            raise RuntimeError(
                "iceberg-spark-runtime not on classpath; use LakeTable "
                "or submit with --packages org.apache.iceberg:"
                "iceberg-spark-runtime-3.5_2.12:<version>"
            )
        n = self.spark.sql(
            self.ledger_check_sql(pipeline_id, epoch)
        ).collect()[0]["n"]
        if n:
            return {"skipped": True, "epoch": epoch}
        view = f"_src_{pipeline_id}_{epoch}"
        reduced.createOrReplaceTempView(view)
        payload = [
            c for c in reduced.columns
            if c not in (self.key, "_rev", "_deleted")
        ]
        self.spark.sql(self.merge_sql(view, payload))
        self.spark.sql(
            self.ledger_insert_sql(pipeline_id, epoch, stats or {})
        )
        return {"skipped": False, "epoch": epoch}

    def read_final(self) -> DataFrame:
        return self.spark.table(self.name).filter(~F.col("_deleted"))
