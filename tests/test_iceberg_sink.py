"""Iceberg sink: statement generation is verified offline (no runtime
jar in this sandbox); execution is gated by iceberg_available()."""

from __future__ import annotations

from pyspark.sql import types as T

from bitcoin_etl_spark.lake.iceberg import IcebergDocsTable, iceberg_available
from bitcoin_etl_spark.schemas import DOCS_SCHEMA


def _payload():
    return T.StructType([f for f in DOCS_SCHEMA.fields if f.name != "_rev"])


def test_iceberg_unavailable_is_detected(spark):
    assert iceberg_available(spark) is False  # sandbox has no jar


def test_ddl_statements(spark):
    t = IcebergDocsTable(spark, "cat.db.docs", n_buckets=32)
    ddl = t.create_sql(_payload())
    assert "USING iceberg" in ddl[0]
    assert "bucket(32, doc_id)" in ddl[0]
    assert "'write.merge.mode'='merge-on-read'" in ddl[0]
    assert "tokens array<int>" in ddl[0]
    assert "_rev BIGINT" in ddl[0]
    assert "cat.db.docs_ledger" in ddl[1]
    ev = t.evolve_sql(T.StructField("source_meta", T.StringType()))
    assert ev == (
        "ALTER TABLE cat.db.docs ADD COLUMNS (source_meta string)"
    )


def test_merge_statement_last_writer_wins(spark):
    t = IcebergDocsTable(spark, "cat.db.docs")
    sql = t.merge_sql("src", ["tokens", "n_tok", "source"])
    # revision guard on the matched branch (stale replays no-op)
    assert "s._rev > t._rev" in sql
    # tombstones are retained rows, never physical DELETEs — a physical
    # delete would let a replayed OLDER epoch resurrect a deleted key
    assert "DELETE" not in sql
    assert "t._deleted = s._deleted" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert "t.tokens = s.tokens" in sql
    assert "ON t.doc_id = s.doc_id" in sql
    purge = t.purge_tombstones_sql(100)
    assert purge == "DELETE FROM cat.db.docs WHERE _deleted AND _rev < 100"


def test_statements_parse_with_spark_sql_parser(spark):
    """EVERY generated statement must survive Spark's real ANSI SQL
    parser — the strongest offline check available without the runtime
    jar. Includes ``compact_sql``: Spark 4's parser accepts CALL
    (stored-procedure syntax), so even the Iceberg-procedure call is
    parser-checked."""
    t = IcebergDocsTable(spark, "cat.db.docs", n_buckets=32)
    parser = spark._jsparkSession.sessionState().sqlParser()
    stmts = [
        *t.create_sql(_payload()),
        t.evolve_sql(T.StructField("source_meta", T.StringType())),
        t.merge_sql("src", ["tokens", "n_tok", "source"]),
        t.ledger_check_sql("p1", 7),
        t.ledger_insert_sql("p1", 7, {"rows": 1}),
        t.compact_sql("cat"),
        t.purge_tombstones_sql(100),
    ]
    for s in stmts:
        parser.parsePlan(s)  # raises ParseException on bad syntax


def test_ledger_statements(spark):
    t = IcebergDocsTable(spark, "cat.db.docs")
    chk = t.ledger_check_sql("p1", 7)
    assert "pipeline_id = 'p1' AND epoch = 7" in chk
    ins = t.ledger_insert_sql("p1", 7, {"rows": 10, "upserts": 8,
                                        "deletes": 2, "max_seq": 99})
    assert "'p1', 7, 10, 8, 2, 0, 99" in ins
    assert "CALL cat.system.rewrite_data_files" in t.compact_sql("cat")


def test_apply_without_jar_raises(spark):
    t = IcebergDocsTable(spark, "cat.db.docs")
    df = spark.createDataFrame([], "doc_id string, _rev long, _deleted boolean")
    try:
        t.apply_epoch(df, "p", 0)
        raised = False
    except RuntimeError as e:
        raised = "iceberg-spark-runtime" in str(e)
    assert raised
