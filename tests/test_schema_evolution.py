"""Additive schema evolution mid-stream — the multi-chain field-variance
analog (SURVEY.md §1.2: Zcash shielded fields, fork-added
previous_block_hash/difficulty — ``mappers/block_mapper.py:54-57``).
Later epochs carry ``source_meta``; earlier table rows read as null."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

from bitcoin_etl_spark.changelog import ChangeLogSpec, generate_scenario
from bitcoin_etl_spark.lake import LakeTable
from bitcoin_etl_spark.operators import EpochApplier
from bitcoin_etl_spark.schemas import (
    CHANGES_SCHEMA_EVOLVED,
    DOCS_SCHEMA,
    EVOLUTION_FIELD,
)
from tests.helpers import assert_docs_equal, spark_docs_to_pandas

COMPARE = ["doc_id", "tokens", "n_tok", "source", "source_meta"]


def _payload():
    return T.StructType([f for f in DOCS_SCHEMA.fields if f.name != "_rev"])


def test_schema_evolution_replay(spark, tmp_path):
    spec = ChangeLogSpec(
        n_epochs=6, events_per_epoch=300, n_keys=400, evolution_epoch=3
    )
    scen = str(tmp_path / "scen")
    generate_scenario(scen, spec)

    table = LakeTable.create(str(tmp_path / "t"), _payload(), n_buckets=8)
    applier = EpochApplier(table)

    sch = CHANGES_SCHEMA_EVOLVED
    # apply epoch-by-epoch with the column appearing only from epoch 3 on
    for e in range(6):
        df = spark.read.schema(
            sch if e >= spec.evolution_epoch else
            T.StructType([f for f in sch.fields if f.name != "source_meta"])
        ).parquet(f"{scen}/changes/epoch={e}")
        df = df.withColumn("epoch", F.lit(e).cast("long"))
        applier.apply_epoch(spark, df, e)

    assert "source_meta" in table.schema().fieldNames()
    actual = spark_docs_to_pandas(table.read_final(spark).select(*COMPARE))
    expected = pd.read_parquet(f"{scen}/expected_docs.parquet")[COMPARE]
    assert_docs_equal(actual, expected)

    # pre-evolution snapshot still readable (old files, evolved schema)
    assert table.read_raw(spark, version=2).count() > 0
    # rows written before evolution read as null in the new column
    lin = table.lineage(spark)
    assert lin.count() == 6


def test_manual_evolve_then_merge(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), _payload(), n_buckets=4)
    table.evolve_schema(T.StructType([EVOLUTION_FIELD]))
    assert "source_meta" in table.schema().fieldNames()
    # idempotent
    v = table.current_version()
    table.evolve_schema(T.StructType([EVOLUTION_FIELD]))
    assert table.current_version() == v


def test_numeric_type_widening_evolution(spark, tmp_path):
    """A source batch carrying a strictly wider lossless numeric type
    (int->long here) widens the table column in place (Iceberg
    promotion): old int32 files read back through the widened schema,
    merged state is correct, and the change feed spans the widening."""
    from pyspark.sql import types as T

    from bitcoin_etl_spark.lake import LakeTable

    payload = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.IntegerType(), True),
    ])
    table = LakeTable.create(str(tmp_path / "t"), payload, n_buckets=4)
    table.append_delta(spark.createDataFrame(
        [("a", 1, 1, False), ("b", 2, 2, False)],
        "doc_id string, val int, _rev long, _deleted boolean",
    ), epoch_id=0)
    v0 = table.current_version()
    assert table.schema()["val"].dataType.typeName() == "integer"

    # a long-valued batch (beyond int range) widens val to long
    big = 5_000_000_000
    table.append_delta(spark.createDataFrame(
        [("b", big, 3, False), ("c", big + 1, 4, False)],
        "doc_id string, val long, _rev long, _deleted boolean",
    ), epoch_id=1)
    assert table.schema()["val"].dataType.typeName() == "long"

    got = {r["doc_id"]: r["val"] for r in table.read_final(spark).collect()}
    assert got == {"a": 1, "b": big, "c": big + 1}

    feed = {r["doc_id"]: (r["_change_type"], r["val"])
            for r in table.read_changes(spark, v0).collect()}
    assert feed == {"b": ("UPDATE_AFTER", big), "c": ("INSERT", big + 1)}

    # compaction rewrites everything as long; state survives
    table.compact(spark)
    got = {r["doc_id"]: r["val"] for r in table.read_final(spark).collect()}
    assert got == {"a": 1, "b": big, "c": big + 1}
    # narrowing attempts do NOT change the schema back
    table.append_delta(spark.createDataFrame(
        [("d", 9, 5, False)],
        "doc_id string, val int, _rev long, _deleted boolean",
    ), epoch_id=2)
    assert table.schema()["val"].dataType.typeName() == "long"
