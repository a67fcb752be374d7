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
