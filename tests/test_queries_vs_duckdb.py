"""Mirror of the driver's correctness gate: run every registered query
on Spark and its oracle SQL on DuckDB over the same parquet tables,
compare row count + column names + order-insensitive values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from bitcoin_etl_spark.plans.queries import ORACLES, QUERIES, ROWS_ONLY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _type_family(t):
    """Collapse an arrow type to the family the driver's value-hash is
    sensitive to.  The driver tolerates integer-width differences (Spark
    int32 vs DuckDB BIGINT hash identically) but NOT family differences —
    the round-1 failure class was DuckDB HUGEINT sum() (arrow
    decimal128(38,0)) vs Spark BIGINT.  Decimal is its own family so an
    uncast integer sum() in an oracle fails HERE before the driver sees it.
    """
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_type_family(t.value_type)}>"
    return str(t)


def _assert_families_match(name, spark_schema, duck_schema):
    s = {f.name: _type_family(f.type) for f in spark_schema}
    d = {f.name: _type_family(f.type) for f in duck_schema}
    mism = {c: (s[c], d[c]) for c in s if c in d and s[c] != d[c]}
    assert not mism, (
        f"{name}: arrow type-family mismatch (spark, duckdb) = {mism} — "
        "the driver's value hash WILL fail on these even if values match; "
        "cast the oracle (e.g. CAST(sum(...) AS BIGINT))"
    )


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_registry_complete():
    assert set(ORACLES) == set(QUERIES) - ROWS_ONLY, (
        "every query needs an oracle unless declared ROWS_ONLY"
    )


def test_rows_only_queries_run(spark):
    for name in sorted(ROWS_ONLY):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_tbl = sdf.toArrow()
    s_rows = [tuple(r.values()) for r in s_tbl.to_pylist()]
    res = ddb.execute(ORACLES[name])
    d_tbl = res.arrow()
    d_cols = d_tbl.schema.names
    d_rows = [tuple(r.values()) for r in d_tbl.to_pylist()]
    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    _assert_families_match(name, s_tbl.schema, d_tbl.schema)
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    assert len(sr) == len(dr), f"{name}: rows {len(sr)} vs {len(dr)}"
    mism = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mism, f"{name}: first mismatches {mism[:3]}"
