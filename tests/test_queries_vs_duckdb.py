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
    s_rows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    assert len(sr) == len(dr), f"{name}: rows {len(sr)} vs {len(dr)}"
    mism = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mism, f"{name}: first mismatches {mism[:3]}"
