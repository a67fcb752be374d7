"""Export jobs, block-range resolution, and the CLI surface."""

from __future__ import annotations

import glob
import json
import subprocess
import sys

from pyspark.sql import functions as F

from bitcoin_etl_spark.jobs import (
    block_range_for_timestamps,
    export_items,
    export_partitioned,
)
from bitcoin_etl_spark.sources import generate_raw_chain, map_blocks, map_transactions


def test_export_partitioned_hive_layout(spark, tmp_path):
    """S13: range-partitioned export with start_block=/end_block= dirs
    (export_all dir layout, jobs/export_all.py:60-85)."""
    raw = generate_raw_chain(spark, n_blocks=25, txs_per_block=3)
    tx = map_transactions(raw)
    out = str(tmp_path / "export")
    export_partitioned(tx.drop("inputs", "outputs"), out,
                       range_col="block_number", batch_size=10)
    dirs = sorted(glob.glob(f"{out}/start_block=*/end_block=*"))
    assert [d.split("start_block=")[1].split("/")[0] for d in dirs] == [
        "0", "10", "20"
    ]
    back = spark.read.json(f"{out}")
    assert back.count() == tx.count()
    # partition pruning on read: only one range dir scanned
    pruned = spark.read.json(out).filter(F.col("start_block") == 10)
    assert pruned.count() == tx.filter(
        F.col("block_number").between(10, 19)
    ).count()


def test_export_items_routing_and_csv(spark, tmp_path):
    """S5-S7: per-type routing, JSONL + CSV with array flattening."""
    raw = generate_raw_chain(spark, n_blocks=5, txs_per_block=3)
    blocks = map_blocks(raw)
    out = str(tmp_path / "items")
    counts = export_items({"blocks": blocks}, out, fmt="csv")
    assert counts["blocks"] == 5
    csv = spark.read.csv(f"{out}/blocks", header=True)
    # array column flattened to comma-joined string (exporters.py:155-157)
    row = csv.first()
    assert "," in row["transactions"] or len(row["transactions"]) == 64


def test_block_range_for_timestamps(spark):
    raw = generate_raw_chain(spark, n_blocks=30, txs_per_block=2)
    blocks = map_blocks(raw)
    # generator: time = 1_600_000_000 + 600*b
    lo, hi = block_range_for_timestamps(
        blocks, 1_600_000_000 + 600 * 10, 1_600_000_000 + 600 * 20
    )
    assert (lo, hi) == (10, 20)
    lo, hi = block_range_for_timestamps(blocks, 1, 2)
    assert (lo, hi) == (None, None)


def test_cli_end_to_end(tmp_path):
    """Drive the CLI as a user would: generate → replay → repair →
    compact → snapshots (subprocess; covers python -m entry)."""
    scen = str(tmp_path / "scen")
    table = str(tmp_path / "table")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "bitcoin_etl_spark", "--cores", "4", *argv],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        lines = [l for l in r.stdout.splitlines() if l.startswith("{") or l.startswith("[")]
        return json.loads(lines[-1]) if lines else None

    g = run("generate", "--out", scen, "--events", "3000", "--epochs", "3",
            "--keys", "500")
    assert g["total_events"] >= 3000
    rep = run("replay", "--table", table, "--changes", f"{scen}/changes",
              "--create")
    assert rep["applied"] == 3
    rp = run("repair", "--table", table)
    assert rp == {"missing_epochs": [], "duplicate_keys": 0}
    comp = run("compact", "--table", table)
    assert comp["compacted"] is True
    snaps = run("snapshots", "--table", table)
    assert len(snaps) >= 4


def test_cli_changes_feed(tmp_path):
    """CLI change-feed surface: replay → snapshot → replay more →
    `changes --from-version` emits only the net new changes as JSON
    lines."""
    scen = str(tmp_path / "scen")
    table = str(tmp_path / "table")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "bitcoin_etl_spark", "--cores", "4", *argv],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run("generate", "--out", scen, "--events", "2000", "--epochs", "4",
        "--keys", "300")
    # apply only the first two epochs by copying them to a staging dir
    import os
    import shutil

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    for e in (0, 1):
        shutil.copytree(f"{scen}/changes/epoch={e}", f"{stage}/epoch={e}")
    run("replay", "--table", table, "--changes", stage, "--create")
    snaps = json.loads(
        [l for l in run("snapshots", "--table", table).splitlines()
         if l.startswith("[")][-1]
    )
    v_mid = snaps[-1]["version"]
    for e in (2, 3):
        shutil.copytree(f"{scen}/changes/epoch={e}", f"{stage}/epoch={e}")
    run("replay", "--table", table, "--changes", stage)
    out = run("changes", "--table", table, "--from-version", str(v_mid))
    feed = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert feed, "late epochs must produce a non-empty change feed"
    kinds = {r["_change_type"] for r in feed}
    assert kinds <= {"INSERT", "UPDATE_AFTER", "DELETE"}
    assert {"doc_id"} <= set(feed[0])
    # every fed doc_id was touched by epochs 2-3
    import duckdb

    touched = {
        r[0] for r in duckdb.sql(
            f"SELECT DISTINCT doc_id FROM '{stage}/epoch=2/*.parquet' "
            f"UNION SELECT DISTINCT doc_id FROM '{stage}/epoch=3/*.parquet'"
        ).fetchall()
    }
    assert {r["doc_id"] for r in feed} <= touched


def test_cli_lookup_and_staged(tmp_path, spark):
    """CLI surfaces for the round-5 lake features: `lookup` returns the
    key's latest image as JSON; `staged list` shows pending
    write-audit-publish commits (stage/publish exercised via the
    library, the CLI drives list/abort)."""
    scen = str(tmp_path / "scen")
    table = str(tmp_path / "table")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "bitcoin_etl_spark", "--cores", "4", *argv],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run("generate", "--out", scen, "--events", "1000", "--epochs", "2",
        "--keys", "100")
    run("replay", "--table", table, "--changes", f"{scen}/changes",
        "--create")

    import duckdb

    key = duckdb.sql(
        f"SELECT doc_id FROM '{scen}/expected_docs.parquet' LIMIT 1"
    ).fetchone()[0]
    out = run("lookup", "--table", table, "--key", key)
    rows = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert len(rows) == 1 and rows[0]["doc_id"] == key

    # stage via the library, drive list/abort via the CLI
    from bitcoin_etl_spark.lake import LakeTable

    t = LakeTable.load(table)
    df = spark.createDataFrame(
        [("zzz", 10**9, False)],
        "doc_id string, _rev long, _deleted boolean",
    )
    res = t.append_delta(df, staged=True)
    sid = res["staging_id"]
    listed = json.loads(
        [l for l in run("staged", "--table", table, "list").splitlines()
         if l.startswith("[")][-1]
    )
    assert listed == [sid]
    run("staged", "--table", table, "abort", "--id", sid)
    listed = json.loads(
        [l for l in run("staged", "--table", table, "list").splitlines()
         if l.startswith("[")][-1]
    )
    assert listed == []


def test_cli_mirror(tmp_path):
    """CLI mirror: replay upstream, then maintain a filtered downstream
    derived table via the change feed; a second drain with no upstream
    commits is a no-op."""
    scen = str(tmp_path / "scen")
    table = str(tmp_path / "table")
    down = str(tmp_path / "down")
    cursor = str(tmp_path / "cursor.json")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "bitcoin_etl_spark", "--cores", "4", *argv],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run("generate", "--out", scen, "--events", "1000", "--epochs", "2",
        "--keys", "120")
    run("replay", "--table", table, "--changes", f"{scen}/changes",
        "--create")
    out = run("mirror", "--table", table, "--downstream", down,
              "--cursor", cursor, "--where", "n_tok >= 8", "--create")
    ranges = json.loads(
        [l for l in out.splitlines() if l.startswith("[")][-1]
    )
    assert ranges and ranges[0]["from_version"] == 0

    import duckdb

    n_down = duckdb.sql(f"""
        SELECT count(*) FROM (
          SELECT doc_id FROM read_parquet('{down}/data/**/*.parquet')
          QUALIFY row_number() OVER (PARTITION BY doc_id
                                     ORDER BY _rev DESC) = 1
        ) t JOIN read_parquet('{down}/data/**/*.parquet') d USING (doc_id)
        WHERE d._deleted = false AND d.n_tok >= 8
          AND d._rev = (SELECT max(_rev) FROM
                        read_parquet('{down}/data/**/*.parquet') x
                        WHERE x.doc_id = t.doc_id)
    """).fetchone()[0]
    n_expected = duckdb.sql(
        f"SELECT count(*) FROM '{scen}/expected_docs.parquet' "
        f"WHERE n_tok >= 8"
    ).fetchone()[0]
    assert n_down == n_expected and n_expected > 0

    out2 = run("mirror", "--table", table, "--downstream", down,
               "--cursor", cursor, "--where", "n_tok >= 8")
    assert json.loads(
        [l for l in out2.splitlines() if l.startswith("[")][-1]
    ) == []
