"""Build the ``--py-files`` artifact for cluster submission.

Produces ``dist/bitcoin_etl_spark.zip`` containing the engine package
(sources only, no tests/caches) — the standard PySpark deployment unit:

    python package.py
    spark-submit --master <cluster> \
        --py-files dist/bitcoin_etl_spark.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        job.py

where ``job.py`` imports ``bitcoin_etl_spark`` exactly as the CLI does
(see README "Cluster submission"). The zip is importable directly off
``sys.path`` because the package is pure Python — no native extensions,
no data files.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "bitcoin_etl_spark"


def build(out_dir: str = "dist") -> str:
    os.makedirs(os.path.join(ROOT, out_dir), exist_ok=True)
    out = os.path.join(ROOT, out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for base, dirs, names in os.walk(os.path.join(ROOT, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(names):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(base, name)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
