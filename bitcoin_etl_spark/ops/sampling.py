"""Sampling operators for training-data curation.

Scale design: both operators are pure narrow maps + filters — zero
shuffles, no RNG state. Determinism comes from hashing a stable key, so
a resampled run (or a retried task) keeps EXACTLY the same rows —
`df.sample()` cannot promise that across retries/partitionings, and a
training-data pipeline needs reproducible subsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hash_pct(key_col) -> "F.Column":
    """Deterministic uniform [0,100) bucket from md5 of the key (same
    value computable in any engine — DuckDB: ('0x'||substr(md5(k),1,8))
    ::UBIGINT % 100)."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float],
                      key_col: str,
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its key-hash
    bucket falls under its stratum's percentage. ``rates`` maps stratum
    value → fraction in [0,1]; unlisted strata get ``default_rate``.
    The mix-rebalancing step of corpus curation (e.g. downsample crawl,
    keep all curated sources) as a single narrow filter."""
    pct = _hash_pct(F.col(key_col))
    rate = None
    for value, frac in rates.items():
        cond = F.col(strata_col) == value
        rate = (F.when(cond, F.lit(int(round(frac * 100))))
                if rate is None else rate.when(cond, int(round(frac * 100))))
    rate = (rate.otherwise(int(round(default_rate * 100)))
            if rate is not None else F.lit(int(round(default_rate * 100))))
    return df.filter(pct < rate)
