"""Sampling operators for training-data curation.

Scale design: both operators are pure narrow maps + filters — zero
shuffles, no RNG state. Determinism comes from hashing a stable key, so
a resampled run (or a retried task) keeps EXACTLY the same rows —
`df.sample()` cannot promise that across retries/partitionings, and a
training-data pipeline needs reproducible subsets.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

log = logging.getLogger(__name__)

SAMPLE_BUCKETS = 1_000_000
"""Hash-bucket granularity: rates are quantized to 1e-6 (one part per
million). Round 3 quantized to whole PERCENT, which silently dropped
entire strata for rates under 0.005 — sub-ppm rates now warn loudly
instead of silently rounding."""


def _hash_bucket(key_col, buckets: int = SAMPLE_BUCKETS) -> "F.Column":
    """Deterministic uniform [0, buckets) value from md5 of the key (same
    value computable in any engine — DuckDB:
    ('0x'||substr(md5(k),1,8))::UBIGINT % buckets)."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def _rate_units(frac: float, name: str) -> int:
    units = int(round(frac * SAMPLE_BUCKETS))
    if abs(units - frac * SAMPLE_BUCKETS) > 1e-6:
        log.warning(
            "stratified_sample: rate %r for %s quantized to %d/%d "
            "(granularity is 1e-6; the requested rate is finer)",
            frac, name, units, SAMPLE_BUCKETS,
        )
    return units


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float],
                      key_col: str,
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its key-hash
    bucket falls under its stratum's rate. ``rates`` maps stratum
    value → fraction in [0,1] (quantized to 1e-6 — see SAMPLE_BUCKETS);
    unlisted strata get ``default_rate``. The mix-rebalancing step of
    corpus curation (e.g. downsample crawl, keep all curated sources)
    as a single narrow filter."""
    bucket = _hash_bucket(F.col(key_col))
    rate = None
    for value, frac in rates.items():
        cond = F.col(strata_col) == value
        units = _rate_units(frac, f"stratum {value!r}")
        rate = (F.when(cond, F.lit(units))
                if rate is None else rate.when(cond, units))
    default_units = _rate_units(default_rate, "default_rate")
    rate = (rate.otherwise(default_units)
            if rate is not None else F.lit(default_units))
    return df.filter(bucket < rate)
