"""Scalar function library — JVM-side Column expressions (never Python
UDFs) reimplementing the reference's converters/utils:

* ``item_id``            — PK assignment ``type_hash[_index]`` (reference
  ``blockchainetl/streaming/btc_item_id_calculator.py:29-47``).
* ``bitcoin_to_satoshi`` — exact Decimal → integer satoshi ×10^8
  (reference ``bitcoinetl/btc_utils.py:5-12``; the Dogecoin float
  precision-loss hazard ``README.md:156-160`` motivates Decimal math).
* ``nonstandard_address``— outputs without addresses get the synthetic
  address ``'nonstandard' + sha256(script_hex)[:40]`` (reference
  ``bitcoinetl/service/btc_script_service.py:4-11``).
* ``unix_ts_to_string``  — the unix-timestamp item converter (reference
  ``blockchainetl/jobs/converters/unix_timestamp_item_converter.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def item_id(item_type: str | Column, *parts: Column) -> Column:
    """Deterministic primary key: ``concat_ws('_', type, part...)``."""
    t = F.lit(item_type) if isinstance(item_type, str) else item_type
    return F.concat_ws("_", t, *parts)


def bitcoin_to_satoshi(btc: Column) -> Column:
    """BTC value (float/decimal) → integer satoshis, via Decimal so
    0.1-style values stay exact."""
    return (btc.cast("decimal(30,8)") * F.lit(100_000_000)).cast("long")


def nonstandard_address(script_hex: Column) -> Column:
    """``'nonstandard' + sha256(script)[:40]`` for script-only outputs."""
    return F.concat(
        F.lit("nonstandard"),
        F.substring(F.sha2(F.unhex(script_hex), 256), 1, 40),
    )


def unix_ts_to_string(ts_seconds: Column) -> Column:
    return F.date_format(
        F.timestamp_seconds(ts_seconds), "yyyy-MM-dd HH:mm:ss"
    )


def normalize_nonce(df, col: str = "nonce"):
    """P9 hex normalization (reference ``mappers/block_mapper.py:100-109``
    ``to_hex``): bitcoin and clones return an integer nonce, zcash a hex
    string — normalize integers to lowercase hex (``format(val, 'x')``:
    no leading zeros), pass strings through. The int/str variance is
    schema-level in a DataFrame, so this dispatches on the column dtype
    once at plan time."""
    import pyspark.sql.types as T

    dtype = df.schema[col].dataType
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return df.withColumn(col, F.lower(F.hex(F.col(col))))
    return df
