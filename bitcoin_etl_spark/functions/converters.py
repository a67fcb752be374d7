"""Item converters (P12) — the reference's exporter-side dict rewriters
(``blockchainetl/jobs/exporters/converters/*.py``) as Column expressions.

A DataFrame schema is static, so the list→indexed-fields converter takes
an explicit width where the reference grows the dict per item
(``list_field_item_converter.py:34-56``): field_i = element_at(list, i+1)
with ``fill_with`` past the end — identical output for any list no longer
than ``n_fields``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def list_to_fields(df: DataFrame, field: str, new_field_prefix: str,
                   n_fields: int, fill_with=None) -> DataFrame:
    """Replace an array column with ``{prefix}0..{prefix}{n-1}`` scalar
    columns (reference ``list_field_item_converter.py:34-56``: del the
    list, emit ``prefix+i`` per element, pad to ``fill`` with
    ``fill_with``). Elements beyond ``n_fields`` are dropped — declare
    the width at or above the expected maximum."""
    cols = [c for c in df.columns if c != field]
    # try_element_at: past-the-end reads are the normal padded case here,
    # and ANSI mode makes plain element_at throw on them
    new = [
        F.coalesce(F.try_element_at(F.col(field), F.lit(i + 1)),
                   F.lit(fill_with)).alias(f"{new_field_prefix}{i}")
        if fill_with is not None
        else F.try_element_at(F.col(field), F.lit(i + 1))
        .alias(f"{new_field_prefix}{i}")
        for i in range(n_fields)
    ]
    return df.select(*cols, *new)


def int_to_string(col: Column) -> Column:
    """``int_to_string_item_converter`` analog — lossless stringification
    for sinks whose consumers can't hold 64-bit ints (e.g. JSON→JS)."""
    return col.cast("string")
