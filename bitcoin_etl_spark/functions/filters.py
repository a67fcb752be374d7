"""Declarative item filtering — the P10 analog.

The reference lets users pass a Python predicate string that is
``eval``'d per item (``blockchainetl/cli/filter_items.py:33-40``,
engine ``misc_utils.py:74-78``) — per-row interpreted Python AND an
arbitrary-code-execution hazard. Here the predicate is a Spark SQL
expression: Catalyst compiles it, pushes it into the scan, and no user
code runs on the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def filter_items(df: DataFrame, predicate: str) -> DataFrame:
    """Filter by a SQL boolean expression (e.g. the README's date filter
    ``item['type'] == 'block' and datetime(...)`` becomes
    ``"type = 'block' AND timestamp BETWEEN ..."``)."""
    return df.filter(F.expr(predicate))
