"""Order-insensitive final-state comparison — the analog of the
reference's ``tests/helpers.py:30-46`` ``compare_lines_ignore_order``,
under token-array equality (FIXTURES.md §3)."""

from __future__ import annotations

import pandas as pd


def normalize_docs(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["tokens"] = out["tokens"].map(
        lambda t: None if t is None else tuple(int(x) for x in t)
    )
    cols = sorted(out.columns)
    return out[cols].sort_values("doc_id").reset_index(drop=True)


def assert_docs_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    a, e = normalize_docs(actual), normalize_docs(expected)
    assert list(a.columns) == list(e.columns), (a.columns, e.columns)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for col in a.columns:
        av = a[col].tolist()
        ev = e[col].tolist()
        mismatches = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, ev))
            if (x != y and not (pd.isna(x) and pd.isna(y)))
        ]
        assert not mismatches, f"column {col}: first mismatches {mismatches[:5]}"


def spark_docs_to_pandas(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf["tokens"] = pdf["tokens"].map(
        lambda t: None if t is None else tuple(int(x) for x in t)
    )
    return pdf
