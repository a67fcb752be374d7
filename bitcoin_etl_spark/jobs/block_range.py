"""Date→block-range resolution — the interpolation-search analog.

The reference resolves a calendar date to a block-height range by
interpolation search over the (non-monotonic) block-timestamp graph with
O(log log n) RPC probes (``bitcoinetl/service/btc_block_range_service
.py:35-65``, ``blockchainetl/service/graph_operations.py:35-128``).
With the whole log in a columnar table the probe dance disappears: one
pruned min/max aggregation is the entire algorithm — the 119-step
non-monotonicity scan (``graph_operations.py:96-128``) is subsumed by
scanning every row in the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def block_range_for_timestamps(
    blocks: DataFrame,
    ts_lo: int,
    ts_hi: int,
    number_col: str = "number",
    ts_col: str = "timestamp",
) -> tuple[int | None, int | None]:
    """Smallest/largest block number whose timestamp lies in
    [ts_lo, ts_hi]. Non-monotonic timestamps are handled exactly (every
    qualifying block counts, regardless of neighbors)."""
    r = (
        blocks.filter(F.col(ts_col).between(ts_lo, ts_hi))
        .agg(
            F.min(number_col).alias("lo"),
            F.max(number_col).alias("hi"),
        )
        .collect()[0]
    )
    return (r["lo"], r["hi"])
