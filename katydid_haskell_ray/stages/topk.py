"""Distributed top-k without a total sort.

``Dataset.sort().limit(k)`` range-shuffles the WHOLE table to rank 10 rows;
this operator instead takes the local top-k of every batch (vectorized
pandas sort per block), streams only k rows per block to the driver, and
merges there — exchange volume O(k · blocks) instead of O(N)."""

from __future__ import annotations

import pandas as pd


def topk_rows(ds, *, k: int, by: list[str], ascending: list[bool],
              columns: list[str] | None = None) -> pd.DataFrame:
    """Global top-k rows of ``ds`` under the (by, ascending) ordering.

    Returns a pandas frame of exactly min(k, N) rows in sorted order.
    ``columns`` optionally projects before the local pass."""
    if columns is not None:
        ds = ds.select_columns(columns)

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    return (parts.sort_values(by, ascending=ascending, kind="mergesort")
            .head(k).reset_index(drop=True))
