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


def grouped_topk(ds, *, group_cols: list[str], k: int, by: list[str],
                 ascending: list[bool], n_buckets: int | None = None,
                 rank_col: str | None = None):
    """Per-group top-k (the ROW_NUMBER() <= k window pattern) without a
    total sort: a per-batch combiner keeps each group's local top-k, then
    a group-hash bucketed exchange takes the final head per group — scales
    to millions of groups (exchange volume O(groups x k x blocks) after
    the combiner, one vectorized pass per bucket).  Ties must be broken by
    ``by`` itself (include a unique tiebreaker column)."""
    import numpy as np
    import pyarrow as pa

    from katydid_haskell_ray.stages.exchange import bucket_map_groups

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return (b.sort_values(by, ascending=ascending, kind="mergesort")
                .groupby(group_cols, sort=False, dropna=False).head(k))

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select(group_cols).to_pandas(), index=False).to_numpy()
        return t.append_column("__bucket", pa.array(h.astype(np.uint64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop(columns="__bucket")
               .sort_values(by, ascending=ascending, kind="mergesort")
               .groupby(group_cols, sort=False, dropna=False).head(k))
        if rank_col is not None:
            # every group lives wholly inside one bucket, so the 1..k
            # ROW_NUMBER() is computable here without another exchange
            out = out.copy()
            out[rank_col] = (out.groupby(group_cols, sort=False, dropna=False)
                             .cumcount().to_numpy() + 1)
        return out

    from katydid_haskell_ray.stages.exchange import resolve_exchange
    partials = ds.map_batches(local, batch_format="pandas").map_batches(
        add_bucket, batch_format="pyarrow")
    # the combined head-k stream is groups x k x blocks rows — grows with
    # group cardinality, so the bucket count is data-derived
    mat, nb, max_b = resolve_exchange(partials, n_buckets)
    return bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b)
