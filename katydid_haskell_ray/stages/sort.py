"""Range-partitioned distributed sort: global ROW_NUMBER assignment.

The missing piece next to the keyed exchanges: a TOTAL order over the
whole dataset (SQL ``ROW_NUMBER() OVER (ORDER BY k1, k2, ...)``), which
no per-key bucketing can produce.  Classic sample-sort shape:

1. sample ~32 keys per block at a fixed stride (deterministic — no RNG,
   so reruns partition identically) and pull only the sample to the
   driver: O(blocks) keys, never the data;
2. choose n_buckets-1 lexicographic split keys at even sample quantiles
   (n_buckets sized from materialized bytes by resolve_exchange, same
   ~256 MB-per-reduce-task policy as every exchange here);
3. assign each row its range bucket by comparing against the splits —
   one vectorized pass per split, so assignment is O(n_splits) kernels
   per block, no per-row Python;
4. exchange on the CONTIGUOUS bucket id (modular=False) and locally
   sort each bucket — ranges are disjoint and ordered, so bucket-local
   order is global order;
5. per-bucket row counts (one tiny driver pull, one row per bucket)
   prefix-sum into rank offsets, broadcast back, and a map-only pass
   adds ``offset + local_rank``.

Data moves through exactly one exchange; the driver only ever sees the
key sample and the per-bucket counts.  Skewed key ranges (many rows
equal to one sampled key) land in one bucket — the exchange's byte
bound asserts loudly if the sample under-resolved a hot range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _lex_less(cols: list[np.ndarray], split: tuple) -> np.ndarray:
    """row-wise (cols < split) under lexicographic order, vectorized."""
    n = len(cols[0])
    lt = np.zeros(n, dtype=bool)
    eq = np.ones(n, dtype=bool)
    for arr, s in zip(cols, split):
        lt |= eq & (arr < s)
        eq &= arr == s
    return lt


def global_row_number(ds, keys: list[str], *, out_col: str = "rn",
                      sample_per_block: int = 32,
                      ascending: bool = True):
    """Append a 1-based global row number ordered by ``keys`` (ties
    broken by nothing — pass a unique composite key for deterministic
    output, as SQL ROW_NUMBER does).  Returns a Dataset with the input
    columns plus ``out_col`` (int64).  Keys must be numpy-comparable
    (ints, floats, strings)."""
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)

    mat, nb, max_b = resolve_exchange(ds)

    # ---- 1. deterministic key sample, driver sees O(blocks) rows ----
    def sample(t: pa.Table) -> pa.Table:
        t = t.select(keys)
        if t.num_rows == 0:
            return t
        stride = max(1, t.num_rows // sample_per_block)
        idx = np.arange(0, t.num_rows, stride)
        return t.take(pa.array(idx))

    smp = (mat.map_batches(sample, batch_format="pyarrow")
           .to_pandas().sort_values(keys, kind="mergesort",
                                    ascending=ascending))

    # ---- 2. split keys at even sample quantiles ----
    nb = max(1, min(nb, len(smp)))
    pos = (np.arange(1, nb) * len(smp)) // nb
    splits = [tuple(smp.iloc[int(p)][k] for k in keys) for p in pos]

    # ---- 3. range-bucket assignment: one vector pass per split ----
    def assign(t: pa.Table) -> pa.Table:
        cols = [t.column(k).to_numpy(zero_copy_only=False) for k in keys]
        bucket = np.zeros(t.num_rows, dtype=np.int32)
        for s in splits:
            lt = _lex_less(cols, s)
            # ascending: rows NOT below the split belong past it
            bucket += (~lt if ascending else lt).astype(np.int32)
        return t.append_column("__bucket", pa.array(bucket))

    assigned = mat.map_batches(assign, batch_format="pyarrow")

    # ---- 4. exchange on the contiguous range id + local sort ----
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["__bucket"].iloc[0])
        g = (g.drop(columns="__bucket")
             .sort_values(keys, kind="mergesort", ascending=ascending)
             .reset_index(drop=True))
        g["__rb"] = np.int32(rb)
        g["__local"] = np.arange(len(g), dtype=np.int64)
        return g

    ranked = bucket_map_groups(assigned, per_bucket, n_buckets=nb,
                               modular=False, max_bucket_bytes=max_b,
                               batch_format="pandas").materialize()

    # ---- 5. per-bucket counts -> rank offsets (one tiny pull) ----
    cnt = (ranked.map_batches(
        lambda b: b.groupby("__rb", as_index=False).size(),
        batch_format="pandas").to_pandas()
        .groupby("__rb", as_index=False)["size"].sum())
    counts = np.zeros(nb, dtype=np.int64)
    counts[cnt["__rb"].to_numpy()] = cnt["size"].to_numpy()
    offsets = np.r_[0, np.cumsum(counts)[:-1]]

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = (offsets[b["__rb"].to_numpy()]
                      + b["__local"].to_numpy() + 1)
        return b.drop(columns=["__rb", "__local"])

    return ranked.map_batches(finish, batch_format="pandas")
