"""Joins for two LARGE sides (no broadcastable dimension).

Ray Data's own ``Dataset.join`` is version-dependent; the portable pattern
(ray_guide "Joins and lookups") is an explicit partitioned hash join:

1. project both sides to the join key + needed columns (never ship payload);
2. tag each side and add ``bucket = hash(key) % B``;
3. union the tagged streams and ``groupby(bucket).map_groups`` — inside each
   bucket a C-speed pandas merge joins the co-located halves.

B is the partitioning knob: pick B ≈ 2-4x cluster cores so buckets are
balanced; salt hot keys into sub-buckets if one key dominates (the skew
treatment of SURVEY.md §4).  Also here: :func:`asof_lookup`, the broadcast
as-of join (sorted small side + vectorized searchsorted per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from katydid_haskell_ray.state import sketches as SK


def hash_join(left, right, *, key: str, left_cols: list[str],
              right_cols: list[str], n_buckets: int = 64,
              how: str = "inner"):
    """Partitioned hash join of two Datasets on ``key``.

    Returns a Dataset with columns ``left_cols + right_cols`` (key included
    once).  Rows are matched exactly (pandas merge semantics per bucket).
    ``how="left_anti"`` keeps left rows with NO match on the right and
    returns only the left columns — the distributed anti-join used by the
    dedup kept-set computation.
    """
    lcols = [key] + [c for c in left_cols if c != key]
    rcols = [key] + [c for c in right_cols if c != key]
    clash = (set(lcols) & set(rcols)) - {key}
    if clash:
        raise ValueError(f"join column name clash: {sorted(clash)}")
    all_cols = lcols + [c for c in rcols if c != key]

    def tag(side: str, cols: list[str], other_schema_src):
        def f(b: pa.Table) -> pa.Table:
            b = b.select(cols)
            # unify schemas for the union: null-fill the other side's columns
            for name, typ in other_schema_src:
                b = b.append_column(name, pa.nulls(b.num_rows, typ))
            h = SK.hash64_array(b.column(key)) % np.uint64(n_buckets)
            b = (b.append_column("__bucket", pa.array(h.astype(np.int32)))
                  .append_column("__side", pa.array([side] * b.num_rows)))
            return b.select(all_cols + ["__bucket", "__side"])
        return f

    def _arrow_types(schema, cols):
        base = getattr(schema, "base_schema", schema)
        out = []
        if isinstance(base, pa.Schema):
            for c in cols:
                out.append((c, base.field(c).type))
            return out
        m = dict(zip(base.names, base.types))  # PandasBlockSchema
        for c in cols:
            t = m[c]
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()  # pandas object dtype
            out.append((c, t))
        return out

    ltypes = _arrow_types(left.schema(), [c for c in lcols if c != key])
    rtypes = _arrow_types(right.schema(), [c for c in rcols if c != key])
    tagged_l = left.map_batches(tag("l", lcols, rtypes), batch_format="pyarrow")
    tagged_r = right.map_batches(tag("r", rcols, ltypes), batch_format="pyarrow")
    both = tagged_l.union(tagged_r)

    # integer columns get NaN-coerced to float by the union's null-fill;
    # restore their dtypes after the per-bucket merge so downstream integer
    # aggregation stays exact
    int_cols = [c for c, t in ltypes + rtypes if pa.types.is_integer(t)]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g.loc[g["__side"] == "l", lcols]
        rpart = g.loc[g["__side"] == "r", rcols]
        if how == "left_anti":
            out = lpart[~lpart[key].isin(rpart[key])]
        else:
            out = lpart.merge(rpart, on=key, how=how)
        for c in int_cols:
            if c in out.columns and out[c].notna().all():
                out[c] = out[c].astype(np.int64)
        return out

    return both.groupby("__bucket").map_groups(merge_bucket,
                                               batch_format="pandas")


def asof_lookup(ds, *, ts_col: str, timeline: np.ndarray,
                out_col: str = "asof", values: np.ndarray | None = None):
    """Broadcast as-of join: for each row, the latest timeline entry <= ts.

    ``timeline`` (sorted int64, e.g. epoch seconds) is broadcast via
    ``ray.put`` once; each batch does ONE vectorized searchsorted.  Rows
    before the first entry get null.  ``values`` optionally maps matched
    timeline positions to a payload column."""
    timeline = np.asarray(timeline)
    payload = {"t": timeline, "v": values}
    ref = ray.put(payload)

    class AsOf:
        def __init__(self):
            p = ray.get(ref)
            self.t, self.v = p["t"], p["v"]

        def __call__(self, b: pa.Table) -> pa.Table:
            ts = b.column(ts_col)
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            tv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.t, tv, side="right") - 1
            ok = idx >= 0
            src = self.t if self.v is None else self.v
            vals = src[np.maximum(idx, 0)]
            arr = pa.array(vals, mask=~ok)
            return b.append_column(out_col, arr)

    from katydid_haskell_ray.stages.util import auto_concurrency
    return ds.map_batches(AsOf, batch_format="pyarrow",
                          concurrency=auto_concurrency(None))
