"""Joins for two LARGE sides (no broadcastable dimension).

Ray Data's own ``Dataset.join`` is version-dependent; the portable pattern
(SURVEY.md §7 — hash-partition both sides, merge per bucket; cf.
https://docs.ray.io/en/latest/data/transforming-data.html) is an explicit
partitioned hash join:

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


def hash_join(left, right, *, key: str | list[str], left_cols: list[str],
              right_cols: list[str], n_buckets: int | None = None,
              how: str = "inner", mark_col: str = "__exists"):
    """Partitioned hash join of two Datasets on ``key`` (a column name or
    a list of columns — composite keys hash as a tuple).

    Returns a Dataset with columns ``left_cols + right_cols`` (key columns
    included once).  Rows are matched exactly (pandas merge semantics per
    bucket).  ``how="left_anti"`` keeps left rows with NO match on the
    right and returns only the left columns — the distributed anti-join
    used by the dedup kept-set computation.  ``how="left_mark"`` keeps ALL
    left rows and appends a bool ``mark_col`` = EXISTS(match on the right)
    — the one-pass projection of a semi+anti pair (SQL's MARK join), used
    where both polarities are needed (referential checks).

    Shuffle shape: each side is projected to its join columns, tagged with
    a coarse key-hash bucket, and cogrouped through the raw-task exchange
    (``how`` ∈ inner / left / left_anti / left_semi / outer — a key lands
    in exactly one bucket, so per-bucket full-outer merges union exactly;
    left_semi keeps left rows WITH a match, at most once, without
    deduplicating the right side first)
    (stages/exchange.py) — the two sides never union, so each keeps its
    Arrow schema end-to-end (no null-fill, no int->float coercion for
    inner/anti joins; a left/outer merge still NaN-fills unmatched right
    columns, which is the semantics).  The per-bucket merge is one
    C-speed pandas merge.  The exchange ships whole projected rows, so
    its bucket count is derived from both sides' materialized bytes
    unless pinned (exchange.bucket_cogroup auto-sizing).
    """
    from katydid_haskell_ray.stages.exchange import bucket_cogroup

    keys = [key] if isinstance(key, str) else list(key)
    lcols = keys + [c for c in left_cols if c not in keys]
    rcols = keys + [c for c in right_cols if c not in keys]
    clash = (set(lcols) & set(rcols)) - set(keys)
    if clash:
        raise ValueError(f"join column name clash: {sorted(clash)}")

    def tag(cols: list[str]):
        def f(b: pa.Table) -> pa.Table:
            b = b.select(cols)
            if len(keys) == 1:
                h = SK.hash64_array(b.column(keys[0]))
            else:
                h = pd.util.hash_pandas_object(
                    b.select(keys).to_pandas(), index=False).to_numpy()
            return b.append_column("__bucket", pa.array(h.astype(np.uint64)))
        return f

    tagged_l = left.map_batches(tag(lcols), batch_format="pyarrow")
    tagged_r = right.map_batches(tag(rcols), batch_format="pyarrow")

    def merge_bucket(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        # a 0-column frame means that side was GLOBALLY empty (the exchange
        # passes Ray's degenerate empty blocks through as such)
        if ldf.shape[1] == 0:
            if how == "outer" and rdf.shape[1] != 0:
                out = rdf[rcols].copy()
                for c in lcols:
                    if c not in keys:
                        out[c] = np.nan
                return out[lcols + [c for c in rcols if c not in keys]]
            return ldf  # empty output, Ray's empty-block convention
        ldf = ldf[lcols]
        if rdf.shape[1] == 0:
            if how == "left_anti":
                return ldf  # nothing to subtract
            if how == "left_mark":
                out = ldf.copy()
                out[mark_col] = False
                return out
            if how in ("inner", "left_semi"):
                return ldf.iloc[0:0]
            out = ldf.copy()  # left join: all unmatched
            for c in rcols:
                if c not in keys:
                    out[c] = np.nan
            return out
        rdf = rdf[rcols]
        if how == "left_mark":
            # EXISTS semantics: NULL keys never match (cf. semi/anti below)
            out = ldf.copy()
            if len(keys) == 1:
                out[mark_col] = (ldf[keys[0]]
                                 .isin(rdf[keys[0]].dropna()).to_numpy())
            else:
                rk = rdf[keys].dropna().drop_duplicates()
                m = ldf.merge(rk, on=keys, how="left", indicator=True)
                out[mark_col] = (m["_merge"] == "both").to_numpy()
            return out
        if how in ("left_anti", "left_semi"):
            # SQL EXISTS/NOT EXISTS semantics: a NULL key never matches
            # (pandas isin/merge would treat NaN == NaN as a match), so
            # NULL right keys are dropped — a NULL-key left row is kept by
            # anti and dropped by semi, as NOT EXISTS / EXISTS would
            if len(keys) == 1:
                mask = ldf[keys[0]].isin(rdf[keys[0]].dropna())
                return ldf[mask if how == "left_semi" else ~mask]
            rk = rdf[keys].dropna().drop_duplicates()
            m = ldf.merge(rk, on=keys, how="left", indicator=True)
            want = "both" if how == "left_semi" else "left_only"
            return m[m["_merge"] == want].drop(columns="_merge")
        return ldf.merge(rdf, on=keys, how=how)

    return bucket_cogroup(tagged_l, tagged_r, merge_bucket,
                          n_buckets=n_buckets, modular=True)


def asof_join_keyed(left, right, *, key: str, ts_col: str,
                    right_ts_col: str | None = None,
                    out_col: str = "asof",
                    left_cols: list[str] | None = None,
                    n_buckets: int | None = None):
    """Per-KEY as-of join of two LARGE Datasets: for each left row, the
    greatest right timestamp <= the left row's timestamp WITHIN the same
    key — the time-series enrichment join (trades-vs-quotes, events-vs-
    orders).  :func:`asof_lookup` is the broadcast variant for ONE global
    timeline; this one exchanges BOTH sides on the key hash (a key's rows
    co-locate in exactly one bucket) and runs one vectorized
    ``pandas.merge_asof(by=key)`` per bucket — no Python loops, no
    broadcast of a fact-sized side.  Left rows before their key's first
    right timestamp (or with no right rows at all) get a null ``out_col``.
    Bucket count derives from both sides' materialized bytes unless
    pinned.  Timestamps may be numeric (epoch) or arrow timestamp-typed;
    timestamp columns are normalized to int64 epoch MICROSECONDS before
    the merge (the add_tumbling_window cast convention — never a bare
    int view of a ns source), so ``out_col`` and a timestamp-typed
    ``ts_col`` come back as epoch-us int64 (null where unmatched)."""
    from katydid_haskell_ray.stages.exchange import bucket_cogroup

    rts = right_ts_col or ts_col

    def tag(cols, tcol):
        def f(b: pa.Table) -> pa.Table:
            b = b.select(cols)
            if pa.types.is_timestamp(b.schema.field(tcol).type):
                b = b.set_column(
                    b.column_names.index(tcol), tcol,
                    b.column(tcol).cast(pa.timestamp("us")).cast(pa.int64()))
            h = SK.hash64_array(b.column(key))
            return b.append_column("__bucket", pa.array(h.astype(np.uint64)))
        return f

    lproj = [key, ts_col] + [c for c in (left_cols or [])
                             if c not in (key, ts_col)]
    tl = left.map_batches(tag(lproj, ts_col), batch_format="pyarrow")
    tr = right.map_batches(tag([key, rts], rts), batch_format="pyarrow")

    def per_bucket(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.shape[1] == 0:
            return ldf
        ldf = ldf.drop(columns="__bucket").sort_values(ts_col,
                                                       kind="mergesort")
        if rdf.shape[1] == 0 or len(rdf) == 0:
            out = ldf.copy()
            out[out_col] = pd.array([None] * len(out), dtype="Int64")
            return out
        rdf = (rdf[[key, rts]].rename(columns={rts: out_col})
               .sort_values(out_col, kind="mergesort"))
        merged = pd.merge_asof(ldf, rdf, left_on=ts_col, right_on=out_col,
                               by=key, direction="backward")
        merged[out_col] = merged[out_col].astype("Int64")
        return merged

    joined = bucket_cogroup(tl, tr, per_bucket, n_buckets=n_buckets,
                            modular=True)

    def strip_pandas_meta(t: pa.Table) -> pa.Table:
        # rebuild without the from_pandas extension-dtype metadata: the
        # output contract is plain arrow int64 (+null mask where
        # unmatched), so downstream to_pandas gives int64 / float64-NaN
        # exactly like any SQL engine's nullable BIGINT
        return pa.table({c: t.column(c) for c in t.column_names})

    return joined.map_batches(strip_pandas_meta, batch_format="pyarrow")


def range_lookup(ds, *, value_col: str, lower: np.ndarray, upper: np.ndarray,
                 labels: np.ndarray, out_col: str = "band",
                 how: str = "inner"):
    """Broadcast range (interval) join: label each row with the interval
    ``[lower[i], upper[i])`` containing ``value_col``.

    The interval table is the SMALL side (bands, SLA tiers, histograms —
    O(10^2..10^5) rows): its sorted edges ship once via ``ray.put`` and
    each batch does ONE vectorized searchsorted, so the big side streams
    with no shuffle at any scale.  Intervals must be non-overlapping and
    sorted ascending.  ``how="inner"`` drops rows outside every interval;
    ``how="left"`` keeps them with a null label.
    """
    lower = np.asarray(lower)
    upper = np.asarray(upper)
    labels = np.asarray(labels)
    if not (len(lower) == len(upper) == len(labels)):
        raise ValueError("lower/upper/labels length mismatch")
    if np.any(lower[1:] < upper[:-1]) or np.any(upper <= lower):
        raise ValueError("intervals must be sorted and non-overlapping")
    ref = ray.put({"lo": lower, "hi": upper, "lab": labels})

    def tag(b: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(iv["lo"], v, side="right") - 1
        ok = (idx >= 0) & (v < iv["hi"][np.maximum(idx, 0)])
        lab = iv["lab"][np.maximum(idx, 0)]
        out = b.append_column(out_col, pa.array(lab, mask=~ok))
        if how == "inner":
            return out.filter(pa.array(ok))
        return out

    return ds.map_batches(tag, batch_format="pyarrow")


def asof_lookup(ds, *, ts_col: str, timeline: np.ndarray,
                out_col: str = "asof", values: np.ndarray | None = None):
    """Broadcast as-of join: for each row, the latest timeline entry <= ts.

    ``timeline`` (sorted int64, e.g. epoch seconds) is broadcast via
    ``ray.put`` once; each batch does ONE vectorized searchsorted.  Rows
    before the first entry get null.  ``values`` optionally maps matched
    timeline positions to a payload column."""
    timeline = np.asarray(timeline)
    ref = ray.put({"t": timeline, "v": values})

    def asof(b: pa.Table) -> pa.Table:
        p = ray.get(ref)  # zero-copy local object-store hit per task
        t, v = p["t"], p["v"]
        ts = b.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):  # normalize units before int cast
            ts = ts.cast(pa.timestamp("us"))
        tv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(t, tv, side="right") - 1
        ok = idx >= 0
        src = t if v is None else v
        vals = src[np.maximum(idx, 0)]
        return b.append_column(out_col, pa.array(vals, mask=~ok))

    return ds.map_batches(asof, batch_format="pyarrow")


def interval_join(points, intervals, *, value_col: str, lo_col: str,
                  hi_col: str, point_cols: list[str],
                  interval_cols: list[str], n_buckets: int | None = None):
    """Distributed point-in-interval join: one output row per (point p,
    interval i) pair with ``i.lo <= p.value <= i.hi`` (SQL BETWEEN,
    inclusive both ends).  Values must be numeric (callers normalize
    timestamps to int64 epoch-us first — the asof_join_keyed convention).

    Partitioning assumption (documented per the custom-operator rule):
    the observed point-value range splits into ``n_buckets`` equal
    chunks; every point lands in exactly ONE chunk bucket, while every
    interval REPLICATES to each bucket it overlaps — so each candidate
    pair is tested in exactly one bucket and no global dedup pass
    exists.  Interval replication factor is ceil(len/chunk): long
    intervals cost their true bucket overlap, which tracks the join's
    actual output size, not an artifact.  Within a bucket the expansion
    is output-linear: points argsort once by value, each interval finds
    its member range with two searchsorteds, and pairs materialize via
    np.repeat over range offsets — never an all-pairs frame.  Both
    bucket maps use the same monotone value->bucket function, so
    f(lo) <= f(v) <= f(hi) whenever lo <= v <= hi (pairs can't be
    missed across chunk edges).  The range scan is one cheap pass over
    the already-projected, already-materialized point side (the
    exchange materializes its input anyway)."""
    from katydid_haskell_ray.stages.exchange import (bucket_cogroup,
                                                     resolve_exchange)

    pproj = points.map_batches(
        lambda b, cols=list(dict.fromkeys(point_cols + [value_col])):
            b.select(cols),
        batch_format="pyarrow")
    pmat, n_buckets, _ = resolve_exchange(pproj, n_buckets)
    vmin = pmat.min(value_col)
    vmax = pmat.max(value_col)
    span = float(vmax - vmin) or 1.0
    chunk = span / n_buckets

    def _bucket_of(v: np.ndarray) -> np.ndarray:
        b = np.trunc((v.astype(np.float64) - vmin) / chunk)
        return np.clip(b, 0, n_buckets - 1).astype(np.int32)

    def tag_points(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        return b.append_column("__bucket", pa.array(_bucket_of(v)))

    def replicate_intervals(b: pa.Table) -> pa.Table:
        cols = list(dict.fromkeys(interval_cols + [lo_col, hi_col]))
        b = b.select(cols)
        lo = b.column(lo_col).to_numpy(zero_copy_only=False)
        hi = b.column(hi_col).to_numpy(zero_copy_only=False)
        # intervals wholly outside the observed point range match nothing
        idx = np.flatnonzero((hi >= vmin) & (lo <= vmax) & (hi >= lo))
        b0 = _bucket_of(lo[idx]).astype(np.int64)
        b1 = _bucket_of(hi[idx]).astype(np.int64)
        reps = b1 - b0 + 1
        rows = np.repeat(idx, reps)
        off = np.arange(int(reps.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(reps) - reps, reps)
        buckets = (np.repeat(b0, reps) + off).astype(np.int32)
        return b.take(pa.array(rows, type=pa.int64())) \
            .append_column("__bucket", pa.array(buckets))

    pts = pmat.map_batches(tag_points, batch_format="pyarrow")
    ivs = intervals.map_batches(replicate_intervals, batch_format="pyarrow")

    def per_bucket(pdf: pd.DataFrame, idf: pd.DataFrame) -> pd.DataFrame:
        # 0-column frame = that side globally empty (exchange convention,
        # cf. hash_join.merge_bucket); inner semantics -> empty output
        if pdf.shape[1] == 0 or idf.shape[1] == 0:
            return pd.DataFrame()
        if pdf.empty or idf.empty:
            return pd.concat([pdf[point_cols].iloc[0:0],
                              idf[interval_cols].iloc[0:0]], axis=1)
        v = pdf[value_col].to_numpy()
        order = np.argsort(v, kind="stable")
        vs = v[order]
        lo = idf[lo_col].to_numpy()
        hi = idf[hi_col].to_numpy()
        start = np.searchsorted(vs, lo, side="left")
        end = np.searchsorted(vs, hi, side="right")
        cnt = end - start
        ii = np.repeat(np.arange(len(idf), dtype=np.int64), cnt)
        pos = np.arange(int(cnt.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(cnt) - cnt, cnt) + np.repeat(start, cnt)
        pi = order[pos]
        return pd.concat(
            [pdf[point_cols].iloc[pi].reset_index(drop=True),
             idf[interval_cols].iloc[ii].reset_index(drop=True)], axis=1)

    return bucket_cogroup(pts, ivs, per_bucket, n_buckets=n_buckets)
