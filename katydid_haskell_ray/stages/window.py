"""Stream-shaped operators over the events table.

Ray Data is a batch engine with no event-time watermarks
(https://docs.ray.io/en/latest/data/data-internals.html — streaming
*execution*, not streaming *semantics*); windows are expressed as plain columns +
groupbys, sessions as per-key sorted map_groups.  Both forms are exactly
SQL-expressible for the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def add_tumbling_window(batch: pa.Table, *, ts_col: str = "ts",
                        width_s: int = 3600,
                        out: str = "window_start") -> pa.Table:
    """Add the tumbling-window start timestamp (epoch-seconds floor).

    SQL-equivalent: to_timestamp(floor(epoch(ts)/W)*W)."""
    ts = batch.column(ts_col)
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    # normalize to MICROSECONDS first: an ns-resolution source would
    # otherwise scale every window width by 1000
    us = ts.cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    start = (us // (width_s * 1_000_000)) * (width_s * 1_000_000)
    return batch.append_column(out, pa.array(start).cast(pa.timestamp("us")))


def tumbling_aggregate(ds, *, width_s: int = 3600, keys=("event_type",),
                       value_col: str = "value"):
    """count + sum(value) per (window_start, *keys) — windowed aggregate.

    The window column is added in a vectorized map_batches; the groupby
    shuffles only (window, keys, value) projections."""
    cols = ["ts", value_col, *keys]
    windowed = ds.select_columns(cols).map_batches(
        lambda b: add_tumbling_window(b, width_s=width_s),
        batch_format="pyarrow")

    # combiner before the shuffle: windows x keys is small, so per-batch
    # partials collapse the exchange to a few rows per block
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["window_start", *keys], as_index=False,
                          dropna=False)
                .agg(n_events=(value_col, "size"),
                     sum_value=(value_col, "sum")))

    return _bucketed_group_sum(windowed.map_batches(partial,
                                                    batch_format="pandas"),
                               ["window_start", *keys])


def _bucketed_group_sum(partials, keys: list[str],
                        n_buckets: int | None = None):
    from katydid_haskell_ray.stages.exchange import bucketed_group_sum
    return bucketed_group_sum(partials, keys, n_buckets=n_buckets)


def hopping_aggregate(ds, *, width_s: int = 3600, hop_s: int = 1800,
                      keys=("event_type",), value_col: str = "value",
                      ts_col: str = "ts", sum_as: str = "sum_value"):
    """count + sum(value) per (window_start_s, *keys) over HOPPING windows
    (width ``width_s``, advancing every ``hop_s``; width must be a
    multiple of hop).

    Each row belongs to k = width/hop windows.  The k-fold expansion
    happens INSIDE the per-batch combiner (np.repeat/np.tile over the
    projected columns only) and collapses to per-(window, key) partials in
    the same pass — the exchange carries O(windows x keys) rows per block,
    never k x N events.

    SQL-equivalent: CROSS JOIN a k-row offset table j, window_start =
    floor(epoch(ts)/hop)*hop - j*hop, GROUP BY."""
    if width_s % hop_s:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)  # unit-normalized
        smax = us // hop_us * hop_s  # largest window start, epoch-seconds
        n = len(b)
        d = pd.DataFrame({"window_start_s": np.repeat(smax, k)
                          - np.tile(np.arange(k, dtype=np.int64) * hop_s, n)})
        for key in keys:
            d[key] = np.repeat(b[key].to_numpy(), k)
        d[value_col] = np.repeat(b[value_col].to_numpy(), k)
        return (d.groupby(["window_start_s", *keys], as_index=False,
                          dropna=False)
                .agg(**{"n_events": (value_col, "size"),
                        sum_as: (value_col, "sum")}))

    return _bucketed_group_sum(
        ds.select_columns([ts_col, value_col, *keys])
        .map_batches(partial, batch_format="pandas"),
        ["window_start_s", *keys])


def add_key_hash(t: pa.Table, key: str,
                 bucket_col: str = "__bucket") -> pa.Table:
    """Append the full-range uint64 key hash — the exchange takes it mod a
    bucket count chosen AFTER materialization (resolve_exchange), so raw-row
    shuffles scale their reduce fan-out with the data instead of a constant."""
    from katydid_haskell_ray.state import sketches as SK
    return t.append_column(bucket_col, pa.array(SK.hash64_array(t.column(key))))


def rolling_sum(ds, *, key: str = "user_id", order_cols=("ts", "event_id"),
                value_col: str = "value", window: int = 5,
                out: str = "roll_sum", n_buckets: int | None = None):
    """Per-key rolling sum over the current + (window-1) preceding rows in
    ``order_cols`` order — SQL ``SUM(v) OVER (PARTITION BY key ORDER BY ...
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    Scale shape: same coarse-bucket exchange as sessionize — a key never
    spans buckets, so each bucket runs ONE vectorized pandas pass (sort +
    C-speed groupby-rolling), never a Python call per key.  This ships RAW
    ROWS, so the bucket count defaults to data-derived (resolve_exchange)
    with the per-bucket byte bound asserted in the reduce."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort")
        r = (g.groupby(key, sort=False)[value_col]
             .rolling(window, min_periods=1).sum()
             .reset_index(drop=True).to_numpy())
        out_df = g.drop(columns=["__bucket"]).reset_index(drop=True)
        out_df[out] = r.astype(g[value_col].dtype)
        return out_df

    cols = [key, *order_cols, value_col]
    bucketed = ds.select_columns(cols).map_batches(
        lambda t: add_key_hash(t, key), batch_format="pyarrow")
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    mat, nb, max_b = resolve_exchange(bucketed, n_buckets)
    return bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b)


def sessionize(ds, *, key: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800, n_buckets: int | None = None,
               per_key_stats: bool = False):
    """Session windows per key: a new session starts when the gap from the
    previous event exceeds ``gap_s``.  Returns (user_id, session_seq,
    session_start, session_end, n_events).

    ``per_key_stats=True`` instead returns (key, n_sessions, n_events) —
    computed INSIDE the same bucket pass (a key never spans buckets), so
    the per-key rollup costs zero extra exchanges.

    Scale shape: a groupby per KEY would invoke Python once per key; this
    shuffles on a coarse hash bucket of the key (n_buckets groups total)
    and runs ONE vectorized pandas pass per bucket — sort by (key, ts),
    boundary flags where the key changes or the gap exceeds gap_s, a single
    C-speed groupby over (key, session).

    SQL-equivalent (oracle): lag + cumulative-sum-of-boundary-flags window
    functions."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64) // 1_000_000
        k = g[key].to_numpy()
        new_sess = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_sess[1:] = ((k[1:] != k[:-1])
                            | (ts[1:] - ts[:-1] > gap_s)).astype(np.int64)
        sid = np.cumsum(new_sess)
        d = g.assign(__sid=sid)
        first = d.groupby(key, sort=False)["__sid"].transform("min").to_numpy()
        d["session_seq"] = sid - first + 1
        if per_key_stats:
            return (d.groupby(key, sort=False)
                    .agg(n_sessions=("__sid", "nunique"),
                         n_events=("__sid", "size")).reset_index()
                    [[key, "n_sessions", "n_events"]])
        out = d.groupby([key, "session_seq"], sort=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        ).reset_index()
        return out[[key, "session_seq", "session_start", "session_end",
                    "n_events"]]

    bucketed = ds.select_columns([key, ts_col]).map_batches(
        lambda t: add_key_hash(t, key), batch_format="pyarrow")
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    mat, nb, max_b = resolve_exchange(bucketed, n_buckets)
    return bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b)
