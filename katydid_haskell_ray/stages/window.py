"""Stream-shaped operators over the events table.

Ray Data is a batch engine with no event-time watermarks (ray_guide
"Streaming-shaped workloads"); windows are expressed as plain columns +
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
    us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    start = (us // (width_s * 1_000_000)) * (width_s * 1_000_000)
    return batch.append_column(out, pa.array(start).cast(pa.timestamp("us")))


def tumbling_aggregate(ds, *, width_s: int = 3600, keys=("event_type",),
                       value_col: str = "value"):
    """count + sum(value) per (window_start, *keys) — windowed aggregate.

    The window column is added in a vectorized map_batches; the groupby
    shuffles only (window, keys, value) projections."""
    from ray.data.aggregate import Count, Sum

    cols = ["ts", value_col, *keys]
    windowed = ds.select_columns(cols).map_batches(
        lambda b: add_tumbling_window(b, width_s=width_s),
        batch_format="pyarrow")
    return windowed.groupby(["window_start", *keys]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_col, alias_name="sum_value"))


def sessionize(ds, *, key: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800):
    """Session windows per key: a new session starts when the gap from the
    previous event exceeds ``gap_s``.  Per-key sorted map_groups (the
    ordering assumption: within one group, events are sorted here, not
    upstream).  Returns (user_id, session_id, session_start, session_end,
    n_events).

    SQL-equivalent (oracle): lag + cumulative-sum-of-boundary-flags window
    functions."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("int64").to_numpy() // 1_000_000
        new_sess = np.ones(len(g), dtype=np.int64)
        new_sess[1:] = (ts[1:] - ts[:-1] > gap_s).astype(np.int64)
        sess = np.cumsum(new_sess)
        out = g.assign(session_seq=sess).groupby("session_seq").agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        ).reset_index()
        out[key] = g[key].iloc[0]
        return out[[key, "session_seq", "session_start", "session_end", "n_events"]]

    return ds.select_columns([key, ts_col]).groupby(key).map_groups(
        per_key, batch_format="pandas")
