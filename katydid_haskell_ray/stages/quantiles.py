"""Exact distributed quantiles over bounded-cardinality columns.

The north-star pairs the KLL sketch (state/sketches.py) with an EXACT twin
for integer-valued metrics (token counts, dimensions, session lengths):
a value-histogram shuffle.  Per-batch ``np.unique`` partials act as the
combiner, the groupby exchanges only (value, count) pairs — O(V) rows per
block regardless of N — and the final cumulative pick runs over the tiny
merged histogram.  V (distinct values) must be small relative to N; for
unbounded / continuous columns use the KLL sketch path instead.

Quantile index convention matches DuckDB's ``quantile_disc``: the element
at sorted position ``max(ceil(q*N) - 1, 0)`` with q*N computed in IEEE
double (verified against DuckDB across N in tests).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def value_histogram(ds, col: str):
    """Dataset -> Dataset[(value, cnt)] exact histogram of an int column."""
    from katydid_haskell_ray.stages.exchange import bucketed_group_sum

    def partial(b: pa.Table) -> pa.Table:
        # NULLs are ignored, as SQL quantiles ignore them (a nullable int
        # column round-trips through float64/NaN otherwise)
        arr = b.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = arr.drop_null().to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(vals.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    return bucketed_group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                              ["value"])


def grouped_value_histogram(ds, group_col: str, col: str):
    """Dataset -> Dataset[(group, value, cnt)] per-group exact histogram."""
    from katydid_haskell_ray.stages.exchange import bucketed_group_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[col].notna()]  # SQL quantiles ignore NULL values
        out = (b.groupby([group_col, col], as_index=False, dropna=False)
               .size().rename(columns={col: "value", "size": "cnt"}))
        out["value"] = out["value"].astype(np.int64)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    return bucketed_group_sum(ds.map_batches(partial, batch_format="pandas"),
                              [group_col, "value"])


def grouped_quantiles_from_histogram(hist, group_col: str,
                                     qs: dict[int, float],
                                     value_name: str = "value") -> pd.DataFrame:
    """Per-group quantile pick over the tiny merged grouped histogram.

    A globally-empty input yields zero rows, like SQL GROUP BY."""
    if not isinstance(hist, pd.DataFrame):
        hist = hist.to_pandas()
    if hist.empty or group_col not in hist.columns:
        return pd.DataFrame({group_col: [], "q_pct": pd.Series([], dtype=np.int64),
                             value_name: []})
    outs = []
    for gval, sub in hist.groupby(group_col, sort=True):
        q = quantiles_from_histogram(sub, qs, value_name=value_name)
        q.insert(0, group_col, gval)
        outs.append(q)
    return pd.concat(outs, ignore_index=True)


def quantiles_cont_from_histogram(hist, qs: dict[int, float],
                                  value_name: str = "value") -> pd.DataFrame:
    """Interpolated quantiles (DuckDB ``quantile_cont`` parity: position
    q*(N-1), linear interpolation lo*(1-f) + hi*f in IEEE double) from the
    exact value histogram."""
    if not isinstance(hist, pd.DataFrame):
        hist = hist.to_pandas()
    if hist.empty:  # a globally-empty input yields a schemaless frame
        hist = pd.DataFrame({"value": [], "cnt": []})
    hist = hist.sort_values("value").reset_index(drop=True)
    cum = hist["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    vals = hist["value"].to_numpy()

    def elem(i: int) -> float:
        # i-th (0-based) element of the expanded sorted multiset
        return float(vals[np.searchsorted(cum, i + 1, side="left")])

    rows = []
    for pct, q in qs.items():
        if n == 0:
            rows.append({"q_pct": np.int64(pct), value_name: None})
            continue
        pos = np.float64(q) * (n - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        f = float(pos - lo)
        v = elem(lo) * (1 - f) + elem(hi) * f
        rows.append({"q_pct": np.int64(pct), value_name: v})
    return pd.DataFrame(rows)


def quantiles_from_histogram(hist, qs: dict[int, float],
                             value_name: str = "value") -> pd.DataFrame:
    """Histogram Dataset/frame -> one row per requested quantile.

    ``qs`` maps an integer percent label to the quantile fraction; output
    columns are (q_pct, <value_name>).  The histogram is tiny (O(V) rows)
    by construction — materializing it on the driver is the point."""
    if not isinstance(hist, pd.DataFrame):
        hist = hist.to_pandas()
    if hist.empty:  # a globally-empty input yields a schemaless frame
        hist = pd.DataFrame({"value": [], "cnt": []})
    hist = hist.sort_values("value").reset_index(drop=True)
    cum = hist["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    vals = hist["value"].to_numpy()
    rows = []
    for pct, q in qs.items():
        if n == 0:  # duckdb: quantile over zero rows is NULL
            rows.append({"q_pct": np.int64(pct), value_name: None})
            continue
        # duckdb quantile_disc parity: double q*N, ceil, clamp at 0
        idx = max(int(math.ceil(np.float64(q) * n)) - 1, 0)
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        rows.append({"q_pct": np.int64(pct),
                     value_name: np.int64(vals[min(pos, len(vals) - 1)])})
    return pd.DataFrame(rows)
