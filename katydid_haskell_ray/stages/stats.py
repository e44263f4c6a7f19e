"""Table-level statistics via per-batch partials + mergeable sketches.

The scale pattern (SURVEY.md §2.6; cf. Ray Data aggregation docs,
https://docs.ray.io/en/latest/data/aggregating-data.html):
``map_batches`` emits ONE tiny partial row per (batch, column) — count,
nulls, min, max, sum plus pickled HLL/KLL sketches — and the driver merges
the partials (a few KB each).  The full data never crosses the shuffle
boundary and nothing materializes; this stays O(blocks × columns) at any
input size, so the same code path serves 60k rows and 10^12 rows.
"""

from __future__ import annotations

import pickle
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from katydid_haskell_ray.state import sketches as SK

PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("nulls", pa.int64()),
    ("min", pa.float64()),
    ("max", pa.float64()),
    ("sum", pa.float64()),
    ("min_s", pa.string()),
    ("max_s", pa.string()),
    ("hll", pa.binary()),
    ("kll", pa.binary()),
])


class StatsPartials:
    """map_batches fn: one partial row per column per batch.

    ``numeric`` columns get min/max/sum + KLL quantile sketch; ``key``
    columns get HLL cardinality; string columns min/max lexicographic.
    Stateless on purpose — partials are the state, merged downstream, so
    tasks stay elastic and retry-safe.
    """

    def __init__(self, numeric: Iterable[str] = (), keys: Iterable[str] = (),
                 strings: Iterable[str] = (), kll_k: int = 256,
                 quantile_sketch: str = "kll"):
        self.numeric = tuple(numeric)
        self.keys = tuple(keys)
        self.strings = tuple(strings)
        self.kll_k = kll_k
        if quantile_sketch not in ("kll", "tdigest"):
            raise ValueError(f"unknown quantile sketch {quantile_sketch!r}")
        # both sketches share the add_values/merge/quantiles interface, so
        # the partial blob slot and the downstream merge are agnostic
        self.quantile_sketch = quantile_sketch

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        n = batch.num_rows
        for col in dict.fromkeys(self.numeric + self.keys + self.strings):
            arr = batch.column(col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            nulls = arr.null_count
            row = {"column": col, "count": n, "nulls": nulls,
                   "min": None, "max": None, "sum": None,
                   "min_s": None, "max_s": None, "hll": None, "kll": None}
            valid = arr.drop_null() if nulls else arr
            if col in self.numeric and len(valid):
                vals = valid.to_numpy(zero_copy_only=False).astype(np.float64)
                row["min"] = float(vals.min())
                row["max"] = float(vals.max())
                row["sum"] = float(vals.sum())
                sk = (SK.KLL(self.kll_k) if self.quantile_sketch == "kll"
                      else SK.TDigest())
                row["kll"] = pickle.dumps(sk.add_values(vals), protocol=5)
            elif col in self.strings and len(valid):
                mm = pc.min_max(valid)
                row["min_s"] = str(mm["min"].as_py())
                row["max_s"] = str(mm["max"].as_py())
            if col in self.keys and len(valid):
                row["hll"] = pickle.dumps(
                    SK.HLL().add_hashes(SK.hash64_array(valid)), protocol=5)
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=PARTIAL_SCHEMA)


def merge_stats(a: dict[str, dict], b: dict[str, dict]) -> dict[str, dict]:
    """Associatively merge two RAW stats dicts (pre-finalize) — the merge
    function for tree_reduce over per-shard stats states."""
    out = {k: dict(v) for k, v in a.items()}
    for col, s2 in b.items():
        s = out.setdefault(col, {
            "count": 0, "nulls": 0, "min": None, "max": None, "sum": 0.0,
            "min_s": None, "max_s": None, "hll": None, "kll": None,
        })
        s["count"] += s2["count"]
        s["nulls"] += s2["nulls"]
        for k, red in (("min", min), ("max", max), ("min_s", min), ("max_s", max)):
            if s2[k] is not None:
                s[k] = s2[k] if s[k] is None else red(s[k], s2[k])
        s["sum"] += s2["sum"]
        for k in ("hll", "kll"):
            if s2[k] is not None:
                s[k] = s2[k] if s[k] is None else s[k].merge(s2[k])
    return out


def finalize_stats(out: dict[str, dict]) -> dict[str, dict]:
    """Add derived fields (null_rate, cardinality, quantiles) to a raw
    stats dict."""
    for s in out.values():
        s["null_rate"] = s["nulls"] / s["count"] if s["count"] else 0.0
        if s["hll"] is not None:
            s["cardinality"] = s["hll"].estimate()
        if s["kll"] is not None:
            s["quantiles"] = {
                q: float(v) for q, v in zip(
                    (0.01, 0.25, 0.5, 0.75, 0.99),
                    s["kll"].quantiles([0.01, 0.25, 0.5, 0.75, 0.99]))
            }
    return out


def merge_partials(partials: pa.Table, finalize: bool = True) -> dict[str, dict]:
    """Merge partial rows (small — driver side) into per-column stats."""
    out: dict[str, dict] = {}
    for row in partials.to_pylist():
        col = row["column"]
        s = out.setdefault(col, {
            "count": 0, "nulls": 0, "min": None, "max": None, "sum": 0.0,
            "min_s": None, "max_s": None, "hll": None, "kll": None,
        })
        s["count"] += row["count"]
        s["nulls"] += row["nulls"]
        for k, red in (("min", min), ("max", max), ("min_s", min), ("max_s", max)):
            if row[k] is not None:
                s[k] = row[k] if s[k] is None else red(s[k], row[k])
        if row["sum"] is not None:
            s["sum"] += row["sum"]
        for k in ("hll", "kll"):
            if row[k] is not None:
                sk = pickle.loads(row[k])
                s[k] = sk if s[k] is None else s[k].merge(sk)
    return finalize_stats(out) if finalize else out


def profile_of(stats: dict[str, dict]) -> dict:
    """Serializable reference profile (for drift comparison across runs)."""
    prof = {}
    for col, s in stats.items():
        prof[col] = {
            "count": s["count"], "null_rate": s["null_rate"],
            "min": s["min"], "max": s["max"],
            "cardinality": s.get("cardinality"),
            "kll": None if s["kll"] is None else pickle.dumps(s["kll"], protocol=5).hex(),
        }
    return prof


def drift_against(stats: dict[str, dict], profile: dict,
                  threshold: float = 0.1) -> dict[str, dict]:
    """Compare current column stats against a stored profile.

    Returns per-column {score, drifted, null_rate_delta}; score is the max
    normalized KLL quantile delta (SURVEY.md §2.6 'distribution drift')."""
    report = {}
    for col, ref in profile.items():
        cur = stats.get(col)
        if cur is None:
            continue
        entry = {"score": None, "drifted": False,
                 "null_rate_delta": abs(cur["null_rate"] - ref["null_rate"])}
        if cur.get("kll") is not None and ref.get("kll"):
            ref_kll = pickle.loads(bytes.fromhex(ref["kll"]))
            entry["score"] = SK.quantile_drift(cur["kll"], ref_kll)
            entry["drifted"] = entry["score"] > threshold
        report[col] = entry
    return report
