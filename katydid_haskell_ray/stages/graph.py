"""Distributed triangle counting over an undirected edge list.

The operator is the MapReduce node-iterator of Suri & Vassilvitskii
("Counting Triangles and the Curse of the Last Reducer", WWW 2011):

1. degree per node — per-block partials over both endpoints + one keyed
   exchange (combiner-before-shuffle, like every aggregation here);
2. orient every edge from its lower endpoint to its higher endpoint in
   the (degree, node) total order — each out-neighborhood is then at
   most O(sqrt(E)) wide, which bounds wedge blowup on hot nodes (the
   "last reducer" skew fix);
3. group oriented edges by source (keyed exchange) and emit one wedge
   per out-neighbor pair, ordered by the same total order, so a wedge's
   closing edge — if it exists — is stored in exactly that orientation;
4. match wedges against the oriented edge set with a partitioned hash
   semi join on the (lo, hi) composite key.  Each triangle is found
   exactly once (at its minimum-order apex) and credits all 3 corners.

Shuffle budget: one exchange for degrees, two hash joins to attach
degrees to endpoints, one exchange for adjacency grouping, one cogroup
for the wedge match, one exchange for the per-node credit rollup — all
keyed and data-sized (resolve_exchange), nothing node- or edge-count-
sized ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _auto_exchange(bucketed, per_bucket, batch_format: str = "pandas"):
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    mat, nb, max_b = resolve_exchange(bucketed)
    return bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b,
                             batch_format=batch_format)


def _hashed(ds, key: str):
    from katydid_haskell_ray.stages import keys as K
    return ds.map_batches(K.add_hash_fn(key), batch_format="pyarrow")


def local_triangle_counts(edges, *, a_col: str = "a", b_col: str = "b",
                          node_col: str = "node", out_col: str = "n_tri"):
    """Per-node triangle participation counts over an undirected simple
    graph given as a Dataset of distinct edges (``a_col`` < ``b_col``,
    no self-loops, no duplicates — the caller's contract; int64 node
    ids).  Returns a Dataset[(node_col, out_col)] with one row per node
    that is a corner of at least one triangle.
    """
    from katydid_haskell_ray.stages.join import hash_join

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column(a_col).cast(pa.int64()),
                         "b": t.column(b_col).cast(pa.int64())})

    e = edges.map_batches(to_ab, batch_format="pyarrow").materialize()

    # ---- 1. degrees: per-block partials over BOTH endpoints ----
    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([t.column("a").to_numpy(),
                               t.column("b").to_numpy()])
        node, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(node.astype(np.int64)),
                         "d": pa.array(cnt.astype(np.int64))})

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["d"].sum()

    deg = _auto_exchange(_hashed(e.map_batches(deg_partial,
                                               batch_format="pyarrow"),
                                 "node"), deg_bucket).materialize()

    # ---- 2. orientation: attach (degree) to each endpoint via two
    # partitioned hash joins (the degree table grows with the node
    # count, so it is never broadcast), then direct each edge from its
    # lower (d, node) endpoint to the higher ----
    j1 = hash_join(e, deg.map_batches(
        lambda t: pa.table({"a": t.column("node"), "da": t.column("d")}),
        batch_format="pyarrow"), key="a", left_cols=["b"],
        right_cols=["da"])
    j2 = hash_join(j1, deg.map_batches(
        lambda t: pa.table({"b": t.column("node"), "db": t.column("d")}),
        batch_format="pyarrow"), key="b", left_cols=["a", "da"],
        right_cols=["db"])

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        da = t.column("da").to_numpy()
        db = t.column("db").to_numpy()
        # lower (degree, id) endpoint becomes the source; a < b always,
        # so the id tie-break is deterministic
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddst = np.where(a_first, db, da)
        return pa.table({
            "src": pa.array(src.astype(np.int64)),
            "dst": pa.array(dst.astype(np.int64)),
            "ddst": pa.array(ddst.astype(np.int64))})

    oriented = j2.map_batches(orient, batch_format="pyarrow").materialize()

    # ---- 3. wedges: group by source, emit every out-neighbor pair in
    # (degree, id) order so the closing edge key is exactly the stored
    # orientation.  Degree orientation bounds each out-neighborhood at
    # O(sqrt(E)), so per-source pair expansion cannot blow up on hot
    # nodes; the exchange sizing bound still asserts the bucket total.
    def wedge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "ddst", "dst"], kind="mergesort")
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        # fully vectorized all-(i<j)-pairs within runs of equal src: the
        # element at in-run position p (run length L) is the LO side of
        # L-1-p pairs whose HI sides are the next elements of the run
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        lens = np.diff(np.r_[starts, len(src)])
        pos = np.arange(len(src)) - np.repeat(starts, lens)
        counts = np.repeat(lens, lens) - 1 - pos   # pairs led by each elem
        tot = int(counts.sum())
        if tot == 0:
            return pd.DataFrame({"apex": np.empty(0, np.int64),
                                 "lo": np.empty(0, np.int64),
                                 "hi": np.empty(0, np.int64)})
        lo_idx = np.repeat(np.arange(len(src)), counts)
        run_off = np.cumsum(counts) - counts
        seq = np.arange(tot) - np.repeat(run_off, counts)
        hi_idx = lo_idx + 1 + seq
        return pd.DataFrame({"apex": src[lo_idx], "lo": dst[lo_idx],
                             "hi": dst[hi_idx]})

    wedges = _auto_exchange(_hashed(oriented, "src"), wedge_bucket)

    # ---- 4. closing-edge semi join on the composite (lo, hi) key ----
    closed = hash_join(
        wedges,
        oriented.map_batches(
            lambda t: pa.table({"lo": t.column("src"),
                                "hi": t.column("dst")}),
            batch_format="pyarrow"),
        key=["lo", "hi"], left_cols=["apex"], right_cols=[],
        how="left_semi")

    # ---- 5. credit all three corners, roll up per node ----
    def credit_partial(t: pa.Table) -> pa.Table:
        tri = np.concatenate([t.column("apex").to_numpy(),
                              t.column("lo").to_numpy(),
                              t.column("hi").to_numpy()])
        node, cnt = np.unique(tri, return_counts=True)
        return pa.table({node_col: pa.array(node.astype(np.int64)),
                         out_col: pa.array(cnt.astype(np.int64))})

    def credit_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(node_col, as_index=False)[out_col].sum()

    return _auto_exchange(_hashed(closed.map_batches(
        credit_partial, batch_format="pyarrow"), node_col), credit_bucket)
