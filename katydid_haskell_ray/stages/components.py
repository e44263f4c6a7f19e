"""Connected components over an edge Dataset — iterative min-label
propagation expressed as ONE bucketed groupby exchange per round.

The dedup tail needs the connected components of the verified near-dup pair
graph (cluster id = min doc id of the component).  A driver-side union-find
holds every edge in one process; this operator instead keeps everything in
Ray Datasets and converges in O(component diameter) rounds (near-dup
clusters are shallow — a star around the representative is diameter 2).

Per-round plan (delta propagation, classic BSP label propagation):

    round input = adjacency rows  (bucket(v), EDGE, v, nbr)
                ∪ label rows      (bucket(v), LABEL, v, label(v))
                ∪ message rows    (bucket(v), MSG, v, candidate)   [deltas]
    one groupby("bucket") exchange; per bucket (vectorized pandas):
        new_label(v) = min(label(v), incoming candidates)
        emit LABEL rows for every v, plus MSG rows (bucket(u), MSG, u,
        new_label(v)) for each neighbor u of every *changed* v
    stop when no label changed (a Sum over the emitted `changed` flags).

Only (int64, int64) rows ever shuffle — no payload.  A node's label is
monotone non-increasing and re-broadcast only on change, so total message
volume is O(E · diameter) worst-case but O(E) for star-shaped dup graphs.

The exchange is resolved ONCE on the seed state (the volume maximum;
later rounds shrink).  Known 100x refinement: the static EDGE rows are
re-exchanged every round even though their bucket assignment never
changes — an actor-pinned-partition iterate (adjacency resident per
bucket actor, only LABEL/MSG rows moving) would cut per-round volume to
the deltas; adopt it if component diameters or edge counts grow to where
rounds dominate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EDGE, _LABEL, _MSG = 0, 1, 2


def _bucket_of(ids: np.ndarray) -> np.ndarray:
    # FULL-RANGE hash: the exchange takes it mod a per-round bucket count
    # derived from the materialized state size (modular exchange)
    return ids.astype(np.int64).view(np.uint64)


def connected_components(edges, *, a_col: str = "a", b_col: str = "b",
                         n_buckets: int | None = None, max_rounds: int = 50):
    """Undirected edge Dataset -> materialized Dataset (node, label); label
    is the minimum node id of the node's component.  Every endpoint of every
    edge appears exactly once.  Raises if max_rounds is hit (graph deeper
    than expected — raise max_rounds for adversarial chain shapes)."""
    from ray.data.aggregate import Sum

    def seed(b: pa.Table) -> pa.Table:
        a = b.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, bb])
        nbr = np.concatenate([bb, a])
        bucket = _bucket_of(node)
        # EDGE rows (static adjacency), LABEL seeds (label=v, deduped in the
        # first per-bucket pass) and MSG seeds (each neighbor's id) share one
        # schema so every round is a single union -> groupby
        return pa.table({
            "bucket": pa.array(np.tile(bucket, 3)),
            "tag": pa.array(np.repeat(
                np.array([_EDGE, _LABEL, _MSG], dtype=np.int8), len(node))),
            "node": pa.array(np.tile(node, 3)),
            "val": pa.array(np.concatenate([nbr, node, nbr])),
            "changed": pa.array(np.zeros(3 * len(node), dtype=np.int8)),
        })

    def step(g: pd.DataFrame) -> pd.DataFrame:
        tag = g["tag"].to_numpy()
        ed = g[tag == _EDGE]
        lab = g[tag == _LABEL].groupby("node", as_index=False)["val"].min()
        inc = g[tag == _MSG]
        if len(inc):
            cand = (pd.concat([lab, inc[["node", "val"]]])
                    .groupby("node", as_index=False)["val"].min())
        else:
            cand = lab
        merged = lab.merge(cand, on="node", suffixes=("_old", "_new"))
        ch = merged["val_new"].to_numpy() < merged["val_old"].to_numpy()
        parts = [pd.DataFrame({
            "bucket": _bucket_of(merged["node"].to_numpy()),
            "tag": np.int8(_LABEL),
            "node": merged["node"].to_numpy(),
            "val": merged["val_new"].to_numpy(),
            "changed": ch.astype(np.int8)}),
            pd.DataFrame({
                "bucket": ed["bucket"].to_numpy(),
                "tag": np.int8(_EDGE),
                "node": ed["node"].to_numpy(),
                "val": ed["val"].to_numpy(),
                "changed": np.int8(0)})]
        if ch.any():
            # changed nodes re-send their new label to every neighbor —
            # MIN-COMBINED per destination before leaving this bucket
            # (min is associative), so a hot representative receives at
            # most one message PER SENDING BUCKET per round, never its
            # full degree in one reduce task
            send = ed.merge(merged.loc[ch, ["node", "val_new"]], on="node")
            m = (pd.DataFrame({"node": send["val"].to_numpy(),
                               "val": send["val_new"].to_numpy()})
                 .groupby("node", as_index=False)["val"].min())
            parts.append(pd.DataFrame({
                "bucket": _bucket_of(m["node"].to_numpy()),
                "tag": np.int8(_MSG),
                "node": m["node"].to_numpy(),
                "val": m["val"].to_numpy(),
                "changed": np.int8(0)}))
        out = pd.concat(parts, ignore_index=True)
        out["bucket"] = out["bucket"].astype(np.uint64)
        return out

    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)

    edges = edges.materialize()
    if edges.count() == 0:  # empty graph: empty (node, label) result,
        import ray as _ray     # not a schemaless-state crash
        return _ray.data.from_arrow(pa.table(
            {"node": pa.array([], type=pa.int64()),
             "label": pa.array([], type=pa.int64())}))
    state = edges.map_batches(seed, batch_format="pyarrow")
    nb = max_b = None
    for rnd in range(max_rounds):
        if nb is None:
            # resolve ONCE on the seed state (the volume maximum): later
            # rounds only shrink, so the bucket count stays sufficient and
            # the per-bucket byte bound stays valid — re-resolving every
            # round costs one extra materialize+job per round
            mat, nb, max_b = resolve_exchange(state, n_buckets)
        else:
            mat = state
        state = bucket_map_groups(mat, step, n_buckets=nb,
                                  bucket_col="bucket", modular=True,
                                  max_bucket_bytes=max_b).materialize()
        if rnd == 0:
            continue  # seed LABELs start changed=0; one real round first
        changed = state.aggregate(Sum("changed", alias_name="c"))["c"]
        if not changed:
            return (state.filter(expr=f"tag == {_LABEL}")
                    .select_columns(["node", "val"])
                    .rename_columns(["node", "label"]))
    raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
