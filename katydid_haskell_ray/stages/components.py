"""Connected components over an edge Dataset — actor-pinned adjacency
partitions with delta-only label propagation (BSP).

The dedup tail needs the connected components of the verified near-dup pair
graph (cluster id = min doc id of the component).  A driver-side union-find
holds every edge in one process; round 4's exchange-based BSP kept
everything in Datasets but re-shuffled the STATIC edge rows every round
(O(E · diameter) volume — its own docstring's "known 100x refinement").
This version pins the adjacency: the edge set ships exactly ONCE into P
partition actors (each holds a CSR over the nodes hashing to it), and each
BSP round moves only (node, candidate-label) DELTA messages between actors
— per-round volume O(changed-degree), zero for converged regions.

Per-round plan (min-label propagation; label(v) monotone non-increasing):

    round 1 (free, local): label(v) = min(v, min neighbor id) — every
        neighbor's SEED label is its id, already resident in the CSR.
    round k: new_label(v) = min(label(v), incoming candidates); every
        CHANGED v re-sends its label to its neighbors, min-combined per
        (destination partition, node) before leaving the actor — a hot
        representative receives at most one message per sending partition.
    stop when no label changed anywhere.

Messages route actor-to-actor through the object store (each ``step`` call
returns one object PER destination partition via ``num_returns``, so an
actor fetches only its own inbox — the driver touches object refs and a
per-round changed count, never data).  Actors take ``num_cpus=0``: the
edge-push map tasks block on delivery acks while holding CPU slots, so the
actors must be schedulable without one (the round-3 chained-pool deadlock
rule).  Adjacencies dedup (node, nbr) pairs at finalize, which also makes
delivery idempotent under Ray task retries.

Reference anchor: this is the grouping step between near-dup pair
generation and keep-selection (SURVEY.md dedup family); the reference has
no distributed analog — single-process union-find is the oracle
(tests/test_round4b_ops.py) plus a recursive reachability CTE in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_EMPTY_MSG = np.empty((2, 0), dtype=np.int64)


def _part_of(ids: np.ndarray, n_parts: int) -> np.ndarray:
    # uint64 view spreads negative ids; plain mod suffices for int64 ids
    return (ids.astype(np.int64).view(np.uint64) % np.uint64(n_parts)) \
        .astype(np.int64)


@ray.remote(num_cpus=0)
class _CCPartition:
    """One adjacency partition: owns every node whose hash lands here."""

    def __init__(self, part_id: int, n_parts: int):
        self.part_id = part_id
        self.n_parts = n_parts
        self._node_chunks: list[np.ndarray] = []
        self._nbr_chunks: list[np.ndarray] = []
        self.nodes: np.ndarray | None = None  # unique sorted owned nodes
        self.labels: np.ndarray | None = None
        self.indptr: np.ndarray | None = None  # CSR over self.nodes
        self.nbrs: np.ndarray | None = None
        self._local_pending = False  # local fixpoint hit its pass cap

    def add_edges(self, node: np.ndarray, nbr: np.ndarray) -> int:
        self._node_chunks.append(np.asarray(node, dtype=np.int64))
        self._nbr_chunks.append(np.asarray(nbr, dtype=np.int64))
        return len(node)

    def finalize(self) -> int:
        node = (np.concatenate(self._node_chunks) if self._node_chunks
                else np.empty(0, dtype=np.int64))
        nbr = (np.concatenate(self._nbr_chunks) if self._nbr_chunks
               else np.empty(0, dtype=np.int64))
        self._node_chunks = self._nbr_chunks = []  # free the staging
        # dedup (node, nbr): idempotent under task retries, and CC is
        # multiplicity-free anyway
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        if len(node):
            keep = np.ones(len(node), dtype=bool)
            keep[1:] = (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])
            node, nbr = node[keep], nbr[keep]
        self.nodes, counts = np.unique(node, return_counts=True)
        self.indptr = np.zeros(len(self.nodes) + 1, dtype=np.int64)
        np.cumsum(counts, out=self.indptr[1:])
        self.nbrs = nbr  # already grouped by node via the lexsort
        self.labels = self.nodes.copy()  # seed: label(v) = v
        # local/remote adjacency split: a neighbor owned by this actor
        # propagates through the in-actor fixpoint; only remote neighbors
        # ever need a message
        if len(self.nodes):
            idx = np.searchsorted(self.nodes, self.nbrs) \
                .clip(max=len(self.nodes) - 1)
            self.nbr_idx = idx
            self.nbr_own = self.nodes[idx] == self.nbrs
        else:
            self.nbr_idx = np.empty(0, dtype=np.int64)
            self.nbr_own = np.empty(0, dtype=bool)
        return len(self.nodes)

    _LOCAL_PASS_CAP = 32  # per global round; bounds worst-case chain cost

    def _local_fixpoint(self) -> None:
        """Vectorized in-actor min-label passes until stable (or the pass
        cap): a label crosses the entire locally-connected region in one
        global round instead of one edge per round — the difference
        between O(diameter) and O(cross-partition diameter) rounds.

        If the cap trips, ``_local_pending`` records it so the next
        ``step`` RESUMES the fixpoint even with an empty inbox — without
        this, a deep locally-resident chain would read as globally
        converged (changed==0, no messages) with wrong labels."""
        imax = np.iinfo(np.int64).max
        for _ in range(self._LOCAL_PASS_CAP):
            g = np.where(self.nbr_own, self.labels[self.nbr_idx], imax)
            cand = np.minimum.reduceat(g, self.indptr[:-1])
            new = np.minimum(self.labels, cand)
            if np.array_equal(new, self.labels):
                self._local_pending = False
                return
            self.labels = new
        self._local_pending = True

    def _send(self, changed_idx: np.ndarray):
        """Changed nodes broadcast their new label to their REMOTE
        neighbors (owned ones already converged in the local fixpoint),
        min-combined per destination node before leaving this actor."""
        outs = [_EMPTY_MSG] * self.n_parts
        if not len(changed_idx):
            return outs
        starts = self.indptr[changed_idx]
        ends = self.indptr[changed_idx + 1]
        deg = ends - starts
        take = np.repeat(starts, deg) + _ranges(deg)
        remote = ~self.nbr_own[take]
        take = take[remote]
        if not len(take):
            return outs
        dst = self.nbrs[take]
        val = np.repeat(self.labels[changed_idx], deg)[remote]
        # min per destination node (associative — safe to pre-combine)
        order = np.argsort(dst, kind="mergesort")
        dst, val = dst[order], val[order]
        first = np.ones(len(dst), dtype=bool)
        first[1:] = dst[1:] != dst[:-1]
        grp = np.cumsum(first) - 1
        vmin = np.full(grp[-1] + 1 if len(grp) else 0, np.iinfo(np.int64).max,
                       dtype=np.int64)
        np.minimum.at(vmin, grp, val)
        udst = dst[first]
        part = _part_of(udst, self.n_parts)
        for p in np.unique(part):
            m = part == p
            outs[p] = np.stack([udst[m], vmin[m]])
        return outs

    def first_round(self):
        """Seed round: candidates are the neighbors' seed labels (their
        ids — known locally even for REMOTE neighbors), then the local
        fixpoint; only remote-facing deltas leave."""
        if not len(self.nodes):
            return (0, *([_EMPTY_MSG] * self.n_parts))
        entry = self.labels.copy()
        # reduceat on an empty slice (isolated node) can't happen: every
        # owned node has >= 1 adjacency row by construction
        cand = np.minimum.reduceat(self.nbrs, self.indptr[:-1])
        self.labels = np.minimum(self.labels, cand)
        self._local_fixpoint()
        changed = np.flatnonzero(self.labels < entry)
        return (len(changed), *self._send(changed))

    def step(self, *inbox):
        """Merge incoming (node, candidate) deltas, run the local
        fixpoint; changed nodes re-send to remote neighbors.  An empty
        inbox still resumes a cap-tripped local fixpoint."""
        msgs = [m for m in inbox if m is not None and m.shape[1]]
        if not msgs and not self._local_pending:
            return (0, *([_EMPTY_MSG] * self.n_parts))
        entry = self.labels.copy()
        if msgs:
            dst = np.concatenate([m[0] for m in msgs])
            val = np.concatenate([m[1] for m in msgs])
            idx = np.searchsorted(self.nodes, dst)
            # every message targets an owned node (senders route by the
            # same hash), so idx is in range and exact
            np.minimum.at(self.labels, idx, val)
        self._local_fixpoint()
        changed = np.flatnonzero(self.labels < entry)
        return (len(changed), *self._send(changed))

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, type=pa.int64()),
                         "label": pa.array(self.labels, type=pa.int64())})


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for the CSR gather (vectorized)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    starts = np.cumsum(counts)[:-1]
    out[starts] = 1 - counts[:-1]
    return np.cumsum(out)


def connected_components(edges, *, a_col: str = "a", b_col: str = "b",
                         n_buckets: int | None = None, max_rounds: int = 50,
                         target_part_bytes: int = 128 << 20):
    """Undirected edge Dataset -> materialized Dataset (node, label); label
    is the minimum node id of the node's component.  Every endpoint of every
    edge appears exactly once.  ``n_buckets`` pins the partition-actor count
    (auto-sized from the materialized edge bytes otherwise).  Raises if
    ``max_rounds`` is hit (graph deeper than expected — raise it for
    adversarial chain shapes)."""
    edges = edges.materialize()
    if edges.count() == 0:  # empty graph: empty (node, label) result,
        return ray.data.from_arrow(pa.table(  # not a schemaless-state crash
            {"node": pa.array([], type=pa.int64()),
             "label": pa.array([], type=pa.int64())}))

    if n_buckets is not None:
        n_parts = int(n_buckets)
    else:
        # 2 directed rows per edge; bound each actor's resident adjacency
        nbytes = 2 * edges.size_bytes()
        n_parts = int(min(256, max(1, -(-nbytes // target_part_bytes))))
    actors = [_CCPartition.remote(p, n_parts) for p in range(n_parts)]

    def push(t: pa.Table) -> pa.Table:
        # edges ship ONCE: each block splits by owner hash and lands in
        # the owning actor; the ack ray.get pins delivery inside this
        # task's lifetime (actors are num_cpus=0, so blocking here cannot
        # deadlock the CPU pool)
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        part = _part_of(node, n_parts)
        acks = []
        for p in np.unique(part):
            m = part == p
            acks.append(actors[p].add_edges.remote(node[m], nbr[m]))
        ray.get(acks)
        return pa.table({"n": pa.array([len(a)], type=pa.int64())})

    # consume the push pipeline (barrier: every edge delivered), then CSR
    pushed = edges.map_batches(push, batch_format="pyarrow")
    pushed.sum("n")
    ray.get([a.finalize.remote() for a in actors])

    nret = n_parts + 1
    outs = [a.first_round.options(num_returns=nret).remote() for a in actors]
    for _rnd in range(max_rounds):
        changed = sum(ray.get([o[0] for o in outs]))
        if changed == 0:
            labels = ray.data.from_arrow_refs(
                [a.result.remote() for a in actors]).materialize()
            for a in actors:
                ray.kill(a)
            return labels
        outs = [a.step.options(num_returns=nret)
                .remote(*[outs[q][1 + p] for q in range(n_parts)])
                for p, a in enumerate(actors)]
    raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
