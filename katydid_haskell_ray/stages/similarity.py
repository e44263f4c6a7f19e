"""Similarity search over embedding columns (list<float>).

- :func:`knn_topk` — brute-force cosine top-k: the query matrix is broadcast
  once via ``ray.put``; each batch does ONE numpy matmul against it and
  emits only its local top-k per query; local top-ks merge on the driver
  (k × queries rows per block — tiny).  No shuffle, no materialization.
- :class:`LSHBucketStage` + :func:`knn_topk_lsh` — the scale path: random-
  hyperplane LSH buckets restrict candidates before the exact rerank.
- :func:`cosine_near_pairs` — exact embedding-cosine near-dup pairs: the
  normalized blocks live once in the Ray object store; scorers map the
  shared blocks zero-copy (refs travel, never a driver matrix) and matmul
  chunk-by-chunk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _sim_concurrency(requested):
    from katydid_haskell_ray.stages.util import auto_concurrency
    return auto_concurrency(requested)


def _embed_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_topk(ds, query_ids, query_vecs: np.ndarray, *, k: int = 10,
             col: str = "embedding", id_col: str = "vec_id",
             concurrency: int | None = None):
    """Brute-force cosine top-k; returns a pandas frame
    (query_id, id, sim, rank) with rank 1..k per query (ties broken by id).

    The normalized query matrix is ``ray.put`` once; each task's
    ``ray.get`` is a zero-copy local object-store hit (broadcast state is
    cheap per TASK — an actor pool here only adds spin-up latency)."""
    import pandas as pd

    q = {"qids": list(query_ids),
         "qmat": _normalize(np.asarray(query_vecs, dtype=np.float32))}
    ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qq = ray.get(ref)
        qids, qmat = qq["qids"], qq["qmat"]
        m = _normalize(_embed_matrix(batch, col))
        sims = m @ qmat.T  # (n, Q)
        ids = np.asarray(batch.column(id_col).to_pylist())
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, Q)
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            rows = top[:, qi]
            out_q.extend([qids[qi]] * len(rows))
            out_id.extend(ids[rows].tolist())
            out_sim.extend(sims[rows, qi].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         id_col: pa.array(out_id),
                         "sim": pa.array(out_sim, type=pa.float64())})

    local = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    local["sim"] = local["sim"].round(6)  # stable across summation orders
    local = local.sort_values(["query_id", "sim", id_col],
                              ascending=[True, False, True])
    out = local.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


class LSHBucketStage:
    """Random-hyperplane signature: b-bit bucket id per row (the IVF/LSH
    scale path — candidates are restricted to matching buckets)."""

    def __init__(self, planes_ref, col: str):
        self.planes = ray.get(planes_ref)  # (b, d) float32
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embed_matrix(batch, self.col)
        bits = (m @ self.planes.T) > 0  # (n, b)
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(bits.shape[1]):
            bucket = (bucket << 1) | bits[:, i]
        return batch.append_column("bucket", pa.array(bucket))


def make_planes(dim: int, nbits: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(nbits, dim)).astype(np.float32)


def knn_topk_lsh(ds, query_ids, query_vecs: np.ndarray, *, k: int = 10,
                 nbits: int = 6, col: str = "embedding", id_col: str = "vec_id",
                 concurrency: int | None = None, probe_hamming: int = 1):
    """Approximate top-k: score only rows whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe)."""
    import pandas as pd

    qmat = _normalize(np.asarray(query_vecs, dtype=np.float32))
    planes = make_planes(qmat.shape[1], nbits)
    planes_ref = ray.put(planes)
    qbits = (qmat @ planes.T) > 0
    qbuckets = np.zeros(len(qmat), dtype=np.int64)
    for i in range(qbits.shape[1]):
        qbuckets = (qbuckets << 1) | qbits[:, i]
    # probe set: buckets within the Hamming radius
    probe: dict[int, list[int]] = {}
    for qi, qb in enumerate(qbuckets):
        cands = {int(qb)}
        if probe_hamming >= 1:
            cands |= {int(qb) ^ (1 << i) for i in range(nbits)}
        if probe_hamming >= 2:
            cands |= {int(qb) ^ (1 << i) ^ (1 << j)
                      for i in range(nbits) for j in range(i + 1, nbits)}
        for c in cands:
            probe.setdefault(c, []).append(qi)

    q = {"qids": list(query_ids), "qmat": qmat}
    qref = ray.put(q)
    probe_ref = ray.put(probe)

    def bucket_score(batch: pa.Table) -> pa.Table:
        planes_b = ray.get(planes_ref)
        qq = ray.get(qref)
        qids, qmat_b = qq["qids"], qq["qmat"]
        probe_b = ray.get(probe_ref)
        m = _normalize(_embed_matrix(batch, col))
        bits = (m @ planes_b.T) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(bits.shape[1]):
            bucket = (bucket << 1) | bits[:, i]
        ids = np.asarray(batch.column(id_col).to_pylist())
        out_q, out_id, out_sim = [], [], []
        for b in np.unique(bucket):
            qis = probe_b.get(int(b))
            if not qis:
                continue
            rows = np.nonzero(bucket == b)[0]
            sims = m[rows] @ qmat_b[qis].T
            for ci, qi in enumerate(qis):
                order = np.argsort(-sims[:, ci])[:k]
                out_q.extend([qids[qi]] * len(order))
                out_id.extend(ids[rows[order]].tolist())
                out_sim.extend(sims[order, ci].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         id_col: pa.array(out_id),
                         "sim": pa.array(out_sim, type=pa.float64())})

    local = ds.map_batches(bucket_score, batch_format="pyarrow").to_pandas()
    local["sim"] = local["sim"].round(6)
    local = local.sort_values(["query_id", "sim", id_col],
                              ascending=[True, False, True])
    out = local.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def train_centroids(ds, *, n_centroids: int = 64, sample: int = 8192,
                    iters: int = 10, col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF, trained on a BOUNDED
    sample (``ds.limit(sample)`` — constant driver memory at any corpus
    size).  Deterministic: the sample is sorted by id (streamed block
    order is not stable run-to-run), init is evenly-spaced sample rows,
    no RNG.  Returns normalized centroids (C, d) float32."""
    samp = (ds.select_columns([id_col, col]).limit(sample).to_pandas()
            .sort_values(id_col))
    m = _normalize(np.stack(samp[col].to_numpy()).astype(np.float32))
    n_centroids = min(n_centroids, len(m))
    cent = m[np.linspace(0, len(m) - 1, n_centroids).astype(np.int64)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_topk_ivf(ds, query_ids, query_vecs: np.ndarray, *, k: int = 10,
                 n_centroids: int = 64, nprobe: int = 8,
                 col: str = "embedding", id_col: str = "vec_id",
                 concurrency: int | None = None,
                 centroids: np.ndarray | None = None):
    """Approximate top-k via an IVF coarse quantizer: each row is assigned
    to its nearest centroid in the same batch pass, and is scored only for
    queries whose ``nprobe`` nearest centroids include that assignment.

    Everything broadcast (centroids + queries + probe lists) is
    O(C·d + Q·d); per batch the work is one assignment matmul plus the
    masked query matmul.  At real scale the assignment would be computed
    once and the table stored partitioned by centroid id so probes prune
    entire partitions at the read (the `partitioning assumption` this
    operator documents); here it recomputes per pass, which costs one
    extra matmul but changes no results."""
    import pandas as pd

    if centroids is None:
        centroids = train_centroids(ds, n_centroids=n_centroids, col=col,
                                    id_col=id_col)
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float32))
    # (Q, nprobe) nearest centroids per query
    qc = qmat @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probe = np.argsort(-qc, axis=1)[:, :nprobe]
    state_ref = ray.put({"centroids": centroids, "qids": list(query_ids),
                         "qmat": qmat, "probe": probe})

    def ivf_score(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        cent, qids = st["centroids"], st["qids"]
        qmat_b, probe_b = st["qmat"], st["probe"]
        m = _normalize(_embed_matrix(batch, col))
        assign = np.argmax(m @ cent.T, axis=1)  # (n,)
        sims = m @ qmat_b.T                     # (n, Q)
        member = np.zeros_like(sims, dtype=bool)
        for qi in range(len(qids)):
            member[:, qi] = np.isin(assign, probe_b[qi])
        sims[~member] = -np.inf
        ids = np.asarray(batch.column(id_col).to_pylist())
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            col_s = sims[:, qi]
            rows = np.nonzero(np.isfinite(col_s))[0]
            if not len(rows):
                continue
            order = rows[np.argsort(-col_s[rows])[:k]]
            out_q.extend([qids[qi]] * len(order))
            out_id.extend(ids[order].tolist())
            out_sim.extend(col_s[order].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         id_col: pa.array(out_id),
                         "sim": pa.array(out_sim, type=pa.float64())})

    local = ds.map_batches(ivf_score, batch_format="pyarrow").to_pandas()
    local["sim"] = local["sim"].round(6)
    local = local.sort_values(["query_id", "sim", id_col],
                              ascending=[True, False, True])
    out = local.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def build_ivf_index(ds, out_dir: str, *, n_centroids: int = 64,
                    col: str = "embedding", id_col: str = "vec_id",
                    centroids: np.ndarray | None = None) -> np.ndarray:
    """Materialize the IVF 'build once, query many' layout: assign every
    row to its nearest coarse centroid and write the table as
    hive-partitioned parquet (``cell=<c>/`` directories) plus the
    centroid matrix — the partitioning assumption knn_topk_ivf documents,
    made real.  Queries then read ONLY their nprobe cell directories:
    the probe prunes whole partitions at the storage layer, so a query
    touches nprobe/C of the corpus bytes.  Output is partitioned
    (resumable / independently rewritable per cell); centroids persist
    alongside so later sessions query without retraining."""
    import os

    if centroids is None:
        centroids = train_centroids(ds, n_centroids=n_centroids, col=col,
                                    id_col=id_col)
    cref = ray.put(centroids)

    def assign(b: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        m = _normalize(_embed_matrix(b, col))
        cell = np.argmax(m @ cent.T, axis=1).astype(np.int32)
        return b.append_column("cell", pa.array(cell))

    (ds.select_columns([id_col, col])
     .map_batches(assign, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["cell"]))
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    return centroids


def knn_topk_ivf_persisted(index_dir: str, query_ids, query_vecs, *,
                           k: int = 10, nprobe: int = 8,
                           col: str = "embedding", id_col: str = "vec_id"):
    """Query a build_ivf_index layout: load the persisted centroids, take
    the UNION of the queries' nprobe cells, and read ONLY those ``cell=``
    directories — partition pruning at the read, the at-scale win the
    in-memory knn_topk_ivf can only simulate.  Scoring masks each row
    (its cell comes back from the hive partition column) to the queries
    probing its cell; results are identical to knn_topk_ivf under the
    same centroids."""
    import os

    import pandas as pd
    from ray.data.datasource.partitioning import (
        Partitioning, PathPartitionFilter)

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float32))
    qc = qmat @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probe = np.argsort(-qc, axis=1)[:, :nprobe]
    cellset = {str(c) for c in set(probe.ravel().tolist())}
    # ONLY the probed cell= partitions are opened: non-matching files are
    # pruned by path before any byte is read (kv.get: the centroids.npy
    # sidecar carries no partition key and must filter out too)
    sub = ray.data.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(
            lambda kv: kv.get("cell") in cellset, style="hive",
            base_dir=index_dir),
        partitioning=Partitioning("hive", base_dir=index_dir))
    state_ref = ray.put({"qids": list(query_ids), "qmat": qmat,
                         "probe": probe})

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        qids, qmat_b, probe_b = st["qids"], st["qmat"], st["probe"]
        m = _normalize(_embed_matrix(batch, col))
        # hive partition values come back as strings
        cell = batch.column("cell").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sims = m @ qmat_b.T
        for qi in range(len(qids)):
            sims[~np.isin(cell, probe_b[qi]), qi] = -np.inf
        ids = np.asarray(batch.column(id_col).to_pylist())
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            col_s = sims[:, qi]
            rows = np.nonzero(np.isfinite(col_s))[0]
            if not len(rows):
                continue
            order = rows[np.argsort(-col_s[rows])[:k]]
            out_q.extend([qids[qi]] * len(order))
            out_id.extend(ids[order].tolist())
            out_sim.extend(col_s[order].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         id_col: pa.array(out_id),
                         "sim": pa.array(out_sim, type=pa.float64())})

    local = sub.map_batches(score, batch_format="pyarrow").to_pandas()
    local["sim"] = local["sim"].round(6)
    local = local.sort_values(["query_id", "sim", id_col],
                              ascending=[True, False, True])
    out = local.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def _iter_chunks(chunk_refs):
    """Stream the packed (id, vec) blocks: ``ray.get`` ONE chunk per
    iteration as a zero-copy object-store view and yield (ids, matrix).
    The view is released when the loop advances, so a scorer's residency
    is a single chunk — the table-sized matrix lives (spillably) in the
    object store, never in every actor's heap."""
    for r in chunk_refs:
        t = ray.get(r)
        if len(t) == 0:
            continue
        vec = t.column("vec")
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        mat = (vec.flatten().to_numpy(zero_copy_only=False)
               .reshape(len(t), -1))
        ids = t.column("id").to_numpy(zero_copy_only=False)
        yield ids, mat


def cosine_near_pairs(ds, *, threshold: float = 0.95, col: str = "embedding",
                      id_col: str = "vec_id", concurrency: int | None = None):
    """All (a, b, sim) pairs with cosine >= threshold, a < b — exact.

    Self-join by object-store broadcast: the projected, pre-normalized
    (id, embedding) blocks are materialized ONCE in the Ray object store and
    only their refs travel; each scorer actor STREAMS the shared blocks —
    ``ray.get`` one chunk per loop iteration (a zero-copy view that is
    evictable once the iteration drops it), so per-actor residency is one
    chunk, not the table, and the object store spills the matrix as needed.
    Exact all-pairs is inherently O(N²/cluster) compute — for web-scale
    tables restrict candidates first (:class:`LSHBucketStage` /
    :func:`knn_topk_lsh`) and accept approximate recall."""
    import pandas as pd

    def pack(b: pa.Table) -> pa.Table:
        m = _normalize(_embed_matrix(b, col))
        return pa.table({
            "id": b.column(id_col).cast(pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), type=pa.float32()), m.shape[1]),
        })

    packed = ds.select_columns([id_col, col]).map_batches(
        pack, batch_format="pyarrow").materialize()
    chunk_refs = packed.to_arrow_refs()

    class PairFinder:
        def __init__(self):
            self.chunk_refs = chunk_refs  # refs only; chunks stream per call

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _embed_matrix(batch, "vec")  # already normalized by pack
            bids = batch.column("id").to_numpy(zero_copy_only=False)
            out_a, out_b, out_s = [], [], []
            for ids, mat in _iter_chunks(self.chunk_refs):
                sims = m @ mat.T
                ri, ci = np.nonzero(sims >= threshold)
                a, bb = bids[ri], ids[ci]
                keep = a < bb
                out_a.append(a[keep])
                out_b.append(bb[keep])
                out_s.append(sims[ri, ci][keep].astype(np.float64))
            a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
            b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
            s = np.concatenate(out_s) if out_s else np.empty(0, np.float64)
            return pa.table({"a": pa.array(a, type=pa.int64()),
                             "b": pa.array(b, type=pa.int64()),
                             "sim": pa.array(np.round(s, 6))})

    out = packed.map_batches(
        PairFinder, batch_format="pyarrow",
        concurrency=_sim_concurrency(concurrency),
        fn_constructor_args=()).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def knn_join(ds, *, k: int = 3, col: str = "embedding",
             id_col: str = "vec_id", concurrency: int | None = None):
    """Exact k-NN JOIN: every vector's top-k cosine neighbors (self
    excluded), ranked by (round(sim, 6) DESC, neighbor id ASC).

    Same object-store self-join shape as :func:`cosine_near_pairs` — the
    normalized blocks materialize once, each scorer streams ONE shared
    chunk at a time (zero-copy view, evictable between iterations; the
    actor never holds the full matrix) keeping k candidates per chunk,
    and the final per-row rank merges chunks*k candidates.  Scoring
    is float64 so the 6-decimal rank quantization agrees with a float64
    oracle.  Exact all-pairs is inherently O(N²/cluster); this operator
    is the ORACLE/verification mode — the 100-TB default is
    :func:`knn_join_ivf` (recall measured against this in tests)."""
    def pack(b: pa.Table) -> pa.Table:
        m = _normalize(_embed_matrix(b, col).astype(np.float64))
        return pa.table({
            "id": b.column(id_col).cast(pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), type=pa.float64()), m.shape[1]),
        })

    packed = ds.select_columns([id_col, col]).map_batches(
        pack, batch_format="pyarrow").materialize()
    chunk_refs = packed.to_arrow_refs()

    class Scorer:
        def __init__(self):
            self.chunk_refs = chunk_refs  # refs only; chunks stream per call

        def __call__(self, batch: pa.Table) -> pa.Table:
            # no float32 round-trip: the packed vecs are float64 and the
            # rank quantization needs full precision (oracle parity)
            vec = batch.column("vec")
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            q = (vec.flatten().to_numpy(zero_copy_only=False)
                 .reshape(len(batch), -1))
            qids = batch.column("id").to_numpy(zero_copy_only=False)
            nq = len(qids)
            cand_s, cand_i = [], []
            for ids, mat in _iter_chunks(self.chunk_refs):
                # id-sorted chunk + STABLE sort below = exact
                # (sim DESC, id ASC) tie-break inside each chunk; the
                # argsort is O(n log n) per chunk — noise next to the
                # matmul — and keeps the streamed view unmodified
                order = np.argsort(ids, kind="stable")
                ids, mat = ids[order], mat[order]
                sims = np.round(q @ mat.T, 6)
                sims[qids[:, None] == ids[None, :]] = -np.inf  # no self
                kk = min(k, sims.shape[1])
                part = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
                cand_s.append(np.take_along_axis(sims, part, axis=1))
                cand_i.append(ids[part])
            s = np.concatenate(cand_s, axis=1)
            i = np.concatenate(cand_i, axis=1)
            nc = s.shape[1]
            rows = np.repeat(np.arange(nq), nc)
            # per row: order by (-sim, neighbor id); first kk are the top-k
            order = np.lexsort((i.ravel(), -s.ravel(), rows))
            kk = min(k, nc)
            top = order.reshape(nq, nc)[:, :kk].ravel()
            keep = ~np.isinf(s.ravel()[top])  # drop self/pad entries
            return pa.table({
                id_col: pa.array(np.repeat(qids, kk)[keep], type=pa.int64()),
                "neighbor": pa.array(i.ravel()[top][keep], type=pa.int64()),
                "rank": pa.array(np.tile(np.arange(1, kk + 1), nq)[keep],
                                 type=pa.int64())})

    return packed.map_batches(
        Scorer, batch_format="pyarrow",
        concurrency=_sim_concurrency(concurrency), fn_constructor_args=())


def knn_join_ivf(ds, *, k: int = 3, n_centroids: int = 64, nprobe: int = 4,
                 col: str = "embedding", id_col: str = "vec_id",
                 n_buckets: int = 64):
    """Approximate k-NN JOIN via IVF bucketing — the scale path for
    :func:`knn_join`'s O(N²) exact compute.

    Every vector plays two roles: DATA in its single nearest-centroid
    bucket, QUERY in its ``nprobe`` nearest buckets.  One bucketed
    exchange colocates each centroid's data and probing queries; the
    per-bucket matmul scores only that cell, and a second tiny exchange
    merges each query's nprobe x k candidates into the final ranks.
    Compute drops from O(N²) to O(N² · nprobe / C); recall depends on the
    quantizer (measured vs the exact join in tests)."""
    import pandas as pd

    from katydid_haskell_ray.stages.exchange import bucket_map_groups

    centroids = train_centroids(ds, n_centroids=n_centroids, col=col,
                                id_col=id_col)
    cent_ref = ray.put(centroids)
    np_eff = min(nprobe, centroids.shape[0])

    def tag(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        m = _normalize(_embed_matrix(batch, col).astype(np.float64))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = m @ cent.T.astype(np.float64)
        probe = np.argsort(-sims, axis=1)[:, :np_eff]  # probe[:,0] = own cell
        n, d = m.shape
        rows = {
            id_col: np.tile(ids, np_eff),
            "__bucket": probe.T.ravel().astype(np.int32),
            "role": np.repeat(np.arange(np_eff, dtype=np.int8) != 0,
                              n).astype(np.int8),  # 0=data+query, 1=query
        }
        vec = np.tile(m, (np_eff, 1))
        t = pa.table({**{kk: pa.array(v) for kk, v in rows.items()},
                      "vec": pa.FixedSizeListArray.from_arrays(
                          pa.array(vec.ravel(), type=pa.float64()), d)})
        return t

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: [], "neighbor": [], "sim": []})
        ids = g[id_col].to_numpy()
        m = np.stack(g["vec"].to_numpy()).astype(np.float64)
        data_mask = g["role"].to_numpy() == 0
        dm, dids = m[data_mask], ids[data_mask]
        if not len(dm):
            return pd.DataFrame({id_col: [], "neighbor": [], "sim": []})
        dorder = np.argsort(dids, kind="stable")  # (sim DESC, id ASC) ties
        dm, dids = dm[dorder], dids[dorder]
        sims = np.round(m @ dm.T, 6)
        sims[ids[:, None] == dids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        s = np.take_along_axis(sims, part, axis=1).ravel()
        out = pd.DataFrame({id_col: np.repeat(ids, kk),
                            "neighbor": dids[part].ravel(), "sim": s})
        return out[np.isfinite(out["sim"])]

    cand = bucket_map_groups(
        ds.select_columns([id_col, col]).map_batches(
            tag, batch_format="pyarrow"),
        per_cell, n_buckets=max(n_buckets, n_centroids))

    def qbucket(t: pa.Table) -> pa.Table:
        # full-range hash: the candidate stream is N x nprobe x k rows
        # (grows with the corpus), so its merge exchange auto-sizes
        h = (t.column(id_col).to_numpy(zero_copy_only=False)
             .astype(np.int64).view(np.uint64))
        return t.append_column("__bucket", pa.array(h))

    def merge_query(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .drop_duplicates([id_col, "neighbor"])
             .sort_values([id_col, "sim", "neighbor"],
                          ascending=[True, False, True]))
        out = g.groupby(id_col, sort=False).head(k).copy()
        out["rank"] = (out.groupby(id_col, sort=False).cumcount() + 1
                       ).astype(np.int64)
        return out[[id_col, "neighbor", "rank"]]

    from katydid_haskell_ray.stages.exchange import resolve_exchange
    qmat, qnb, qmax = resolve_exchange(
        cand.map_batches(qbucket, batch_format="pyarrow"))
    return bucket_map_groups(qmat, merge_query, n_buckets=qnb,
                             modular=True, max_bucket_bytes=qmax)
