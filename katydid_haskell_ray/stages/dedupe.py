"""Deduplication operators over document tables (exact + near-dup).

The reference has no dedup (SURVEY.md §2.6); these are the training-data-
pipeline additions, all built Ray-Data-first:

- exact            hash-partition + per-group first (one shuffle of tiny
                   (hash, id) pairs — the text itself never shuffles)
- minhash-LSH      shingle -> minhash -> banded LSH buckets -> groupby ->
                   candidate pairs -> exact-Jaccard verify -> union-find
- simhash          64-bit fingerprints + Hamming-radius candidate buckets
- ngram-jaccard    brute-force verifier (test oracle for the LSH path)
- embedding-cosine near-dup pairs over an embedding column

Scale notes: every shuffle ships only (key, hash/signature) projections;
signatures are fixed-width and computed by ONE batched kernel per block
(flattened shingle hashes + offsets, sketches.signature_many).  The LSH
tail is fully distributed: candidate texts reach the verify stage through a
Bloom-filtered partitioned hash join (never a driver dict), components come
from iterative min-label propagation (stages/components.py, bucketed
groupby rounds — no driver union-find), and the kept set is a distributed
anti-join of ids against cluster non-representatives.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from katydid_haskell_ray.state import sketches as SK


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, col: str = "text",
                     out: str = "content_hash") -> pa.Table:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = SK.hash64_array(arr.fill_null("\x00null"))
    return batch.append_column(out, pa.array(h.view(np.int64)))


def exact_dedupe(ds, col: str = "text", id_col: str = "doc_id",
                 n_buckets: int | None = None):
    """Keep the first (min id) row per distinct content hash.

    Equality is by 64-bit content hash (collision odds ~n²/2⁶⁵ — negligible
    at any real scale; use a 128-bit hash if that ever matters).  Shuffles
    only per-batch (hash, min id) partials through the coarse-bucket
    exchange — the payload column is dropped before the exchange and
    survivors are identified by id.  The partial stream grows with
    distinct content, so the bucket count is data-derived."""
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)

    def partial(b: pa.Table) -> pa.Table:
        t = add_content_hash(b, col).select([id_col, "content_hash"])
        df = t.to_pandas().groupby("content_hash", as_index=False)[id_col].min()
        return pa.Table.from_pandas(
            df.assign(__bucket=df["content_hash"].to_numpy().view(np.uint64)),
            preserve_index=False)

    hashed = ds.map_batches(partial, batch_format="pyarrow")
    mat, nb, max_b = resolve_exchange(hashed, n_buckets)
    keep = bucket_map_groups(
        mat, lambda g: g.groupby("content_hash", as_index=False)[id_col].min(),
        n_buckets=nb, modular=True, max_bucket_bytes=max_b)
    return keep.select_columns([id_col])


def dup_group_sizes(ds, col: str = "text", n_buckets: int | None = None):
    """(content_hash, n_copies) for groups with more than one row —
    per-batch count partials through the coarse-bucket exchange
    (data-derived bucket count: the distinct-hash stream grows)."""
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)

    def partial(b: pa.Table) -> pa.Table:
        t = add_content_hash(b, col).select(["content_hash"])
        df = (t.to_pandas().groupby("content_hash", as_index=False)
              .size().rename(columns={"size": "cnt"}))
        return pa.Table.from_pandas(
            df.assign(__bucket=df["content_hash"].to_numpy().view(np.uint64)),
            preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("content_hash", as_index=False)["cnt"].sum()
        return (s[s["cnt"] > 1]
                .rename(columns={"cnt": "n_copies"}))

    bucketed = ds.map_batches(partial, batch_format="pyarrow")
    mat, nb, max_b = resolve_exchange(bucketed, n_buckets)
    return bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b)


# ---------------------------------------------------------------------------
# shingling + minhash LSH
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\S+")


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (k-grams of whitespace tokens): tokens
    hash individually, windows combine via the order-sensitive polynomial
    kernel (sketches.window_poly) — hashing grams as joined strings would
    re-hash every token k times.  Short docs (0 < n < k) collapse to one
    whole-doc shingle, empty docs to none."""
    toks = _WORD_RE.findall(text or "")
    if not toks:
        return np.empty(0, np.uint64)
    return SK.window_poly(SK.hash64_array(np.array(toks, dtype=object)), k)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def flat_shingle_hashes(texts, k: int = 3):
    """All docs' word-k-shingle hashes concatenated + (n_docs+1) offsets.

    Shingle values match :func:`word_shingles` exactly (shared window
    kernel over per-token hashes); the whole batch goes through ONE
    hash64_array call and ONE vectorized window pass — no per-gram Python
    string building."""
    toks_all: list[str] = []
    tok_offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks_all.extend(_WORD_RE.findall(t or ""))
        tok_offsets[i + 1] = len(toks_all)
    flat_tok = (SK.hash64_array(np.array(toks_all, dtype=object))
                if toks_all else np.empty(0, np.uint64))
    return SK.window_poly_flat(flat_tok, tok_offsets, k)


def lsh_band_rows(batch: pa.Table, *, bands: int, rows_per_band: int,
                  id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band, band_hash, id) rows for the bucket
    groupby — the shuffle payload is 3 small columns."""
    sig = batch.column("minhash")
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    n = len(sig)
    k = bands * rows_per_band
    flat = sig.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)[:, :k]
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    band_hashes = np.concatenate([
        pd.util.hash_pandas_object(
            pd.DataFrame(flat[:, b * rows_per_band:(b + 1) * rows_per_band]),
            index=False).to_numpy().view(np.int64)
        for b in range(bands)]) if n else np.empty(0, np.int64)
    return pa.table({"band": pa.array(np.repeat(
                         np.arange(bands, dtype=np.int32), n)),
                     "band_hash": pa.array(band_hashes, type=pa.int64()),
                     id_col: pa.array(np.tile(ids, bands))})


def _auto_concurrency(requested):
    from katydid_haskell_ray.stages.util import auto_concurrency
    return auto_concurrency(requested)


def _jaccard_flat(texts_a, texts_b, shingle: int):
    """(intersection, union) set sizes for aligned text pairs,
    batch-vectorized: each side's shingles come from ONE
    flat_shingle_hashes call; per-pair work is a sorted-array intersect
    (np.intersect1d), never re-tokenizing."""
    fa, oa = flat_shingle_hashes(texts_a, shingle)
    fb, ob = flat_shingle_hashes(texts_b, shingle)
    n = len(texts_a)
    inter = np.empty(n, dtype=np.int64)
    un = np.empty(n, dtype=np.int64)
    for i in range(n):
        sa = np.unique(fa[oa[i]:oa[i + 1]])
        sb = np.unique(fb[ob[i]:ob[i + 1]])
        c = np.intersect1d(sa, sb, assume_unique=True).size
        inter[i] = c
        un[i] = sa.size + sb.size - c
    return inter, un


def _verify_jaccard_flat(texts_a, texts_b, shingle: int, threshold: float):
    """Exact-Jaccard verify for aligned text pairs -> bool keep mask."""
    inter, un = _jaccard_flat(texts_a, texts_b, shingle)
    # same division form as the SQL oracle (inter*1.0/un >= t): float
    # division on both sides keeps ulp-edge verdicts identical
    return (un == 0) | (inter / np.maximum(un, 1) >= threshold)


def _smalltail_cluster(pair_refs, doc_refs, *, id_col, col, shingle,
                       threshold):
    """Verify + connected components for a dup-density-bounded tail, inside
    ONE Ray task (not the driver): dedup candidate pairs, exact-Jaccard
    verify against the Bloom-filtered candidate texts, union-find with path
    compression.  Returns (clusters_table, drop_table)."""
    import ray

    # empty pandas-born blocks carry a degenerate schema — drop them
    ptabs = [t for t in ray.get(list(pair_refs)) if t.num_rows]
    dtabs = [t for t in ray.get(list(doc_refs)) if t.num_rows]
    pairs = pa.concat_tables(ptabs)
    docs = pa.concat_tables(dtabs)
    pdf = (pd.DataFrame({"a": pairs.column("a").to_numpy(zero_copy_only=False),
                         "b": pairs.column("b").to_numpy(zero_copy_only=False)})
           .drop_duplicates())
    text_of = dict(zip(docs.column(id_col).to_pylist(),
                       docs.column(col).to_pylist()))
    ta = [text_of[x] for x in pdf["a"]]
    tb = [text_of[x] for x in pdf["b"]]
    keep = _verify_jaccard_flat(ta, tb, shingle, threshold)
    edges = pdf[keep]

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(edges["a"], edges["b"]):
        rx, ry = find(x), find(y)
        if rx != ry:
            # min-root union keeps label = min id of the component
            parent[max(rx, ry)] = min(rx, ry)
    nodes = np.unique(np.concatenate([edges["a"].to_numpy(),
                                      edges["b"].to_numpy()])
                      if len(edges) else np.empty(0, np.int64))
    labels = np.array([find(x) for x in nodes], dtype=np.int64)
    clusters = pa.table({"id": pa.array(nodes, type=pa.int64()),
                         "cluster": pa.array(labels, type=pa.int64())})
    drop = pa.table({id_col: pa.array(nodes[nodes != labels],
                                      type=pa.int64())})
    return clusters, drop


def minhash_dedupe(ds, *, col: str = "text", id_col: str = "doc_id",
                   k: int = 128, bands: int = 32, shingle: int = 3,
                   threshold: float = 0.8, concurrency: int | None = None,
                   n_buckets: int | None = None,
                   small_tail_max_bytes: int = 256 << 20,
                   small_tail_max_pairs: int = 2_000_000,
                   kept: bool = True):
    """Full MinHash-LSH near-dup pipeline; returns (clusters_df, kept_ds).

    ``kept=False`` skips the kept-set anti-join and returns
    (clusters_df, None) — callers that only want clusters shouldn't pay
    for an exchange they never consume.

    clusters_df: pandas (id, cluster) for every doc in a near-dup cluster of
    size >= 2, cluster = min id of the cluster (bounded by duplicate
    density).  kept_ds: Dataset of ids surviving dedup (cluster
    representatives + singletons), computed by distributed anti-join — the
    full id set never lands on the driver.

    The corpus-proportional stages (signatures, banding, the LSH bucket
    exchange, the Bloom-filtered candidate projection, the kept-set
    anti-join) are always distributed.  The TAIL — verify + connected
    components — is proportional to duplicate density, not corpus size, so
    it is size-adaptive, the same regime switch as broadcast-vs-shuffle
    joins:

    - small tail (candidate texts < ``small_tail_max_bytes`` AND pairs <
      ``small_tail_max_pairs``): one Ray task does vectorized verify +
      union-find.  Never the driver, and never more than the Bloom-filtered
      candidates in one heap.
    - large tail: candidate pairs are Jaccard-verified in map_batches after
      a partitioned hash join brings the two texts to each pair, and
      components come from iterative min-label propagation
      (stages/components.py) — everything stays sharded.
    """
    import pickle

    import ray
    import ray.data

    from katydid_haskell_ray.state.reduce import tree_reduce
    from katydid_haskell_ray.stages.components import connected_components
    from katydid_haskell_ray.stages.join import hash_join

    rows_per_band = k // bands
    # signature state (2 x k uint64 permutation params) is tiny — a plain
    # task closure beats an actor pool here (no pool spin-up latency);
    # stages whose state is heavy (models, compiled grammars, Bloom sets)
    # stay actor pools
    mh = SK.MinHasher(k=k)

    def sig_stage(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pylist()
        flat, offsets = flat_shingle_hashes(texts, shingle)
        sigs = mh.signature_many(flat, offsets).astype(np.int64)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), type=pa.int64()), mh.k)
        return batch.append_column("minhash", sig_arr)

    sigged = ds.map_batches(sig_stage, batch_format="pyarrow")
    band_ds = sigged.map_batches(
        lambda b: lsh_band_rows(b, bands=bands, rows_per_band=rows_per_band,
                                id_col=id_col),
        batch_format="pyarrow")

    # grouping on (band, band_hash) directly would create ~n*bands mostly-
    # singleton groups (per-group overhead dominates); exchange on a COARSE
    # bucket of the band hash and pair up within buckets using vectorized
    # pandas — same exchange volume, C-speed reduce.  The band stream is
    # n x bands rows (grows with the corpus), so the bucket count is
    # data-derived (resolve_exchange).
    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("band_hash").to_numpy(zero_copy_only=False)
             .view(np.uint64))
        return t.append_column("bucket", pa.array(b))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # anchor pairing (min id vs rest) per LSH bucket keeps candidates
        # linear in bucket size; transitive links come from other bands +
        # the components pass
        g = g.sort_values(["band", "band_hash", id_col])
        first = g.groupby(["band", "band_hash"])[id_col].transform("first")
        hits = g[g[id_col] != first]
        return pd.DataFrame({"a": first[g[id_col] != first].to_numpy(),
                             "b": hits[id_col].to_numpy()}
                            ).drop_duplicates()

    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    band_mat, band_nb, band_max = resolve_exchange(
        band_ds.map_batches(add_bucket, batch_format="pyarrow"))
    cand = bucket_map_groups(
        band_mat, bucket_pairs, n_buckets=band_nb, bucket_col="bucket",
        modular=True, max_bucket_bytes=band_max).materialize()
    ids_ds = ds.map_batches(lambda t: t.select([id_col]),
                            batch_format="pyarrow")
    n_pairs = cand.count()
    if n_pairs == 0:
        clusters = pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                                 "cluster": pd.Series([], dtype=np.int64)})
        return clusters, ids_ds

    # Bloom of candidate ids, built from per-block partials merged tree-wise
    # (fixed-size state; the id list itself never aggregates anywhere) —
    # built from the pre-dedup pair stream, so the pair-dedup exchange only
    # runs on the large-tail path
    def bloom_partial(t: pa.Table) -> pa.Table:
        bl = SK.Bloom(max(1024, 2 * n_pairs), 1e-3)
        bl.add_hashes(SK.hash64_array(t.column("a")))
        bl.add_hashes(SK.hash64_array(t.column("b")))
        return pa.table({"blob": pa.array([pickle.dumps(bl, protocol=5)],
                                          type=pa.binary())})

    blooms = [pickle.loads(r["blob"]) for r in
              cand.map_batches(bloom_partial,
                               batch_format="pyarrow").take_all()]
    bloom_ref = ray.put(tree_reduce(blooms, lambda x, y: x.merge(y)))

    def cand_texts(t: pa.Table) -> pa.Table:
        # Bloom-restricted projection: only candidate rows' (id, text)
        # continue into the joins (false positives just join away); the
        # per-task ray.get is a zero-copy local object-store hit
        bloom = ray.get(bloom_ref)
        m = bloom.contains_hashes(SK.hash64_array(t.column(id_col)))
        return t.select([id_col, col]).filter(pa.array(m))

    cand_docs = ds.map_batches(cand_texts,
                               batch_format="pyarrow").materialize()

    if (cand_docs.size_bytes() < small_tail_max_bytes
            and n_pairs < small_tail_max_pairs):
        # small tail: verify + components in ONE Ray task (latency: the
        # distributed tail is ~8 sequential shuffle jobs, pure fixed cost
        # when the candidate set is tiny)
        clusters_tab, drop_tab = ray.get(
            ray.remote(_smalltail_cluster).remote(
                cand.to_arrow_refs(), cand_docs.to_arrow_refs(),
                id_col=id_col, col=col, shingle=shingle,
                threshold=threshold))
        clusters = clusters_tab.to_pandas().sort_values("id").reset_index(drop=True)
        if not kept:
            return clusters, None
        if drop_tab.num_rows == 0:
            return clusters, ids_ds
        drop_ds = ray.data.from_arrow(drop_tab)
        kept_ds = hash_join(ids_ds, drop_ds, key=id_col, left_cols=[],
                            right_cols=[], n_buckets=n_buckets,
                            how="left_anti")
        return clusters, kept_ds

    # ----- large tail: everything below stays sharded -----

    # the same (a, b) pair can surface from bands whose rows landed in
    # DIFFERENT coarse buckets: dedupe pairs with a bucketed exchange keyed
    # on the pair itself
    def pair_bucket(t: pa.Table) -> pa.Table:
        h = (SK.hash64_array(t.column("a")) ^ SK.hash64_array(t.column("b")))
        return t.append_column("bucket", pa.array(h))

    pmat, pnb, pmax = resolve_exchange(
        cand.map_batches(pair_bucket, batch_format="pyarrow"))
    pairs = bucket_map_groups(
        pmat, lambda g: g[["a", "b"]].drop_duplicates(),
        n_buckets=pnb, bucket_col="bucket", modular=True,
        max_bucket_bytes=pmax).materialize()

    # hash-join each pair to its two texts (pairs and candidate texts only —
    # non-candidate payload never enters an exchange)
    p1 = pairs.map_batches(
        lambda t: pa.table({id_col: t.column("a"), "b": t.column("b")}),
        batch_format="pyarrow")
    # materialize between the two joins: chaining two groupby exchanges into
    # one streaming job can wedge the pull-based shuffle scheduler at small
    # CPU counts, and the intermediate is pair-sized anyway
    j1 = hash_join(p1, cand_docs, key=id_col, left_cols=["b"],
                   right_cols=[col], n_buckets=n_buckets).materialize()
    p2 = j1.map_batches(
        lambda t: pa.table({"a": t.column(id_col), id_col: t.column("b"),
                            "text_a": t.column(col)}),
        batch_format="pyarrow")
    j2 = hash_join(p2, cand_docs, key=id_col, left_cols=["a", "text_a"],
                   right_cols=[col], n_buckets=n_buckets)

    def verify(t: pa.Table) -> pa.Table:
        keep = _verify_jaccard_flat(t.column("text_a").to_pylist(),
                                    t.column(col).to_pylist(),
                                    shingle, threshold)
        return pa.table({"a": t.column("a").filter(pa.array(keep)),
                         "b": t.column(id_col).filter(pa.array(keep))})

    edges = j2.map_batches(verify, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        clusters = pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                                 "cluster": pd.Series([], dtype=np.int64)})
        return clusters, ids_ds

    # components by min-label propagation; every labeled node has >= 1
    # verified edge, so every component has size >= 2 by construction
    labels = connected_components(edges, n_buckets=n_buckets)
    clusters = (labels.to_pandas()
                .rename(columns={"node": "id", "label": "cluster"})
                .astype({"id": np.int64, "cluster": np.int64})
                .sort_values("id").reset_index(drop=True))

    if not kept:
        return clusters, None
    # kept = ids minus cluster non-representatives, as a distributed
    # anti-join (no driver id set)
    drop_ds = labels.filter(expr="node != label").map_batches(
        lambda t: pa.table({id_col: t.column("node")}), batch_format="pyarrow")
    kept_ds = hash_join(ids_ds, drop_ds, key=id_col, left_cols=[],
                        right_cols=[], n_buckets=n_buckets, how="left_anti")
    return clusters, kept_ds


# Peak pair-rows a posting self-merge may materialize at once (the
# hot-shingle memory bound; ~40 B/row -> ~160 MB per slab).  Tests shrink
# it to force the chunked path.
MERGE_CHUNK_PAIRS = 4_000_000


def _self_merge_chunked(g: pd.DataFrame, consume, *,
                        max_pairs: int | None = None) -> pd.DataFrame:
    """Self-merge ``g`` on its ``sh`` column in slabs whose merged output
    is bounded by ~``max_pairs`` rows, feeding each slab through
    ``consume`` (filter / partial-reduce) immediately.

    Equivalent to ``consume(g.merge(g, on="sh"))`` for slab-insensitive
    consumers (filters and per-pair partial counts are: a pair meets a
    given shingle in exactly one slab), but a globally frequent shingle —
    posting length p -> p² merge rows — can no longer materialize an
    unbounded frame inside one reduce task: small shingle groups pack
    into slabs of Σp² <= max_pairs, and an oversized group left-chunks
    against itself (c·p <= max_pairs per step).  Peak memory is the slab,
    not the full quadratic output."""
    if max_pairs is None:
        max_pairs = MERGE_CHUNK_PAIRS
    g = g.sort_values("sh", kind="mergesort", ignore_index=True)
    sh = g["sh"].to_numpy()
    n = len(sh)
    if n == 0:
        return consume(g.merge(g, on="sh"))
    bounds = np.r_[np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]]), n]
    outs = []
    i, ngroups = 0, len(bounds) - 1
    while i < ngroups:
        p = int(bounds[i + 1] - bounds[i])
        if p * p > max_pairs:
            grp = g.iloc[bounds[i]:bounds[i + 1]]
            c = max(1, max_pairs // p)
            for s in range(0, p, c):
                outs.append(consume(grp.iloc[s:s + c].merge(grp, on="sh")))
            i += 1
            continue
        j, tot = i, 0
        while j < ngroups:
            pj = int(bounds[j + 1] - bounds[j])
            if tot + pj * pj > max_pairs and j > i:
                break
            tot += pj * pj
            j += 1
        slab = g.iloc[bounds[i]:bounds[j]]
        outs.append(consume(slab.merge(slab, on="sh")))
        i = j
    return (pd.concat(outs, ignore_index=True) if len(outs) > 1
            else outs[0])


def jaccard_near_pairs(ds, *, threshold: float = 0.5, col: str = "text",
                       id_col: str = "doc_id", shingle: int = 3,
                       hot_df: int | None = None):
    """EXACT n-gram-Jaccard near-dup pairs (a < b, J >= threshold) with
    the score as ``j_micro = floor(1e6 * |A∩B| / |A∪B|)``.

    MinHash-LSH (minhash_dedupe) is the probabilistic path; this is the
    exact one, made sub-quadratic by PPJoin-style PREFIX FILTERING: under
    ANY global total order on shingles, two sets with J >= t must share
    at least one shingle among each set's first
    ``|X| - ceil(t*|X|) + 1`` shingles (J >= t ⟹ |A∩B| >= ceil(t·|X|)
    for both X; two sets with overlap >= α always collide within their
    (|X|-α+1)-prefixes).  The order used here is **(document frequency
    class, hash)**: a cheap per-shingle DF pass over the already-
    materialized full postings finds globally frequent shingles, which
    then sort LAST — so a stop-word shingle sits in a prefix only for
    docs consisting almost entirely of hot shingles, and its stage-1
    posting list stays short.  Exactness is order-independent, so the
    hot set is a pure performance knob (``hot_df`` defaults to 64 —
    corpus-size-independent, so no count pass — hot set capped at 65536
    driver-side rows).

    Candidates are exact-verified by COUNTING: a second posting exchange
    over the FULL shingle sets — restricted to candidate DOCS by a Bloom
    built from per-block partials (false positives only add rows that
    count to nothing) — sums per-pair co-occurrences (each common
    shingle lives in exactly one bucket, so the counts sum exactly), and
    since posting rows carry each doc's set size,
    J = inter / (|A| + |B| - inter) falls out of a C-speed merge+groupby
    — no text joins, no per-pair Python.  Pair-Bloom false positives
    only admit extra pairs into the exact computation; any pair passing
    the threshold is a true prefix candidate anyway, so the output is
    exact regardless.  A size filter (t·|A| <= |B| <= |A|/t) prunes
    candidates before the Bloom.

    Memory discipline: all exchanges derive their bucket counts from
    data size, and BOTH posting self-merges run through
    :func:`_self_merge_chunked`, so one hot shingle can never
    materialize its quadratic pair frame inside a reduce task."""
    import pickle

    import ray

    from katydid_haskell_ray.state.reduce import tree_reduce
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)

    def _postings(batch: pa.Table) -> pa.Table:
        """Distinct (shingle, doc, set-size) rows — the ONE shingling
        pass; prefixes re-derive from these rows downstream."""
        texts = batch.column(col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat, offsets = flat_shingle_hashes(texts, shingle)
        row = np.repeat(np.arange(len(texts)), np.diff(offsets))
        df = pd.DataFrame({"r": row, "h": flat.view(np.int64)}) \
            .drop_duplicates().sort_values(["r", "h"], kind="mergesort")
        sizes = df.groupby("r")["h"].transform("size").to_numpy()
        return pa.table({
            "sh": pa.array(df["h"].to_numpy(), type=pa.int64()),
            id_col: pa.array(ids[df["r"].to_numpy()], type=pa.int64()),
            "sz": pa.array(sizes, type=pa.int64()),
            # the shingle hash IS the full-range bucket hash
            "__bucket": pa.array(df["h"].to_numpy().view(np.uint64))})

    def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # order-sensitive combine (a < b always) — a plain xor would
        # collide (a,b) with (b,a) and waste Bloom bits
        return (SK.hash64_array(a) * np.uint64(0x9E3779B97F4A7C15)
                ^ SK.hash64_array(b))

    # ---- stage 0: full postings (stage-2 input + DF source) + hot set ----
    full = ds.select_columns([id_col, col]).map_batches(
        _postings, batch_format="pyarrow")
    fmat = full.materialize()
    if hot_df is None:
        # pure perf knob (ordering only): any shingle in >= hot_df docs
        # sorts last; the hottest 65536 suffice, so no corpus count needed
        hot_df = 64

    def df_partial(t: pa.Table) -> pa.Table:
        # BOUNDED per-block partial: the top-256 locally-REPEATING
        # shingles by in-block document frequency.  A truly hot shingle
        # (the stop-word case this pass exists for) repeats inside
        # essentially every block, so it tops these partials; one spread
        # so thin it never repeats locally has per-bucket posting lists
        # bounded by the block count and is harmless — the chunked merge
        # is the hard memory bound either way.  Bounded partials are
        # DRIVER-reduced (blocks x 256 rows), never shuffled: an exact
        # DF exchange here would double the pipeline's shuffle volume
        # for a pure ordering knob.
        arr = t.column("sh")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.value_counts()
        cnt = vc.field("counts").cast(pa.int64())
        keep = pa.compute.greater_equal(cnt, 2)
        part = pa.table({"sh": vc.field("values").filter(keep),
                         "cnt": cnt.filter(keep)})
        if part.num_rows > 256:
            order = pa.compute.sort_indices(
                part, sort_keys=[("cnt", "descending")])
            part = part.take(order[:256])
        return part

    hot_parts = fmat.map_batches(df_partial,
                                 batch_format="pyarrow").to_pandas()
    hot_sum = (hot_parts.groupby("sh", as_index=False)["cnt"].sum()
               if len(hot_parts) else pd.DataFrame(columns=["sh", "cnt"]))
    # the local >=2 / top-256 prefilter undercounts: halve the global
    # threshold to stay conservative (ordering knob — exactness never
    # depends on the hot set)
    hot_sum = hot_sum[hot_sum["cnt"] >= max(2, hot_df // 2)]
    hot_sh = (hot_sum.nlargest(65536, "cnt")["sh"].to_numpy()
              if len(hot_sum) else np.empty(0, np.int64))
    hot_ref = ray.put(np.sort(hot_sh.astype(np.int64)))

    # ---- stage 1: prefix postings -> size-filtered candidate pairs ----
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        def consume(m: pd.DataFrame) -> pd.DataFrame:
            a = m[f"{id_col}_x"].to_numpy()
            b = m[f"{id_col}_y"].to_numpy()
            sa = m["sz_x"].to_numpy()
            sb = m["sz_y"].to_numpy()
            # size filter: J >= t forces t*|A| <= |B| <= |A|/t
            keep = (a < b) & (sb >= threshold * sa) & (sa >= threshold * sb)
            return pd.DataFrame({"a": a[keep], "b": b[keep]})
        return _self_merge_chunked(g[["sh", id_col, "sz"]], consume) \
            .drop_duplicates()

    def prefix_from_postings(t: pa.Table) -> pa.Table:
        # prefixes derive from the ALREADY-materialized postings — no
        # second read/tokenize/shingle pass over the corpus.  plen uses
        # the TRUE per-doc set size carried in ``sz``, so if Ray ever
        # splits a doc's posting rows across blocks, each block keeps its
        # local (is_hot, hash)-smallest plen rows — a SUPERSET of the
        # true prefix (fewer elements can precede a true-prefix element
        # locally than globally), and extra candidates only cost work,
        # never correctness.
        hot = ray.get(hot_ref)
        df = pd.DataFrame({
            "sh": t.column("sh").to_numpy(zero_copy_only=False),
            id_col: t.column(id_col).to_numpy(zero_copy_only=False),
            "sz": t.column("sz").to_numpy(zero_copy_only=False)})
        if len(hot):
            idx = np.searchsorted(hot, df["sh"].to_numpy())
            df["hot"] = (idx < len(hot)) & \
                (hot[np.minimum(idx, len(hot) - 1)] == df["sh"].to_numpy())
        else:
            df["hot"] = False
        df = df.sort_values([id_col, "hot", "sh"], kind="mergesort")
        rank = df.groupby(id_col).cumcount().to_numpy()
        sz = df["sz"].to_numpy()
        plen = sz - np.ceil(threshold * sz).astype(np.int64) + 1
        df = df[rank < plen]
        return pa.table({
            "sh": pa.array(df["sh"].to_numpy(), type=pa.int64()),
            id_col: pa.array(df[id_col].to_numpy(), type=pa.int64()),
            "sz": pa.array(df["sz"].to_numpy(), type=pa.int64()),
            "__bucket": pa.array(df["sh"].to_numpy().view(np.uint64))})

    prefixed = fmat.map_batches(prefix_from_postings, batch_format="pyarrow")
    mat, nb, max_b = resolve_exchange(prefixed)
    cand = bucket_map_groups(mat, bucket_pairs, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b).materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "j_micro": pa.array([], type=pa.int64())}))

    # Blooms of candidate pair keys AND candidate doc ids, per-block
    # partials merged tree-wise (fixed-size state)
    def bloom_partial(t: pa.Table) -> pa.Table:
        bl = SK.Bloom(max(1024, 2 * n_pairs), 1e-3)
        bl.add_hashes(_pair_key(t.column("a"), t.column("b")))
        dbl = SK.Bloom(max(1024, 2 * n_pairs), 1e-3)
        dbl.add_hashes(SK.hash64_array(t.column("a")))
        dbl.add_hashes(SK.hash64_array(t.column("b")))
        return pa.table({"blob": pa.array(
            [pickle.dumps((bl, dbl), protocol=5)], type=pa.binary())})

    parts = [pickle.loads(r["blob"]) for r in
             cand.map_batches(bloom_partial,
                              batch_format="pyarrow").take_all()]
    pair_bloom, doc_bloom = tree_reduce(
        parts, lambda x, y: (x[0].merge(y[0]), x[1].merge(y[1])))
    bloom_ref = ray.put(pair_bloom)
    doc_bloom_ref = ray.put(doc_bloom)

    # ---- stage 2: candidate-doc FULL postings -> per-pair counts ----
    def cand_postings(t: pa.Table) -> pa.Table:
        # Bloom-restricted projection: only candidate docs' postings enter
        # the counting exchange (false positives just count to nothing) —
        # a hot shingle's stage-2 posting list is bounded by the number of
        # CANDIDATE docs containing it, not the corpus
        dbl = ray.get(doc_bloom_ref)
        m = dbl.contains_hashes(SK.hash64_array(t.column(id_col)))
        return t.filter(pa.array(m))

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        bloom = ray.get(bloom_ref)

        def consume(m: pd.DataFrame) -> pd.DataFrame:
            a = m[f"{id_col}_x"].to_numpy()
            b = m[f"{id_col}_y"].to_numpy()
            keep = a < b
            a, b = a[keep], b[keep]
            sa = m["sz_x"].to_numpy()[keep]
            sb = m["sz_y"].to_numpy()[keep]
            hit = bloom.contains_hashes(_pair_key(a, b))
            d = pd.DataFrame({"a": a[hit], "b": b[hit],
                              "sa": sa[hit], "sb": sb[hit]})
            # partial counts: stage 3 sums per pair, so slab partials
            # need no intra-task re-aggregation
            return (d.groupby(["a", "b", "sa", "sb"], as_index=False)
                    .size().rename(columns={"size": "inter"}))
        return _self_merge_chunked(g[["sh", id_col, "sz"]], consume)

    filt = fmat.map_batches(cand_postings, batch_format="pyarrow")
    mat2, nb2, max_b2 = resolve_exchange(filt)
    counted = bucket_map_groups(mat2, count_pairs, n_buckets=nb2,
                                modular=True, max_bucket_bytes=max_b2)

    # ---- stage 3: pair-keyed sum of counts -> exact J ----
    def pair_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", pa.array(_pair_key(t.column("a"), t.column("b"))))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["a", "b", "sa", "sb"], as_index=False)["inter"]
             .sum())
        inter = s["inter"].to_numpy()
        un = s["sa"].to_numpy() + s["sb"].to_numpy() - inter
        safe = np.maximum(un, 1)
        # oracle division form; un == 0 (both empty) excluded on BOTH
        # sides (SQL filters un > 0)
        keep = (un > 0) & (inter / safe >= threshold)
        out = s[keep]
        return pd.DataFrame({
            "a": out["a"].to_numpy(),
            "b": out["b"].to_numpy(),
            "j_micro": np.floor(1e6 * inter[keep] / safe[keep])
            .astype(np.int64)})

    mat3, nb3, max_b3 = resolve_exchange(
        counted.map_batches(pair_bucket, batch_format="pyarrow"))
    return bucket_map_groups(mat3, finish, n_buckets=nb3, modular=True,
                             max_bucket_bytes=max_b3)


def _edit_distance_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check, O(len) with early exit (no DP)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: b must be a with one insertion
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_near_pairs(ds, *, col: str = "caption"):
    """EXACT edit-distance<=1 pairs of DISTINCT strings (a < b) — the
    FastSS deletion-index join, the short-string (title/caption) analog
    of the shingle dedup family.

    Two strings at distance <= 1 share a common member of
    ``{s} ∪ deletions1(s)`` (equal = s itself; ins/del = the shorter is a
    deletion of the longer; substitution = both delete position i), so:
    distinct strings -> (variant-hash, string) posting rows -> variant-hash
    bucketed exchange pairs within posting lists -> pair-keyed dedup ->
    per-pair O(len) verify (candidates whose variants align at different
    positions can be distance 2 — the verify is what keeps this exact).
    The variant explosion is len+1 rows per string — linear, and only
    DISTINCT strings enter it (fingerprint-dedup first: dup-heavy columns
    never expand).  Bucket counts are data-derived."""
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    from katydid_haskell_ray.stages.keys import distinct_values

    distinct = distinct_values(ds.select_columns([col]), col)

    def variant_rows(t: pa.Table) -> pa.Table:
        out_h, out_s = [], []
        for s in t.column(col).to_pylist():
            variants = [s] + [s[:i] + s[i + 1:] for i in range(len(s))]
            out_h.extend(variants)
            out_s.extend([s] * len(variants))
        h = SK.hash64_array(np.array(out_h, dtype=object)) \
            if out_h else np.empty(0, np.uint64)
        return pa.table({"s": pa.array(out_s, type=pa.string()),
                         "__bucket": pa.array(h)})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"__bucket": "vh"})
        m = g.merge(g, on="vh")
        keep = m["s_x"] < m["s_y"]
        return (pd.DataFrame({"a": m["s_x"][keep], "b": m["s_y"][keep]})
                .drop_duplicates())

    posted = distinct.map_batches(variant_rows, batch_format="pyarrow")
    mat, nb, max_b = resolve_exchange(posted)
    cand = bucket_map_groups(mat, bucket_pairs, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b)

    def pair_bucket(t: pa.Table) -> pa.Table:
        h = SK.hash64_array(t.column("a")) ^ SK.hash64_array(t.column("b"))
        return t.append_column("__bucket", pa.array(h))

    mat2, nb2, max_b2 = resolve_exchange(
        cand.map_batches(pair_bucket, batch_format="pyarrow"))
    pairs = bucket_map_groups(
        mat2, lambda g: g[["a", "b"]].drop_duplicates(),
        n_buckets=nb2, modular=True, max_bucket_bytes=max_b2)

    def verify(t: pa.Table) -> pa.Table:
        av, bv = t.column("a").to_pylist(), t.column("b").to_pylist()
        keep = np.fromiter((_edit_distance_le1(x, y)
                            for x, y in zip(av, bv)),
                           dtype=bool, count=len(av))
        return t.filter(pa.array(keep))

    return pairs.map_batches(verify, batch_format="pyarrow")


def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """text -> 64-bit simhash fingerprint column (stateless task stage).

    Token hashes for the whole batch flatten into one hash64_array call and
    one segment-reduce (sketches.simhash64_many) — no per-doc loop."""
    texts = batch.column(col).to_pylist()
    toks: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        if t:
            toks.extend(_WORD_RE.findall(t))
        offsets[i + 1] = len(toks)
    flat = (SK.hash64_array(np.array(toks, dtype=object))
            if toks else np.empty(0, np.uint64))
    fps = SK.simhash64_many(flat, offsets)
    return batch.append_column("simhash", pa.array(fps))


def simhash_near_pairs(ds, *, id_col: str = "doc_id", col: str = "text",
                       max_hamming: int = 3, concurrency: int = 4):
    """EXACT near-dup pairs by simhash: fingerprint per batch, then the
    generic pigeonhole Hamming pair operator (every qualifying pair, any
    radius).  Returns a Dataset of (a, b, hamming), a < b."""
    fp = (ds.map_batches(lambda b: simhash_batch(b, col),
                         batch_format="pyarrow")
          .select_columns([id_col, "simhash"]))
    return hamming_near_pairs(fp, id_col=id_col, fp_col="simhash",
                              max_hamming=max_hamming)


def hamming_near_pairs(ds, *, id_col: str, fp_col: str,
                       max_hamming: int = 3, n_buckets: int | None = None):
    """EXACT all-pairs within Hamming distance <= max_hamming over a 64-bit
    fingerprint column (phash, simhash) — every qualifying pair, not the
    star-per-bucket approximation this module used to ship for simhash.

    Pigeonhole: any pair within Hamming r of 64 bits agrees exactly on at
    least one of r+1 disjoint chunks, so candidate generation is r+1
    chunk-equality self-joins, each a C-speed pandas self-merge inside a
    coarse-bucket exchange; verification is one vectorized popcount.
    Scale assumption: per-(chunk,val) group sizes stay bounded (the
    self-merge is quadratic in group size) — true for near-uniform
    fingerprints; a pathological hot chunk value needs MORE chunks (finer
    split still pigeonholes as long as chunks >= r+1), never salting,
    which would break the guarantee.

    Fully distributed: each pair is emitted only at its FIRST agreeing
    chunk, and the residual duplicate triples (same-id rows with distinct
    fingerprints converging on identical triples) are removed through a
    second pair-keyed exchange — nothing materializes on the driver.
    Returns a Dataset of (a, b, hamming), a < b, globally distinct."""
    fp = ds.select_columns([id_col, fp_col])

    # r+1 disjoint chunks covering the 64 bits (widths differ by <= 1)
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    widths = [64 // n_chunks + (1 if i < 64 % n_chunks else 0)
              for i in range(n_chunks)]
    shifts = np.cumsum([0] + widths[:-1]).astype(np.uint64)
    masks = np.array([(1 << w) - 1 for w in widths], dtype=np.uint64)

    def _chunk_vals(u: np.ndarray, c: int) -> np.ndarray:
        return ((u >> shifts[c]) & masks[c]).view(np.int64)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        s = batch.column(fp_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        u = s.view(np.uint64)
        n = len(s)
        chunks = np.repeat(np.arange(n_chunks, dtype=np.int32), n)
        vals = np.concatenate([_chunk_vals(u, c) for c in range(n_chunks)])
        t = pa.table({"chunk": pa.array(chunks), "val": pa.array(vals),
                      id_col: pa.array(np.tile(ids, n_chunks)),
                      fp_col: pa.array(np.tile(s, n_chunks),
                                       type=pa.int64())})
        b = (vals.view(np.uint64) * np.uint64(1315423911)
             + chunks.astype(np.uint64))
        return t.append_column("bucket", pa.array(b))

    import pandas as _pd

    _PAIR_SLAB = 4_000_000  # max candidate pairs held per numpy slab

    def bucket_pairs(g: _pd.DataFrame) -> _pd.DataFrame:
        """Per-(chunk,val) group pairing in SLAB-BOUNDED numpy: a pandas
        self-merge would materialize the full quadratic candidate frame
        (8 columns of objects) before any filtering — with low-entropy
        fingerprint chunks (structured images) a single hot chunk value
        makes that frame the task's peak memory.  Here candidates exist
        only as a (slab x p) uint64 xor matrix, filtered to survivors
        immediately; compute stays O(p²) (inherent to exactness) but
        memory is bounded by _PAIR_SLAB."""
        outs = []
        for _, sub in g.groupby(["chunk", "val"], sort=False):
            p = len(sub)
            if p < 2:
                continue
            c = int(sub["chunk"].iloc[0])
            ids = sub[id_col].to_numpy()
            fps_ = sub[fp_col].to_numpy().view(np.uint64)
            slab = max(1, _PAIR_SLAB // p)
            for s0 in range(0, p, slab):
                x = fps_[s0:s0 + slab][:, None] ^ fps_[None, :]
                d = SK.popcount64(x)
                keep = ((d <= max_hamming)
                        & (ids[s0:s0 + slab][:, None] < ids[None, :]))
                if not keep.any():
                    continue
                ii, jj = np.nonzero(keep)  # ONE pass over the slab mask
                xk = x[ii, jj]
                # emit a fingerprint pair only at its FIRST agreeing
                # chunk, so a pair matching several chunks never repeats
                first = np.full(len(xk), n_chunks, dtype=np.int64)
                for cc in range(n_chunks - 1, -1, -1):
                    agree = ((xk >> shifts[cc]) & masks[cc]) == 0
                    first[agree] = cc
                sel = first == c
                if not sel.any():
                    continue
                outs.append(_pd.DataFrame({
                    "a": ids[s0:s0 + slab][ii[sel]],
                    "b": ids[jj[sel]],
                    "hamming": d[ii[sel], jj[sel]]}))
        if not outs:
            return _pd.DataFrame({"a": np.array([], dtype=g[id_col].dtype),
                                  "b": np.array([], dtype=g[id_col].dtype),
                                  "hamming": np.array([], dtype=np.int64)})
        # duplicate ids can still converge on identical triples via
        # DIFFERENT fingerprints (distinct first chunks); the pair-keyed
        # dedup exchange below removes those globally
        return _pd.concat(outs, ignore_index=True).drop_duplicates()

    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    cmat, cnb, cmax = resolve_exchange(
        fp.map_batches(chunk_rows, batch_format="pyarrow"), n_buckets)
    pairs = bucket_map_groups(cmat, bucket_pairs, n_buckets=cnb,
                              bucket_col="bucket", modular=True,
                              max_bucket_bytes=cmax)

    def pair_bucket(t: pa.Table) -> pa.Table:
        h = SK.hash64_array(t.column("a")) ^ SK.hash64_array(t.column("b"))
        return t.append_column("__bucket", pa.array(h))

    dmat, dnb, dmax = resolve_exchange(
        pairs.map_batches(pair_bucket, batch_format="pyarrow"))
    dedup = bucket_map_groups(
        dmat, lambda g: g.drop(columns="__bucket").drop_duplicates(),
        n_buckets=dnb, modular=True, max_bucket_bytes=dmax)
    return dedup


def ngram_jaccard_pairs_bruteforce(texts: dict, shingle: int = 3,
                                   threshold: float = 0.8):
    """O(n²) exact shingle-Jaccard pairs — the small-scale oracle used to
    validate the LSH path in tests."""
    ids = sorted(texts)
    shs = {i: word_shingles(texts[i], shingle) for i in ids}
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jc = jaccard(shs[ids[i]], shs[ids[j]])
            if jc >= threshold:
                out.append((ids[i], ids[j], jc))
    return out
