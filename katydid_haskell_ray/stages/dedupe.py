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
signatures are fixed-width; union-find runs on the driver over the verified
candidate PAIR set only (bounded by true-duplicate density, not input size —
documented assumption; for adversarial inputs swap in the iterative
min-label-propagation groupby described in ray_guide).
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


def exact_dedupe(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the first (min id) row per distinct content hash.

    Equality is by 64-bit content hash (collision odds ~n²/2⁶⁵ — negligible
    at any real scale; use a 128-bit hash if that ever matters).  Shuffles
    only (hash, id): the payload column is dropped before the exchange and
    survivors are identified by id.
    """
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, col).select([id_col, "content_hash"]),
        batch_format="pyarrow")
    from ray.data.aggregate import Min
    keep = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))
    return keep.select_columns([id_col])


def dup_group_sizes(ds, col: str = "text"):
    """(content_hash, n_copies) for groups with more than one row."""
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, col).select(["content_hash"]),
        batch_format="pyarrow")
    counts = hashed.groupby("content_hash").count()
    return counts.filter(expr="count() > 1")


# ---------------------------------------------------------------------------
# shingling + minhash LSH
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\S+")


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (k-grams of whitespace tokens)."""
    toks = _WORD_RE.findall(text or "")
    if len(toks) < k:
        return SK.hash64_array([" ".join(toks)]) if toks else np.empty(0, np.uint64)
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return SK.hash64_array(grams)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class MinHashStage:
    """Actor stage: text -> (k,) minhash signature column (fixed-size list).

    The MinHasher's permutation table builds once per actor."""

    def __init__(self, col: str = "text", k: int = 128, shingle: int = 3):
        self.col = col
        self.mh = SK.MinHasher(k=k)
        self.shingle = shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        sigs = np.stack([
            self.mh.signature(word_shingles(t, self.shingle)) for t in texts
        ]).astype(np.int64)  # view as signed for Arrow
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), type=pa.int64()), self.mh.k)
        return batch.append_column("minhash", sig_arr)


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
    ids = batch.column(id_col).to_pylist()
    band_ids, band_hashes, out_ids = [], [], []
    for b in range(bands):
        seg = flat[:, b * rows_per_band:(b + 1) * rows_per_band]
        # hash each row's band segment
        bh = pd.util.hash_pandas_object(
            pd.DataFrame(seg), index=False).to_numpy()
        band_ids.extend([b] * n)
        band_hashes.extend(bh.view(np.int64).tolist())
        out_ids.extend(ids)
    return pa.table({"band": pa.array(band_ids, type=pa.int32()),
                     "band_hash": pa.array(band_hashes, type=pa.int64()),
                     id_col: pa.array(out_ids)})


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _auto_concurrency(requested):
    if requested is not None:
        return requested
    import ray
    return max(2, min(8, int(ray.cluster_resources().get("CPU", 4)) // 2))


def minhash_dedupe(ds, *, col: str = "text", id_col: str = "doc_id",
                   k: int = 128, bands: int = 32, shingle: int = 3,
                   threshold: float = 0.8, concurrency: int | None = None):
    """Full MinHash-LSH near-dup pipeline; returns (clusters_df, kept_ids).

    clusters_df: pandas (id, cluster) for every doc in a near-dup cluster of
    size >= 2, cluster = min id of the cluster.  kept_ids: ids surviving
    dedup (cluster representatives + singletons).
    """
    import pandas as _pd

    concurrency = _auto_concurrency(concurrency)
    rows_per_band = k // bands
    sigged = ds.map_batches(
        MinHashStage, fn_constructor_kwargs={"col": col, "k": k, "shingle": shingle},
        batch_format="pyarrow", concurrency=concurrency)
    band_ds = sigged.map_batches(
        lambda b: lsh_band_rows(b, bands=bands, rows_per_band=rows_per_band,
                                id_col=id_col),
        batch_format="pyarrow")

    # groupby on (band, band_hash) directly would create ~n*bands mostly-
    # singleton groups (per-group overhead dominates); shuffle on a COARSE
    # 256-way bucket of the band hash and pair up within buckets using
    # vectorized pandas — same exchange volume, C-speed reduce
    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("band_hash").to_numpy(zero_copy_only=False)
             .view(np.uint64) % 256).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def bucket_pairs(g: _pd.DataFrame) -> _pd.DataFrame:
        # anchor pairing (min id vs rest) per LSH bucket keeps candidates
        # linear in bucket size; transitive links come from other bands +
        # union-find
        g = g.sort_values(["band", "band_hash", id_col])
        first = g.groupby(["band", "band_hash"])[id_col].transform("first")
        hits = g[g[id_col] != first]
        return _pd.DataFrame({"a": first[g[id_col] != first].to_numpy(),
                              "b": hits[id_col].to_numpy()})

    cand = (band_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
            ).to_pandas()
    cand = cand.drop_duplicates()

    # ONE pass collects all ids (for the kept-set) AND candidate texts
    # (small side: only candidate rows' text reaches the driver)
    cand_set = set(cand["a"]) | set(cand["b"]) if len(cand) else set()
    texts: dict = {}
    all_ids: list = []
    for b in ds.map_batches(lambda t: t.select([id_col, col]),
                            batch_format="pyarrow").iter_batches(
                                batch_size=8192, batch_format="pyarrow"):
        ids = b.column(id_col).to_pylist()
        all_ids.extend(ids)
        if cand_set:
            for i, t in zip(ids, b.column(col).to_pylist()):
                if i in cand_set:
                    texts[i] = t

    if len(cand):
        shingle_cache = {i: set(word_shingles(t, shingle).tolist())
                         for i, t in texts.items()}
        uf = _UnionFind()
        for a, b in zip(cand["a"], cand["b"]):
            sa, sb = shingle_cache[a], shingle_cache[b]
            union_n = len(sa | sb)
            if union_n and len(sa & sb) / union_n >= threshold:
                uf.union(a, b)
            elif not union_n:
                uf.union(a, b)  # both empty: Jaccard defined as 1
        roots = {i: uf.find(i) for i in uf.parent}
        clusters = _pd.DataFrame(
            {"id": list(roots), "cluster": [roots[i] for i in roots]})
        clusters = clusters[clusters.groupby("cluster")["cluster"].transform("size") > 1]
    else:
        clusters = _pd.DataFrame({"id": [], "cluster": []})

    drop = set(clusters.loc[clusters["id"] != clusters["cluster"], "id"])
    kept = sorted(set(all_ids) - drop)
    return clusters.sort_values("id").reset_index(drop=True), kept


class SimHashStage:
    """Actor stage: text -> 64-bit simhash fingerprint column."""

    def __init__(self, col: str = "text"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        fps = np.array([
            SK.simhash64(SK.hash64_array(_WORD_RE.findall(t or "")) if t else
                         np.empty(0, np.uint64))
            for t in texts], dtype=np.int64)
        return batch.append_column("simhash", pa.array(fps))


def simhash_near_pairs(ds, *, id_col: str = "doc_id", col: str = "text",
                       max_hamming: int = 3, concurrency: int = 4) -> "pd.DataFrame":
    """Near-dup pairs by simhash: bucket on 4 x 16-bit chunks (any pair
    within Hamming r<=3 of 64 bits shares at least one identical 16-bit
    chunk — pigeonhole), groupby chunk buckets, verify Hamming."""
    fp = ds.map_batches(SimHashStage, fn_constructor_kwargs={"col": col},
                        batch_format="pyarrow", concurrency=concurrency)
    fp = fp.select_columns([id_col, "simhash"])

    def chunk_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col).to_pylist()
        outc, outv, outi, outs = [], [], [], []
        u = s.view(np.uint64)
        for c in range(4):
            chunk = ((u >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32)
            outc.extend([c] * len(ids))
            outv.extend(chunk.tolist())
            outi.extend(ids)
            outs.extend(s.tolist())
        return pa.table({"chunk": pa.array(outc, type=pa.int32()),
                         "val": pa.array(outv, type=pa.int32()),
                         id_col: pa.array(outi),
                         "simhash": pa.array(outs, type=pa.int64())})

    import pandas as _pd

    def add_bucket(t: pa.Table) -> pa.Table:
        # coarse bucket over (chunk, val) to avoid near-singleton groups
        c = t.column("chunk").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("val").to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((v + c * 65536) % 256).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def bucket_pairs(g: _pd.DataFrame) -> _pd.DataFrame:
        g = g.sort_values(["chunk", "val", id_col])
        grp = g.groupby(["chunk", "val"])
        first_id = grp[id_col].transform("first")
        first_fp = grp["simhash"].transform("first")
        rest = g[g[id_col] != first_id]
        if not len(rest):
            return _pd.DataFrame({"a": [], "b": [], "hamming": []})
        d = SK.hamming_distance64(first_fp[g[id_col] != first_id].to_numpy(),
                                  rest["simhash"].to_numpy())
        keep = d <= max_hamming
        return _pd.DataFrame({
            "a": first_id[g[id_col] != first_id].to_numpy()[keep],
            "b": rest[id_col].to_numpy()[keep],
            "hamming": d[keep].astype(np.int64)})

    pairs = fp.map_batches(chunk_rows, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas") \
        .to_pandas().drop_duplicates(subset=["a", "b"])
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


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
