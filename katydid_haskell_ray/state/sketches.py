"""Mergeable sketches for table-level checks at 100 TB scale.

The reference has no table-level operators (SURVEY.md §2.6); these implement
the north-rule additions: HyperLogLog cardinality, KLL quantiles for
distribution-drift detection, Bloom filters for broadcast referential checks,
MinHash signatures for near-dup detection, SimHash fingerprints.

All sketches are:
- **associative+commutative mergeable** — accumulate per block in an actor,
  merge partials tree-wise on the driver (tiny state, no shuffle);
- **numpy-vectorized** — `add_hashes` / `add_values` take whole arrays;
- **picklable** — they travel through the Ray object store.

Hashing of arbitrary Arrow columns goes through :func:`hash64_array`
(pandas' vectorized SipHash-like hashing with a fixed key: deterministic
across processes and runs — required for Bloom broadcast + resume).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "0123456789123456"  # fixed 16-byte key: cross-process determinism


_NULL_HASH = np.uint64(0xA0761D6478BD642F)  # fixed sentinel for Arrow nulls


def hash64_array(col) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow array / numpy array / list.

    Arrow nulls hash to a fixed sentinel, and non-null values hash
    IDENTICALLY whether or not their array contains nulls.  A nullable
    int64 column must not round-trip through pandas as float64 — that
    would re-key every non-null value in null-containing batches, so a
    bucketed exchange (or a Bloom probe) would silently disagree with
    hash streams built from null-free batches of the same column.
    Null-containing arrays therefore hash their ``drop_null()`` values
    and scatter the results back under the validity mask.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        if col.null_count:
            import pyarrow.compute as pc
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            out = np.full(len(col), _NULL_HASH, dtype=np.uint64)
            out[valid] = hash64_array(col.drop_null())
            return out
        col = col.to_pandas()
    arr = np.asarray(col)
    if arr.dtype.kind in ("U", "S"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


_POLY_P = np.uint64(0x100000001B3)  # FNV-64 prime


def _mix64(h: np.ndarray) -> np.ndarray:
    """Final avalanche (murmur3 fmix64 step) over a uint64 array."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return h


def window_poly(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Hash every k-window of a token-hash sequence (order-sensitive
    polynomial in the FNV prime + fmix64 finalizer).  A doc with 0 < n < k
    tokens yields ONE whole-doc window; n == 0 yields none."""
    th = np.asarray(token_hashes, dtype=np.uint64)
    n = len(th)
    if n == 0:
        return np.empty(0, np.uint64)
    kk = min(k, n)
    acc = np.zeros(n - kk + 1, dtype=np.uint64)
    for j in range(kk):
        acc = acc * _POLY_P + th[j:n - kk + 1 + j]
    return _mix64(acc)


def window_poly_flat(flat: np.ndarray, offsets: np.ndarray, k: int):
    """Batch :func:`window_poly`: token hashes for MANY docs concatenated
    (``offsets`` len n_docs+1) -> (gram hashes concatenated, gram offsets).
    One vectorized pass; windows never cross doc boundaries."""
    flat = np.asarray(flat, dtype=np.uint64)
    lens = np.diff(offsets)
    ndocs = len(lens)
    out_counts = np.where(lens >= k, lens - k + 1,
                          (lens > 0).astype(np.int64))
    gram_offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(out_counts, out=gram_offsets[1:])
    out = np.empty(gram_offsets[-1], dtype=np.uint64)
    if len(flat) == 0:
        return out, gram_offsets
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    m = len(flat) - k + 1
    if m > 0:
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * _POLY_P + flat[j:m + j]
        valid = doc_of[:m] == doc_of[k - 1:]
        gd = doc_of[:m][valid]
        # grams of one doc are contiguous and in order: dest index =
        # doc's gram offset + within-doc rank
        starts = np.searchsorted(gd, np.arange(ndocs))
        rank = np.arange(len(gd), dtype=np.int64) - starts[gd]
        out[gram_offsets[gd] + rank] = _mix64(acc[valid])
    for d in np.nonzero((lens > 0) & (lens < k))[0]:
        seg = flat[offsets[d]:offsets[d + 1]]
        out[gram_offsets[d]] = window_poly(seg, k)[0]
    return out, gram_offsets


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HLL:
    """HyperLogLog with 2^p registers (p=14 → ~0.8% relative error)."""

    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HLL":
        h = np.asarray(h).astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # guard bit keeps `rest` nonzero so rank is capped at 64-p+1
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # exact vectorized highest-set-bit via 6-step binary search
        pos = np.zeros(len(h), dtype=np.uint64)
        x = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            su = np.uint64(s)
            big = (x >> su) != 0
            pos[big] += su
            x[big] >>= su
        rank = (np.uint64(63) - pos + np.uint64(1)).astype(np.uint8)
        np.maximum.at(self.regs, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        if not self.regs.flags.writeable:  # zero-copy from the object store
            self.regs = self.regs.copy()
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.regs.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.regs == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting (small range)
        return float(e)



# ---------------------------------------------------------------------------
# KLL-style quantile sketch
# ---------------------------------------------------------------------------


class KLL:
    """Simplified KLL quantile sketch (levels of capacity-k buffers; level i
    items carry weight 2^i; compaction keeps alternating items).

    Follows the KLL scheme of Karnin-Lang-Liberty (PAPERS.md: "KLL±" line);
    the compaction coin is a counter-alternated deterministic choice so
    repeated runs produce identical sketches (resume-friendliness beats the
    tiny bias for our drift-threshold use)."""

    __slots__ = ("k", "levels", "_coin", "count")

    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._coin = 0
        self.count = 0

    def add_values(self, vals: np.ndarray) -> "KLL":
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return self
        self.count += len(vals)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compact()
        return self

    def _cap(self, level: int) -> int:
        # geometrically decaying capacities, floor 8
        c = int(self.k * (2 / 3) ** (len(self.levels) - 1 - level))
        return max(8, c)

    def _compact(self):
        for lv in range(len(self.levels)):
            if len(self.levels[lv]) > self._cap(lv):
                buf = np.sort(self.levels[lv])
                keep = buf[self._coin % 2 :: 2]
                self._coin += 1
                self.levels[lv] = np.empty(0, dtype=np.float64)
                if lv + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[lv + 1] = np.concatenate([self.levels[lv + 1], keep])

    def merge(self, other: "KLL") -> "KLL":
        for lv in range(len(other.levels)):
            while lv >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[lv] = np.concatenate([self.levels[lv], other.levels[lv]])
        self.count += other.count
        self._compact()
        return self

    def quantiles(self, qs) -> np.ndarray:
        items, weights = [], []
        for lv, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << lv, dtype=np.float64))
        if not items:
            return np.full(len(qs), np.nan)
        v = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1]
        out = []
        for q in qs:
            pos = np.searchsorted(cw, q * total, side="left")
            out.append(v[min(pos, len(v) - 1)])
        return np.array(out)


def quantile_drift(a: KLL, b: KLL, qs=None) -> float:
    """Max normalized quantile delta between two sketches (the drift score
    compared against a threshold; KS-style but on sketch quantiles)."""
    qs = qs if qs is not None else np.linspace(0.05, 0.95, 19)
    qa, qb = a.quantiles(qs), b.quantiles(qs)
    scale = max(1e-9, float(np.nanmax(np.abs(qa))), float(np.nanmax(np.abs(qb))))
    return float(np.nanmax(np.abs(qa - qb)) / scale)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


class Bloom:
    """Bloom filter over 64-bit hashes; double hashing (h1 + i*h2).

    Built once from the referenced key set, broadcast via ``ray.put``, probed
    inside map_batches — the broadcast semi-join of SURVEY.md §2.6."""

    __slots__ = ("nbits", "nhashes", "bits")

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        nbits = int(-n_items * np.log(fp_rate) / (np.log(2) ** 2)) + 8
        self.nbits = 1 << int(np.ceil(np.log2(max(64, nbits))))  # pow2 for mask
        self.nhashes = max(1, int(round(np.log(2) * self.nbits / max(1, n_items))))
        self.nhashes = min(self.nhashes, 12)
        self.bits = np.zeros(self.nbits // 8, dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64, copy=False)
        h1 = h
        h2 = (h >> np.uint64(32)) | (h << np.uint64(32)) | np.uint64(1)
        i = np.arange(self.nhashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) & np.uint64(self.nbits - 1)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> "Bloom":
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0)

    def merge(self, other: "Bloom") -> "Bloom":
        if not self.bits.flags.writeable:  # zero-copy from the object store
            self.bits = self.bits.copy()
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


class CountMin:
    """Count-Min sketch over 64-bit hashes: d x w counter matrix, double
    hashing row positions, estimate = min over rows (one-sided: NEVER an
    underestimate).  Mergeable by elementwise sum — the per-block partial /
    tree-reduce frequency sketch for heavy-hitter candidates whose exact
    twin is the bucketed count exchange (queries.docs_top_tokens)."""

    __slots__ = ("w", "d", "counts")

    def __init__(self, w: int = 1 << 14, d: int = 4):
        self.w = 1 << int(np.ceil(np.log2(max(64, w))))  # pow2 for mask
        self.d = d
        self.counts = np.zeros((d, self.w), dtype=np.int64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64, copy=False)
        h1 = h
        h2 = (h >> np.uint64(32)) | (h << np.uint64(32)) | np.uint64(1)
        i = np.arange(self.d, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                & np.uint64(self.w - 1)).astype(np.int64)

    def add_hashes(self, h: np.ndarray,
                   weights: np.ndarray | None = None) -> "CountMin":
        pos = self._positions(h)
        w = np.ones(len(h), dtype=np.int64) if weights is None else weights
        for r in range(self.d):
            np.add.at(self.counts[r], pos[r], w)
        return self

    def estimate(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        return np.min(np.stack([self.counts[r][pos[r]]
                                for r in range(self.d)]), axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        if not self.counts.flags.writeable:  # zero-copy from object store
            self.counts = self.counts.copy()
        self.counts += other.counts
        return self


# ---------------------------------------------------------------------------
# MinHash + SimHash
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """k-permutation MinHash over shingle hash sets (for LSH near-dup)."""

    __slots__ = ("k", "a", "b")

    def __init__(self, k: int = 128, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.k = k
        self.a = rng.randint(1, (1 << 61) - 1, size=k).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=k).astype(np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(n_shingles,) uint64 -> (k,) uint64 signature."""
        if len(shingle_hashes) == 0:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = shingle_hashes.astype(np.uint64, copy=False) & _MERSENNE
        # (k, n): (a*h + b) mod 2^61-1  (numpy uint64 wraps; use modmul trick)
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def signature_many(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Signatures for a whole batch at once: ``flat`` holds every doc's
        shingle hashes concatenated, ``offsets`` (n_docs+1) delimits them.
        ONE permutation matrix op + segment-min (np.minimum.reduceat) per
        chunk replaces the per-doc loop; bit-identical to :meth:`signature`.
        Chunked over doc-aligned shingle ranges so the (k, chunk) transient
        stays ~1 MB — cache-resident; bigger chunks measured 2-8x slower."""
        n = len(offsets) - 1
        out = np.full((n, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(flat) == 0:
            return out
        h = flat.astype(np.uint64, copy=False) & _MERSENNE
        offsets = np.asarray(offsets, dtype=np.int64)
        chunk = max(1, (1 << 17) // self.k)  # shingles per matrix op
        d0 = 0
        while d0 < n:
            d1 = int(np.searchsorted(offsets, offsets[d0] + chunk, side="right")) - 1
            d1 = min(max(d1, d0 + 1), n)
            s0, s1 = offsets[d0], offsets[d1]
            if s1 > s0:
                vals = (self.a[:, None] * h[None, s0:s1] + self.b[:, None]) % _MERSENNE
                local = offsets[d0:d1 + 1] - s0
                ne = local[:-1] < local[1:]
                if ne.any():
                    mins = np.minimum.reduceat(vals, local[:-1][ne], axis=1)
                    out[np.arange(d0, d1)[ne]] = mins.T
            d0 = d1
        return out


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> np.int64:
    """64-bit SimHash of a token hash multiset."""
    if len(token_hashes) == 0:
        return np.int64(0)
    h = token_hashes.astype(np.uint64, copy=False)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.float64)
    w = weights if weights is not None else np.ones(len(h))
    score = (bits * 2 - 1).T @ w
    out = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out.astype(np.int64)


def simhash64_many(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash for a whole batch: ``flat`` = all docs' token hashes
    concatenated, ``offsets`` (n_docs+1).  Per-bit ones-counts via ONE
    np.add.reduceat per chunk; bit i set iff 2*ones - n_tokens > 0 —
    bit-identical to :func:`simhash64` with unit weights (empty doc -> 0).
    Chunked over doc-aligned token ranges so the (chunk, 64) bit-matrix
    stays ~2 MB — cache-resident; bigger chunks measured up to 10x slower."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.int64)
    if len(flat) == 0:
        return out
    h = flat.astype(np.uint64, copy=False)
    offsets = np.asarray(offsets, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    powers = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    chunk = 1 << 12  # tokens per bit-matrix op
    d0 = 0
    while d0 < n:
        d1 = int(np.searchsorted(offsets, offsets[d0] + chunk, side="right")) - 1
        d1 = min(max(d1, d0 + 1), n)
        s0, s1 = offsets[d0], offsets[d1]
        if s1 > s0:
            bits = ((h[s0:s1, None] >> shifts) & np.uint64(1)).astype(np.int64)
            local = offsets[d0:d1 + 1] - s0
            ne = local[:-1] < local[1:]
            if ne.any():
                ones = np.add.reduceat(bits, local[:-1][ne], axis=0)  # (ne, 64)
                cnt = (local[1:] - local[:-1])[ne]
                pos = (2 * ones - cnt[:, None]) > 0
                packed = (pos.astype(np.uint64) * powers[None, :]).sum(axis=1)
                out[np.arange(d0, d1)[ne]] = packed.astype(np.uint64).view(np.int64)
        d0 = d1
    return out


_POPCOUNT_LUT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (SWAR bit trick — one
    arithmetic pass, any shape; replaces the 8-pass byte-LUT)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101))
            >> np.uint64(56)).astype(np.int64)


def hamming_distance64(a, b) -> np.ndarray:
    """Hamming distance between int64/uint64 arrays (or array vs scalar)."""
    av = np.atleast_1d(np.asarray(a)).astype(np.int64).view(np.uint64)
    bv = np.atleast_1d(np.asarray(b)).astype(np.int64).view(np.uint64)
    return popcount64(av ^ bv)


class TDigest:
    """Mergeable t-digest quantile sketch (Dunning's centroid scheme with
    the k1 scale function) — the north star names "KLL/t-digest"; KLL
    serves the drift checks, this is the floating-point-friendly
    alternative with tighter tail accuracy.

    Deterministic: centroids are kept sorted by mean and compression
    clusters left-to-right under the k1 size bound, so identical inputs
    (in identical batch order) produce identical sketches — the same
    resume-friendliness contract as the KLL above.  Centroid arrays are
    rebuilt on compress, so merging a Ray zero-copy deserialized sketch
    never mutates a read-only buffer."""

    __slots__ = ("delta", "means", "weights", "count", "_buf")

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.count = 0.0
        self._buf: list[np.ndarray] = []

    # -- scale function k1 and its cluster-size bound ---------------------
    def _compress(self):
        parts = [m for m in ([self.means] if len(self.means) else [])]
        wparts = [w for w in ([self.weights] if len(self.weights) else [])]
        if self._buf:
            b = np.concatenate(self._buf)
            parts.append(b)
            wparts.append(np.ones(len(b)))
            self._buf = []
        if not parts:
            return
        m = np.concatenate(parts)
        w = np.concatenate(wparts)
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        q0 = 0.0
        acc_m, acc_w = m[0], w[0]
        qlim = self._q_limit(q0, total)
        for i in range(1, len(m)):
            if acc_w + w[i] <= (qlim - q0) * total:
                # weighted running mean keeps the centroid exact
                acc_m = (acc_m * acc_w + m[i] * w[i]) / (acc_w + w[i])
                acc_w += w[i]
            else:
                out_m.append(acc_m)
                out_w.append(acc_w)
                q0 += acc_w / total
                qlim = self._q_limit(q0, total)
                acc_m, acc_w = m[i], w[i]
        out_m.append(acc_m)
        out_w.append(acc_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)
        self.count = float(total)

    def _q_limit(self, q0: float, total: float) -> float:
        # k1 scale: k(q) = delta/(2*pi) * asin(2q-1); invert one k-unit
        k0 = (self.delta / (2 * np.pi)) * np.arcsin(2 * q0 - 1)
        return (np.sin((k0 + 1) * (2 * np.pi) / self.delta) + 1) / 2

    def add_values(self, vals: np.ndarray) -> "TDigest":
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return self
        self._buf.append(vals)
        self.count += len(vals)
        if sum(len(b) for b in self._buf) > 8 * self.delta:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress()
        o = TDigest(other.delta)
        o.means = other.means
        o.weights = other.weights
        o._buf = list(other._buf)
        o.count = other.count
        o._compress()
        if len(o.means):
            self.means = np.concatenate([self.means, o.means])
            self.weights = np.concatenate([self.weights, o.weights])
        self.count = float(self.weights.sum()) if len(self.weights) else 0.0
        self._compress()
        return self

    def quantiles(self, qs) -> np.ndarray:
        self._compress()
        if not len(self.means):
            return np.full(len(qs), np.nan)
        cw = np.cumsum(self.weights) - self.weights / 2
        out = []
        for q in qs:
            target = q * self.count
            out.append(float(np.interp(target, cw, self.means)))
        return np.array(out)
