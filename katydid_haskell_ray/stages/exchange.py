"""Raw-task bucketed exchange — the repo's keyed shuffle primitive.

``Dataset.groupby(bucket).map_groups(fn)`` runs Ray Data's sort-based
shuffle: a sampling pass, a per-block sort, and a range reduce.  For the
coarse-bucket exchanges this repo uses everywhere (64-256 int32 buckets,
reduce = one vectorized pandas/pyarrow pass per bucket) the sort machinery
is pure overhead — measured 3x slower than the direct formulation at
sf0.1.  This module implements the exchange as classic two-phase shuffle
on raw Ray tasks (the documented escape hatch for what the Dataset API
can't express efficiently):

    map:    one task per input block; ONE stable argsort of the int32
            bucket column splits the block into n_buckets zero-copy slices
            (``num_returns=n_buckets`` — each slice is its own object, so
            a reduce task pulls exactly its bucket, never whole blocks)
    reduce: one task per bucket; concat its shards, apply the per-bucket
            function

Scale shape: identical exchange volume to the groupby it replaces
(everything moves once).  Bucket counts are DATA-DERIVED
(resolve_exchange: ~256 MB per reduce task, up to 65536), so object
count is kept linear in blocks by capping per-task ``num_returns`` at
``_RETURNS_CAP``: past the cap the exchange goes HIERARCHICAL — map
tasks split into n_super = ceil(n_buckets / cap) contiguous-range super
slices, then per super a regroup layer (each task concatenating a
bounded group of block slices, ~2 blocks' bytes) re-splits into the
final buckets.  Object count = blocks x n_super + groups x cap — linear
in blocks for any bucket count — versus blocks x buckets flat (billions
of shard objects at a 10 TB+ exchange).  Data still moves twice at most,
the standard multi-round shuffle trade.  Inputs are materialized first —
exactly what any all-to-all shuffle does — and the object store spills
shards as needed.  Ray-core lineage retries failed map/reduce tasks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


_EMPTY = pa.table({})

# Per-reduce-task working-set target.  A reduce task concatenates its whole
# bucket into one in-memory table, so bucket count must GROW with the data:
# a constant n_buckets means one bucket = total/n — a guaranteed OOM at
# 100x.  resolve_exchange() sizes n_buckets so a bucket lands near this.
DEFAULT_TARGET_BUCKET_BYTES = 256 << 20
# Skew allowance asserted in the reduce task: a bucket may run hot (hash
# imbalance, correlated keys) but beyond this factor the sizing assumption
# is broken and the job should fail loudly rather than OOM silently.
BUCKET_SKEW_FACTOR = 16


def resolve_exchange(ds, n_buckets: int | None = None, *,
                     target_bytes: int | None = None,
                     min_buckets: int | None = None,
                     max_buckets: int = 65536):
    """Materialize an exchange input and size its bucket count from the
    ACTUAL materialized bytes (the exchange materializes anyway, so this
    is free).  Returns (materialized_ds, n_buckets, max_bucket_bytes).

    Pass the result's dataset (not the original) to bucket_map_groups so
    the materialization isn't repeated.  An explicit ``n_buckets``
    disables auto-sizing (and the byte-bound assert) for callers whose
    reduce volume is already bounded (combined partials, top-k heads)."""
    mat = ds.materialize()
    if n_buckets is not None:
        return mat, n_buckets, None
    if min_buckets is None:
        # parallelism floor: fewer reduce tasks than cores caps the
        # exchange's width regardless of data size (measured: the 16-cpu
        # scaling leg lost ~40% when a small exchange resolved to 8)
        min_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    tb = target_bytes or DEFAULT_TARGET_BUCKET_BYTES
    sz = mat.size_bytes() or 0
    n = int(min(max_buckets, max(min_buckets, -(-sz // tb))))
    # expected per-bucket bytes given the chosen count (>= tb only when
    # the max_buckets cap bites); assert with the documented skew factor
    expected = max(tb, -(-sz // n))
    return mat, n, BUCKET_SKEW_FACTOR * expected


def _split_block(tab: pa.Table, bucket_col: str, n_buckets: int,
                 modular: bool = False):
    """Zero-copy split of one block into per-bucket slices (sorted once).

    ``modular=True`` means ``bucket_col`` holds a full-range uint64 hash
    and the bucket is ``hash % n_buckets`` — so the SAME hashed input can
    be exchanged at any bucket count chosen after materialization.

    Ray Data passes 0-row blocks through map operators WITHOUT calling the
    UDF — so a degenerate block can arrive here 0-column, and even as a
    raw pandas block that ``to_arrow_refs`` never converted; it
    contributes nothing to any bucket."""
    def ret(parts):
        # num_returns=1 means Ray expects ONE value, not a 1-tuple
        return parts[0] if n_buckets == 1 else parts

    if isinstance(tab, pd.DataFrame):
        if len(tab) == 0:
            return ret(tuple(_EMPTY for _ in range(n_buckets)))
        tab = pa.Table.from_pandas(tab, preserve_index=False)
    if tab.num_rows == 0:
        return ret(tuple(_EMPTY for _ in range(n_buckets)))
    b = tab.column(bucket_col).to_numpy(zero_copy_only=False)
    if modular:
        b = b.astype(np.uint64) % np.uint64(n_buckets)
    order = np.argsort(b, kind="stable")
    st = tab.take(pa.array(order))
    bounds = np.searchsorted(b[order], np.arange(n_buckets + 1))
    return ret(tuple(
        st.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        .combine_chunks()
        for i in range(n_buckets)))


# Max num_returns per task.  A flat exchange makes blocks x n_buckets
# shard objects; past this cap the shard plan goes hierarchical (module
# docstring).  Tests shrink it to force the two-round path.
_RETURNS_CAP = 1024


def _final_buckets(tab: pa.Table, bucket_col: str, n_buckets: int,
                   modular: bool) -> np.ndarray:
    b = tab.column(bucket_col).to_numpy(zero_copy_only=False)
    if modular:
        b = (b.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
    return b.astype(np.int64, copy=False)


def _argsort_slices(tab: pa.Table, key: np.ndarray, n: int):
    """One stable argsort of ``key`` -> tuple of n zero-copy slices."""
    order = np.argsort(key, kind="stable")
    st = tab.take(pa.array(order))
    bounds = np.searchsorted(key[order], np.arange(n + 1))
    return tuple(
        st.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        .combine_chunks()
        for i in range(n))


def _split_super(tab, bucket_col: str, n_buckets: int, n_super: int,
                 cap: int, modular: bool):
    """Round-1 map split into contiguous-final-bucket-range super slices
    (super = final_bucket // cap)."""
    def ret(parts):
        return parts[0] if n_super == 1 else parts

    if isinstance(tab, pd.DataFrame):
        if len(tab) == 0:
            return ret(tuple(_EMPTY for _ in range(n_super)))
        tab = pa.Table.from_pandas(tab, preserve_index=False)
    if tab.num_rows == 0:
        return ret(tuple(_EMPTY for _ in range(n_super)))
    sup = _final_buckets(tab, bucket_col, n_buckets, modular) // cap
    return ret(_argsort_slices(tab, sup, n_super))


def _regroup_split(bucket_col: str, n_buckets: int, lo: int, cap_s: int,
                   modular: bool, *shards):
    """Round-2 regroup: concat one super's slices from a bounded block
    group, re-split into the super's cap_s final buckets."""
    def ret(parts):
        return parts[0] if cap_s == 1 else parts

    good = [s for s in shards if s.num_columns]
    if not good:
        return ret(tuple(_EMPTY for _ in range(cap_s)))
    tab = pa.concat_tables(good, promote_options="default")
    if tab.num_rows == 0:
        return ret(tuple(_EMPTY for _ in range(cap_s)))
    local = _final_buckets(tab, bucket_col, n_buckets, modular) - lo
    return ret(_argsort_slices(tab, local, cap_s))


def _shard_plan(block_refs, bucket_col: str, n_buckets: int, modular: bool):
    """Per-bucket shard refs for an exchange input: ``plan[k]`` = the
    object refs whose concatenation is bucket k.  Flat one-round split
    while n_buckets <= _RETURNS_CAP; hierarchical two-round past it."""
    cap = _RETURNS_CAP
    if n_buckets <= cap:
        split = ray.remote(num_returns=n_buckets)(_split_block)
        parts = [split.remote(r, bucket_col, n_buckets, modular)
                 for r in block_refs]
        if n_buckets == 1:  # ray num_returns=1 yields a bare ref
            parts = [[p] for p in parts]
        return [[p[k] for p in parts] for k in range(n_buckets)]

    n_super = -(-n_buckets // cap)
    split1 = ray.remote(num_returns=n_super)(_split_super)
    sup = [split1.remote(r, bucket_col, n_buckets, n_super, cap, modular)
           for r in block_refs]
    if n_super == 1:
        sup = [[p] for p in sup]
    # a regroup task concatenates one super's slices from ~2*n_super
    # blocks — about two blocks' worth of bytes, independent of scale
    group = max(1, 2 * n_super)
    plan: list[list] = [[] for _ in range(n_buckets)]
    for s in range(n_super):
        lo = s * cap
        cap_s = min(cap, n_buckets - lo)
        regroup = ray.remote(num_returns=cap_s)(_regroup_split)
        for g0 in range(0, len(sup), group):
            refs = regroup.remote(
                bucket_col, n_buckets, lo, cap_s, modular,
                *[sup[i][s] for i in range(g0, min(g0 + group, len(sup)))])
            if cap_s == 1:
                refs = [refs]
            for j in range(cap_s):
                plan[lo + j].append(refs[j])
    return plan


def bucket_map_groups(ds, fn, *, n_buckets: int, bucket_col: str = "__bucket",
                      batch_format: str = "pandas", modular: bool = False,
                      max_bucket_bytes: int | None = None):
    """``ds.groupby(bucket_col).map_groups(fn)`` as a raw-task exchange.

    ``ds`` must already carry ``bucket_col``: an int32 in [0, n_buckets),
    or (``modular=True``) a full-range uint64 hash that the split task
    reduces mod n_buckets — use the latter with resolve_exchange() so the
    bucket count is derived from data size, not hardcoded.
    ``fn`` runs once per bucket on the bucket's full concatenated rows
    (pandas frame or pyarrow table per ``batch_format``), with the bucket
    column still present, and returns the same format.  Returns a Dataset
    over the per-bucket outputs (one block per non-empty output).
    ``max_bucket_bytes`` (set by resolve_exchange) bounds a reduce task's
    concatenated input — the documented alternative to a silent OOM.
    """
    @ray.remote
    def reduce_bucket(*shards):
        good = [s for s in shards if s.num_columns]
        if not good:
            return _EMPTY  # Ray's empty-block convention: skip the UDF
        tab = pa.concat_tables(good, promote_options="default")
        if tab.num_rows == 0:
            # skip the UDF on 0-row buckets too: per-bucket fns would have
            # to rebuild typed empty frames by hand, and an untyped empty
            # output degrades the Dataset's unified schema to null columns
            return _EMPTY
        if max_bucket_bytes is not None and tab.nbytes > max_bucket_bytes:
            raise AssertionError(
                f"bucket exceeds sizing bound: {tab.nbytes} bytes > "
                f"{max_bucket_bytes} (skew factor {BUCKET_SKEW_FACTOR}x) — "
                "key distribution far hotter than the hash-uniform "
                "assumption; salt the key or raise target_bucket_bytes")
        if batch_format == "pandas":
            out = fn(tab.to_pandas())
            return pa.Table.from_pandas(out, preserve_index=False)
        return fn(tab)

    blocks = ds.materialize().to_arrow_refs()
    plan = _shard_plan(blocks, bucket_col, n_buckets, modular)
    outs = [reduce_bucket.remote(*plan[k]) for k in range(n_buckets)]
    return ray.data.from_arrow_refs(outs)


def bucketed_group_sum(partials, keys: list[str], *,
                       n_buckets: int | None = None):
    """Sum already-combined per-batch partials per key tuple — the shared
    tail of every combiner-before-shuffle aggregate.  Ray's sort-based
    ``groupby().aggregate(Sum...)`` costs ~10s of fixed overhead on a
    60k-row partial stream at 32 cpus; this is the same exchange as
    bucket_map_groups (one task per bucket, C-speed pandas sum).  The
    partial stream is blocks x groups-per-block rows — it GROWS with key
    cardinality, so the bucket count is data-derived unless pinned."""

    def add_bucket(t):
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        h = pd.util.hash_pandas_object(
            t.select(keys).to_pandas(), index=False).to_numpy()
        return t.append_column("__bucket", pa.array(h.astype(np.uint64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL GROUP BY keeps the NULL group
        return (g.drop(columns="__bucket")
                .groupby(keys, as_index=False, dropna=False).sum())

    mat, nb, max_b = resolve_exchange(
        partials.map_batches(add_bucket, batch_format="pyarrow"), n_buckets)
    return bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b)


def salted_group_sum(rows, keys: list[str], *, n_salt: int = 8,
                     n_buckets: int | None = None):
    """Salted repartitioning before groupby — the hot-key escape hatch.

    The per-batch combiner (queries.grouped_sum) already bounds skew for
    algebraic aggregates: a hot key contributes ONE partial row per block.
    But when partials can't combine inside a block (high distinct payload
    per key, or the caller ships raw rows), a hot key sends every row to
    one reduce bucket.  This stage appends a deterministic salt in
    [0, n_salt) (row position — legal because integer sums are
    associative/commutative, so the result is salt-assignment-invariant),
    aggregates per (key..., salt) through the bucketed exchange — the hot
    key now spreads over up to n_salt buckets — then re-aggregates the
    tiny (key, salt) stream per key in a second, trivially small exchange.
    """

    def add_salt(t: pa.Table) -> pa.Table:
        s = (np.arange(t.num_rows, dtype=np.int64)
             % n_salt).astype(np.int32)
        return t.append_column("__salt", pa.array(s))

    level1 = bucketed_group_sum(
        rows.map_batches(add_salt, batch_format="pyarrow"),
        keys + ["__salt"], n_buckets=n_buckets)

    def drop_salt(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__salt"])

    return bucketed_group_sum(
        level1.map_batches(drop_salt, batch_format="pyarrow"),
        keys, n_buckets=n_buckets and min(n_buckets, 16))


def bucket_cogroup(left, right, fn, *, n_buckets: int | None = None,
                   bucket_col: str = "__bucket", modular: bool = False,
                   target_bytes: int | None = None):
    """Two-sided keyed exchange: per bucket, ``fn(left_df, right_df)`` on
    the two sides' concatenated rows as pandas frames (typed — the sides
    never union, so there is no schema null-fill or int->float coercion).
    Both inputs must already carry ``bucket_col`` (int32 in range, or a
    full-range uint64 hash with ``modular=True``).  ``n_buckets=None``
    (requires modular) derives the count from BOTH sides' materialized
    bytes and asserts the per-bucket byte bound — joins ship whole
    projected rows, so their fan-out must grow with the data.  Returns a
    Dataset of fn's outputs."""
    lmat = left.materialize()
    rmat = right.materialize()
    max_bucket_bytes = None
    if n_buckets is None:
        if not modular:
            raise ValueError("auto-sized cogroup requires modular=True")
        tb = target_bytes or DEFAULT_TARGET_BUCKET_BYTES
        sz = (lmat.size_bytes() or 0) + (rmat.size_bytes() or 0)
        floor = max(8, int(ray.cluster_resources().get("CPU", 8)))
        n_buckets = int(min(65536, max(floor, -(-sz // tb))))
        max_bucket_bytes = BUCKET_SKEW_FACTOR * max(tb, -(-sz // n_buckets))

    @ray.remote
    def reduce_bucket(nl, *shards):
        # a side whose shards are ALL degenerate was globally empty; fn
        # receives a 0-column frame for it and decides the semantics
        lt = [s for s in shards[:nl] if s.num_columns]
        rt = [s for s in shards[nl:] if s.num_columns]
        if max_bucket_bytes is not None:
            total = sum(s.nbytes for s in lt) + sum(s.nbytes for s in rt)
            if total > max_bucket_bytes:
                raise AssertionError(
                    f"cogroup bucket exceeds sizing bound: {total} bytes > "
                    f"{max_bucket_bytes} (skew factor {BUCKET_SKEW_FACTOR}x)"
                    " — salt the key or raise target_bytes")
        ldf = (pa.concat_tables(lt, promote_options="default").to_pandas()
               if lt else pd.DataFrame())
        rdf = (pa.concat_tables(rt, promote_options="default").to_pandas()
               if rt else pd.DataFrame())
        out = fn(ldf, rdf)
        return pa.Table.from_pandas(out, preserve_index=False)

    lplan = _shard_plan(lmat.to_arrow_refs(), bucket_col, n_buckets, modular)
    rplan = _shard_plan(rmat.to_arrow_refs(), bucket_col, n_buckets, modular)
    outs = [reduce_bucket.remote(len(lplan[k]), *lplan[k], *rplan[k])
            for k in range(n_buckets)]
    return ray.data.from_arrow_refs(outs)
