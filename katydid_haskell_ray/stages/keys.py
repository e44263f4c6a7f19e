"""Key-based table checks: uniqueness (shuffle) and referential (broadcast).

Uniqueness (SURVEY.md §7.3): the only genuinely wide operation in the
engine.  Scale discipline:

- project to the key column BEFORE the shuffle (never move ``bytes``);
- pre-aggregate per batch with ``pc.value_counts`` — one (key, n) row per
  distinct key per batch — so a skewed hot key (FIXTURES.md: one phash on
  ~5% of rows) collapses to one row per block before the exchange; the
  groupby then sums tiny partials.  This is the combiner-before-shuffle
  pattern; salting is unnecessary because the partial stream is bounded by
  (blocks × distinct-keys-per-block), not row count.

Referential (SURVEY.md §2.6): Bloom filter of the referenced key set built
once, broadcast via ``ray.put``, probed inside ``map_batches`` — a
broadcast anti-join, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from katydid_haskell_ray.state import sketches as SK


def partial_key_counts(key: str):
    """map_batches fn: (key, cnt) partial counts for one batch."""
    def f(batch: pa.Table) -> pa.Table:
        arr = batch.column(key)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.drop_null().value_counts()
        return pa.table({key: vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})
    return f


def add_bucket_fn(key: str, n_buckets: int, bucket_col: str = "bucket"):
    """map_batches fn: append an int32 key-hash bucket column — the shared
    front half of every single-key bucketed exchange in the repo."""
    def f(batch: pa.Table) -> pa.Table:
        arr = batch.column(key)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h = SK.hash64_array(arr) % np.uint64(n_buckets)
        return batch.append_column(bucket_col, pa.array(h.astype(np.int32)))
    return f


def add_hash_fn(key: str, bucket_col: str = "__bucket"):
    """map_batches fn: append the FULL-RANGE uint64 key hash.  Pair with
    exchange.resolve_exchange + bucket_map_groups(modular=True): the bucket
    count is then derived from materialized bytes instead of hardcoded —
    required for every exchange that ships raw rows."""
    def f(batch: pa.Table) -> pa.Table:
        arr = batch.column(key)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return batch.append_column(bucket_col,
                                   pa.array(SK.hash64_array(arr)))
    return f


_add_bucket = add_bucket_fn  # internal alias (existing call sites)


def _auto_keyed_exchange(bucketed, per_bucket, n_buckets: int | None):
    """Shared tail: bucket count derived from materialized bytes unless
    pinned (exchange.resolve_exchange) — distinct-key partial streams grow
    with the data, so constant counts don't survive 100x."""
    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    mat, nb, max_b = resolve_exchange(bucketed, n_buckets)
    return bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                             max_bucket_bytes=max_b)


def duplicate_keys(ds, key: str, n_buckets: int | None = None):
    """Dataset -> Dataset of (key, dup_count) for keys appearing > 1 time.

    Two-level: per-batch value_counts partials, then a shuffle keyed on a
    COARSE hash bucket with a vectorized pandas aggregation inside each
    bucket.  Grouping directly on the key would give the sort-based
    shuffle millions of distinct groups and per-group overhead dominates;
    bucketing keeps the exchange identical in volume but makes the reduce
    C-speed."""
    import pandas as pd

    partials = ds.select_columns([key]).map_batches(
        partial_key_counts(key), batch_format="pyarrow")
    bucketed = partials.map_batches(add_hash_fn(key), batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key, as_index=False)["cnt"].sum()
        s = s[s["cnt"] > 1].rename(columns={"cnt": "dup_count"})
        return s

    return _auto_keyed_exchange(bucketed, per_bucket, n_buckets)


def exact_distinct_count(ds, key: str, n_buckets: int | None = None) -> int:
    """Exact distinct-key count via bucketed two-level aggregation."""
    import pandas as pd

    partials = ds.select_columns([key]).map_batches(
        partial_key_counts(key), batch_format="pyarrow")
    bucketed = partials.map_batches(add_hash_fn(key), batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [g[key].nunique()]})

    out = _auto_keyed_exchange(bucketed, per_bucket, n_buckets)
    return int(out.to_pandas()["n"].sum())


def distinct_values(ds, key: str, n_buckets: int | None = None):
    """Dataset of the distinct NON-NULL values of ``key``.

    NOTE: SQL ``SELECT DISTINCT`` would keep one NULL row; this drops
    NULLs (the semi-join/EXISTS building-block semantics, where a NULL
    key never matches).  Union a null row explicitly if you need the SQL
    DISTINCT contract on a nullable column.

    Per-batch dedup partials, then a key-hash bucketed exchange with a
    per-bucket dedup — exchange volume is O(distinct per block), and the
    result stays a Dataset (one block per bucket), never a driver list.
    The building block for distributed semi joins and set differences."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column(key)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.table({key: arr.drop_null().unique()})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[[key]].drop_duplicates()

    bucketed = (ds.select_columns([key])
                .map_batches(partial, batch_format="pyarrow")
                .map_batches(add_hash_fn(key), batch_format="pyarrow"))
    return _auto_keyed_exchange(bucketed, per_bucket, n_buckets)


def build_bloom_from_dataset(ds, key: str, n_items_hint: int | None = None,
                             fp_rate: float = 1e-3) -> SK.Bloom:
    """Build a Bloom filter of a (small-side) key set by streaming batches
    to the driver — the referenced set is the dimension side, so this is
    bounded; for a big referenced set, swap in per-block Bloom partials
    merged tree-wise (Bloom.merge is a bitwise or)."""
    n = n_items_hint or max(1024, ds.count())
    bloom = SK.Bloom(n, fp_rate)
    for batch in ds.select_columns([key]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        arr = batch.column(key)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        bloom.add_hashes(SK.hash64_array(arr.drop_null()))
    return bloom


class BloomProbe:
    """Actor stage: flag rows whose key is absent from the broadcast Bloom.

    ``bloom_ref`` is a ``ray.put`` handle — fetched once per actor in
    __init__, NOT re-shipped per batch."""

    def __init__(self, bloom_ref, key: str, out_col: str = "check_ref"):
        self.bloom: SK.Bloom = ray.get(bloom_ref)
        self.key = key
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch.column(self.key)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        null = pc.is_null(arr).to_numpy(zero_copy_only=False)
        # hash64_array maps nulls to a fixed sentinel (any key type);
        # their probe result is masked to False below regardless
        hashes = SK.hash64_array(arr)
        ok = self.bloom.contains_hashes(hashes)
        ok = np.where(null, False, ok)
        return batch.append_column(self.out_col, pa.array(ok))


def grouped_approx_distinct(ds, group: str, key: str, p: int = 12,
                            n_buckets: int | None = None,
                            out: str = "n_distinct_approx"):
    """Approximate COUNT(DISTINCT key) per group via per-group HLL
    sketches — the bounded-memory scale path for grouped distincts.

    The exact path (grouped_distinct_count) shuffles O(distinct pairs);
    with billions of distinct keys per group that exchange is the
    dominant cost.  Here each batch builds one HLL per group it sees
    (2^p bytes each), the pickled sketches shuffle on a group-hash bucket
    (volume = blocks x groups-per-block x 2^p — independent of key
    cardinality), and per-bucket register maxima merge them.  p=12 gives
    ~1.6% relative error."""
    import pickle

    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gval, sub in b[[group, key]].dropna(subset=[key]) \
                .groupby(group, dropna=False):
            h = SK.hash64_array(pa.array(sub[key]))
            rows.append({group: gval,
                         "hll": pickle.dumps(
                             SK.HLL(p).add_hashes(h), protocol=5)})
        return pd.DataFrame(rows, columns=[group, "hll"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outrows = []
        for gval, sub in g.groupby(group, dropna=False):
            acc = None
            for blob in sub["hll"]:
                sk = pickle.loads(blob)
                acc = sk if acc is None else acc.merge(sk)
            outrows.append({group: gval, out: int(round(acc.estimate()))})
        return pd.DataFrame(outrows, columns=[group, out])

    # the sketch stream is blocks x groups x 2^p bytes — key-cardinality-
    # independent but GROUP-cardinality-proportional: auto-size it too
    bucketed = (ds.select_columns([group, key])
                .map_batches(partial, batch_format="pandas")
                .map_batches(add_hash_fn(group), batch_format="pyarrow"))
    return _auto_keyed_exchange(bucketed, per_bucket, n_buckets)


def grouped_distinct_count(ds, group: str, key: str,
                           n_buckets: int | None = None,
                           out: str = "n_distinct"):
    """Exact COUNT(DISTINCT key) per group.

    Per-batch (group, key) dedup partials -> key-hash bucketed exchange
    (a (group, key) pair lands in exactly one bucket, so per-bucket
    nunique partials sum exactly) -> tiny (group, n) rollup.  Exchange
    volume is O(distinct pairs) — which grows with the data, so the
    bucket count is data-derived (resolve_exchange) unless given."""
    import pandas as pd
    import pyarrow as pa

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b[[group, key]].drop_duplicates()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False on the GROUP (SQL keeps the NULL group); nunique
        # still ignores null KEY values, as COUNT(DISTINCT) does
        return (g.drop_duplicates([group, key])
                .groupby(group, as_index=False, dropna=False)[key].nunique()
                .rename(columns={key: out}))

    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    bucketed = (ds.select_columns([group, key])
                .map_batches(partial, batch_format="pandas")
                .map_batches(add_hash_fn(key), batch_format="pyarrow"))
    mat, nb, max_b = resolve_exchange(bucketed, n_buckets)
    parts = bucket_map_groups(mat, per_bucket, n_buckets=nb, modular=True,
                              max_bucket_bytes=max_b).to_pandas()
    return (parts.groupby(group, as_index=False, dropna=False)[out].sum()
            .astype({out: np.int64}))
