"""Flagship pipeline: full validation of an image+caption table.

Re-expresses the reference's ``Relapse.filter`` bulk path
(/root/reference/src/Data/Katydid/Relapse/Relapse.hs:65-70) as a streaming
Ray Data pipeline over the input_hint table, wrapped with the north-rule
table-level layer:

    read_parquet (pruned columns)
      -> FlatConstraints           (stateless vectorized map_batches)
      -> DecodeValidator           (actor pool; bytes never leave this stage)
      -> drop bytes, write verdict parquet per shard      [resumable unit]
    verdict parquet (cheap columnar re-reads, no binary payload):
      -> StatsPartials + merge     (min/max/null-rate/HLL/KLL — no shuffle)
      -> duplicate_keys            (pre-aggregated groupby — the one shuffle)
      -> drift_against profile     (KLL quantile deltas)
      -> extract_violations        (long-form violation rows)
    manifest: per-shard lineage + metrics, atomic, resume skips done shards.

Default constraint set (spec.py DSL over F1 columns): the FIXTURES.md F4
comparison/string/length/membership shapes.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow as pa
import ray.data


def _stub_fsspec_http():
    """Ray's path resolution does ``from fsspec.implementations.http import
    HTTPFileSystem`` per read; when aiohttp is absent that import fails with
    ModuleNotFoundError every time, and two threads hitting the first import
    simultaneously can observe a partially-initialized module (a plain
    ImportError Ray does not catch).  Install a placeholder module once so
    the import always succeeds and the isinstance check simply never
    matches."""
    import sys
    import types
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        try:
            import fsspec.implementations as fi
        except ImportError:
            return
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder; never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
        fi.http = mod


_stub_fsspec_http()

from katydid_haskell_ray.stages.constraint import FlatConstraints, extract_violations
from katydid_haskell_ray.stages.decode import DecodeValidator
from katydid_haskell_ray.stages import keys as K
from katydid_haskell_ray.stages import stats as ST
from katydid_haskell_ray.state import manifest as M

# FIXTURES.md F4 shapes 1-4 as flat column checks
DEFAULT_CHECKS: list[tuple[str, dict]] = [
    ("w_pos", {"op": ">=", "col": "w", "value": {"int": 1}}),
    ("w_max", {"op": "<=", "col": "w", "value": {"int": 16384}}),
    ("h_pos", {"op": ">=", "col": "h", "value": {"int": 1}}),
    ("h_max", {"op": "<=", "col": "h", "value": {"int": 16384}}),
    ("phash_nonzero", {"op": "!=", "col": "phash", "value": {"int": 0}}),
    ("fmt_known", {"func": "contains",
                   "args": [{"col": "fmt", "type": "string"},
                            {"list_string": ["png", "bmp", "jpeg"]}]}),
    ("caption_present", {"func": "gt",
                         "args": [{"func": "length",
                                   "args": [{"col": "caption", "type": "string"}]},
                                  {"int": 0}]}),
    ("caption_len", {"func": "le",
                     "args": [{"func": "length",
                               "args": [{"col": "caption", "type": "string"}]},
                              {"int": 256}]}),
    ("caption_ascii", {"op": "~=", "col": "caption",
                       "value": {"string": "^[ -~]*$"}}),
    ("bytes_min", {"func": "gt",
                   "args": [{"func": "length",
                             "args": [{"col": "bytes", "type": "bytes"}]},
                            {"int": 8}]}),
]

VERDICT_KEEP = ["image_id", "w", "h", "fmt", "phash"]

# Metadata-only subset: every check a pipeline can run WITHOUT scanning the
# image payload.  At 100-TB scale the metadata columns are ~1% of the table
# bytes — constraint queries that never decode pixels must read only these
# (the byte-level checks live in the decode pass, which reads ``bytes`` by
# necessity).  Kept in lockstep with DEFAULT_CHECKS: the split is "does the
# check reference the ``bytes`` column".
METADATA_COLUMNS = ["image_id", "w", "h", "fmt", "phash", "caption"]
METADATA_CHECKS: list[tuple[str, dict]] = [
    (name, spec) for name, spec in DEFAULT_CHECKS if name != "bytes_min"]

# Relapse grammar over the input_hint schema — evaluated per row via the
# column-plan compiler inside the verdict pass (check_grammar column).
# Interleave of per-column leaf patterns with boolean closure; the caption
# pattern exercises negation + the null-as-empty-forest rule.
IMAGES_GRAMMAR = {"main": {"interleave": [
    {"field": "image_id", "child": {"leaf": {"op": "^=", "value": {"string": "img-"}}}},
    {"field": "bytes", "child": {"leaf": {
        "func": "gt", "args": [{"func": "length", "args": [{"var": "bytes"}]},
                               {"int": 8}]}}},
    {"field": "w", "child": {"and": [
        {"leaf": {"op": ">=", "value": {"int": 1}}},
        {"leaf": {"op": "<=", "value": {"int": 16384}}},
    ]}},
    {"field": "h", "child": {"and": [
        {"leaf": {"op": ">=", "value": {"int": 1}}},
        {"leaf": {"op": "<=", "value": {"int": 16384}}},
    ]}},
    {"field": "fmt", "child": {"or": [
        {"leaf": {"op": "==", "value": {"string": "png"}}},
        {"leaf": {"op": "==", "value": {"string": "bmp"}}},
        {"leaf": {"op": "==", "value": {"string": "jpeg"}}},
    ]}},
    {"field": "caption", "child": {"not": {"or": [
        {"leaf": {"op": "==", "value": {"string": ""}}},
        "empty",
    ]}}},
    {"field": "phash", "child": {"leaf": {"op": "!=", "value": {"int": 0}}}},
]}}

# Metadata-only grammar twin: IMAGES_GRAMMAR minus the ``bytes`` field, with
# a trailing zany-star absorbing columns the grammar does not constrain.
# Evaluating this over a bytes-pruned projection gives identical verdicts to
# IMAGES_GRAMMAR's metadata conjuncts while never shipping the payload.
IMAGES_META_GRAMMAR = {"main": {"interleave": (
    [f for f in IMAGES_GRAMMAR["main"]["interleave"]
     if f.get("field") != "bytes"] + [{"star": "zany"}]
)}}


def _input_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                recursive=True))
    return [path]


_DECODER_CACHE: dict = {}


def _decode_fn(check_roundtrip: bool, lut_ref=None):
    """Task-based decode stage; the validator is cached once per worker
    process (the stateful-setup-amortization without an actor pool).
    ``lut_ref`` is the node-shared jpeg Huffman LUT (see
    ``stages.decode.shared_jpeg_lut_ref``)."""
    def f(batch):
        dv = _DECODER_CACHE.get(check_roundtrip)
        if dv is None:
            dv = _DECODER_CACHE[check_roundtrip] = DecodeValidator(
                check_roundtrip=check_roundtrip, lut_ref=lut_ref)
        return dv(batch)
    return f


def verdict_dataset(images_path, checks=DEFAULT_CHECKS, *,
                    grammar: dict | None = IMAGES_GRAMMAR,
                    caption_vocab=None,
                    decode_concurrency=None,
                    check_roundtrip: bool = False,
                    decode_batch_size: int = 6144):
    """Build the lazy verdict Dataset (read -> grammar+constraints -> decode).

    decode_batch_size 6144 (was 2048): the jpeg entropy pass decodes
    SIMD-across-streams, so its per-symbol interpreter overhead amortizes
    with batch width (266 vs 350 us/row measured); ~25 MB of rows+pixels
    per in-flight task, well inside worker heap.

    ``grammar`` (a spec-DSL document) is validated per row via the
    column-plan compiler (vectorized; automatic tree-path fallback) and
    contributes a ``check_grammar`` column.

    ``caption_vocab`` (iterable of tokens) enables the referential check:
    every caption token must be in the vocabulary (broadcast set semi-join,
    ``check_caption_ref`` column; swap in stages.keys.BloomProbe when the
    reference set outgrows the driver).

    The decode pool autoscales (2, cpus-2): it gets the node when it's the
    bottleneck but releases CPUs to the read/write stages as it drains, so
    no stage starves (a fixed full-size pool serializes the write)."""
    ds = ray.data.read_parquet(images_path)
    if grammar is not None:
        def grammar_check(batch: pa.Table) -> pa.Table:
            from katydid_haskell_ray import colplan as CP
            from katydid_haskell_ray import spec as SP
            g = SP.compile_spec(grammar)  # interning makes re-compiles cheap
            mask = CP.validate_batch(g, batch)
            return batch.append_column("check_grammar", pa.array(mask))
        ds = ds.map_batches(grammar_check, batch_format="pyarrow")
    ds = ds.map_batches(FlatConstraints(checks), batch_format="pyarrow")
    if caption_vocab is not None:
        vocab_ref = ray.put(frozenset(caption_vocab))

        class CaptionRef:
            def __init__(self):
                self.vocab = ray.get(vocab_ref)

            def __call__(self, b):
                import pandas as _pd
                caps = _pd.Series(b.column("caption").to_pylist())
                toks = caps.str.split(" ").explode()
                bad = (~toks.isin(self.vocab)).groupby(level=0).any()
                ok = (~bad).reindex(caps.index, fill_value=False)
                ok &= caps.notna()
                return b.append_column("check_caption_ref",
                                       pa.array(ok.to_numpy(dtype=bool)))

        from katydid_haskell_ray.stages.util import auto_concurrency
        ds = ds.map_batches(CaptionRef, batch_format="pyarrow",
                            concurrency=auto_concurrency(None))
    if decode_concurrency is None:
        # stateless tasks on the warm worker pool: the decoder holds no real
        # per-actor state (codecs are module functions cached per process),
        # so tasks beat an actor pool — no pool spawn cost, fully elastic.
        # Pass an int to force an actor pool (e.g. a real model-loading
        # decoder would want one).
        from katydid_haskell_ray.stages.decode import shared_jpeg_lut_ref
        ds = ds.map_batches(
            _decode_fn(check_roundtrip, lut_ref=shared_jpeg_lut_ref()),
            batch_format="pyarrow",
            batch_size=decode_batch_size,
        )
    else:
        from katydid_haskell_ray.stages.decode import shared_jpeg_lut_ref
        ds = ds.map_batches(
            DecodeValidator,
            fn_constructor_kwargs={"check_roundtrip": check_roundtrip,
                                   "lut_ref": shared_jpeg_lut_ref()},
            batch_format="pyarrow", batch_size=decode_batch_size,
            concurrency=decode_concurrency, num_cpus=1,
        )
    check_cols = [f"check_{n}" for n, _ in checks] + [
        "check_decodes", "check_dims", "check_fmt_magic", "check_phash"]
    if grammar is not None:
        check_cols.append("check_grammar")
    if caption_vocab is not None:
        check_cols.append("check_caption_ref")
    if check_roundtrip:
        check_cols.append("check_roundtrip")

    def finalize(batch: pa.Table) -> pa.Table:
        import numpy as np
        overall = np.ones(batch.num_rows, dtype=bool)
        for c in check_cols:
            overall &= batch.column(c).combine_chunks().fill_null(False).to_numpy(
                zero_copy_only=False).astype(bool)
        keep = VERDICT_KEEP + check_cols + ["eval_err", "decode_err"]
        out = batch.select([c for c in keep if c in batch.column_names])
        return out.append_column("pass", pa.array(overall))

    return ds.map_batches(finalize, batch_format="pyarrow")


def _parquet_num_rows(files: list[str]) -> int:
    """Row count from parquet footers — driver-side, no Ray job."""
    import pyarrow.parquet as pq
    return sum(pq.read_metadata(f).num_rows for f in files)


def run_validation(images_path: str, out_dir: str, *,
                   checks=DEFAULT_CHECKS, n_shards: int | None = None,
                   target_shard_bytes: int = 1 << 30,
                   resume: bool = True, profile: dict | None = None,
                   drift_threshold: float = 0.1,
                   check_roundtrip: bool = False,
                   caption_vocab=None,
                   decode_concurrency: int | None = None,
                   incremental: bool = False) -> dict:
    """Run the full validation; returns the summary report dict.

    Resumable: re-invoking with the same out_dir skips shards whose manifest
    records are complete and recomputes the report from all shards' verdict
    parquet.  Shards are keyed by CONTENT (hash of the file list);
    ``incremental=True`` keeps committed shards verbatim and groups only
    not-yet-covered files into new byte-sized shards, so an append-only
    input dir re-processes just the new bytes each run (micro-batch
    ingestion without per-file job overhead).

    Shard sizing: by input BYTES (default 256 MiB per shard), not a fixed
    count — at 100 TB that yields ~400k resumable units whose per-job fixed
    cost amortizes; at test scale it collapses to 1-2 shards so fixed
    overhead doesn't dominate.  ``n_shards`` overrides for tests.
    """
    import pyarrow.parquet as pq

    t0 = time.time()
    files = _input_files(images_path)
    if not files:
        # refuse rather than prune: a transiently-empty listing (unmounted
        # store, typo'd dir) must never wipe completed shard state
        raise ValueError(f"no input files found under {images_path!r}")
    if incremental:
        if n_shards is not None:
            raise ValueError("incremental=True sizes shards itself; "
                             "omit n_shards")
        # micro-batch ingestion over an append-only dir: shards already
        # committed (record's files all still present) are KEPT verbatim —
        # their content keys stay valid — and only files not covered by a
        # kept record are grouped into new byte-sized shards.  Appending
        # files therefore processes just the new bytes; deleting a file
        # invalidates exactly the shards that contained it.
        prior = M.completed_shards(out_dir) if resume else {}
        fileset = set(files)
        shards = []
        covered: set[str] = set()
        for rec in prior.values():
            grp = rec.get("input_files") or []
            if grp and set(grp) <= fileset and not (set(grp) & covered):
                shards.append(grp)
                covered |= set(grp)
        new_files = sorted(f for f in fileset - covered)
        if new_files:
            total = sum(os.path.getsize(f) for f in new_files)
            n_new = max(1, min(len(new_files),
                               -(-total // target_shard_bytes)))
            shards += M.split_shards(new_files, n_new)
    else:
        if n_shards is None:
            total = sum(os.path.getsize(f) for f in files)
            n_shards = max(1, min(len(files), -(-total // target_shard_bytes)))
        shards = M.split_shards(files, n_shards)
    keys = [M.shard_key(sf) for sf in shards]
    by_key = dict(zip(keys, shards))
    # A shard is resumable ONLY when its recorded lineage matches the current
    # split; shards are keyed by CONTENT (hash of the file list), so a
    # re-sharding produces new keys (recompute) while unchanged groups keep
    # their records even if other files were added or removed.
    completed = M.completed_shards(out_dir) if resume else {}
    done = {k for k in keys
            if completed.get(k, {}).get("input_files") == by_key[k]}
    os.makedirs(out_dir, exist_ok=True)
    M.prune_stale(out_dir, keys)

    def run_shard(sid: str, shard_files: list[str]):
        started = time.time()
        M.clear_shard_output(out_dir, sid)
        vds = verdict_dataset(shard_files, checks,
                              decode_concurrency=decode_concurrency,
                              caption_vocab=caption_vocab,
                              check_roundtrip=check_roundtrip)
        shard_out = M.shard_output_dir(out_dir, sid)
        # one file per block: at production block size (128 MiB) files come
        # out right-sized; forcing min_rows_per_file makes Ray coalesce the
        # whole map+write into one serial task — never do that
        vds.write_parquet(shard_out)
        # counts from the shard's own output: rows from footers (free),
        # fails from the tiny bool column read driver-side — no Ray job
        out_files = _input_files(shard_out)
        n_rows = _parquet_num_rows(out_files)
        passed = pq.read_table(out_files, columns=["pass"]).column("pass")
        n_fail = n_rows - int(passed.combine_chunks().sum().as_py() or 0)
        wall = time.time() - started
        M.write_shard_record(out_dir, sid, input_files=shard_files,
                             n_rows=n_rows, n_violations=n_fail,
                             metrics={"rows_per_sec": round(n_rows / max(wall, 1e-9), 1),
                                      "n_output_files": len(out_files)},
                             started=started)

    # run shard jobs concurrently (bounded): the streaming executor fair-
    # shares the cluster, so per-job fixed latency overlaps instead of
    # accumulating serially; the manifest stays per-shard atomic
    todo = [(k, sf) for k, sf in zip(keys, shards) if k not in done]
    if len(todo) <= 1:
        for sid, sf in todo:
            run_shard(sid, sf)
    else:
        from concurrent.futures import ThreadPoolExecutor
        # pool covers all pending shards (cap 8): a pool smaller than the
        # shard count leaves a straggler running alone after the wave
        with ThreadPoolExecutor(max_workers=min(8, len(todo))) as pool:
            list(pool.map(lambda a: run_shard(*a), todo))

    # ---- table-level layer over all shards' verdict parquet ----
    # ONE pass computes stats partials AND per-batch key counts; the tiny
    # tagged partial stream is materialized once, then the stats merge
    # (driver) and the uniqueness groupby (shuffle of partials only) both
    # read from it — no re-read of the verdict parquet per check.
    verdict_glob = [f for k in keys
                    for f in _input_files(M.shard_output_dir(out_dir, k))]
    import pyarrow.dataset as _pads
    check_cols = [f.name for f in _pads.dataset(verdict_glob[0]).schema
                  if f.name.startswith("check_")]
    meta_cols = ["image_id", "w", "h", "fmt", "phash", "pass"] + check_cols
    vds = ray.data.read_parquet(verdict_glob, columns=meta_cols)

    stats_fn = ST.StatsPartials(numeric=("w", "h"), keys=("image_id", "phash"),
                                strings=("fmt",))

    def combined(batch: pa.Table) -> pa.Table:
        """One pass -> a SLIM tagged partial stream: the key-count rows
        (~one per distinct key per batch) carry only (kind, key:int64, cnt);
        the few stats rows ride along as pickled blobs.  The stream schema
        must stay thin — it is ~n_rows long for high-cardinality keys and
        everything after this flows through the shuffle."""
        import io
        import pickle

        srows_tab = stats_fn(batch)
        blob = pickle.dumps(srows_tab.to_pylist(), protocol=5)
        # violation rows ride along as one IPC blob per batch: saves a full
        # re-read of the verdict parquet for the violations sink
        viol_tab = extract_violations(batch)
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, viol_tab.schema) as wr:
            wr.write_table(viol_tab)
        parts = [pa.table({
            "kind": pa.array(["stat", "viol"]),
            "key": pa.nulls(2, pa.int64()),
            "cnt": pa.nulls(2, pa.int64()),
            "blob": pa.array([blob, sink.getvalue()], type=pa.binary()),
        })]
        for keycol in ("image_id", "phash"):
            arr = batch.column(keycol)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.drop_null()
            # shuffle int64 hashes, not strings: dup DETECTION only needs
            # key identity (64-bit collisions are negligible), and the
            # integer groupby is much cheaper than a string one
            if not pa.types.is_integer(arr.type):
                import numpy as _np

                from katydid_haskell_ray.state.sketches import hash64_array
                arr = pa.array(hash64_array(arr).view(_np.int64))
            vc = arr.value_counts()
            parts.append(pa.table({
                "kind": pa.array([keycol] * len(vc)),
                "key": vc.field("values").cast(pa.int64()),
                "cnt": vc.field("counts").cast(pa.int64()),
                "blob": pa.nulls(len(vc), pa.binary()),
            }))
        return pa.concat_tables(parts)

    partials = vds.map_batches(combined, batch_format="pyarrow").materialize()

    # violations sink: unpack the IPC blobs from the materialized partial
    # stream (no second scan of the verdict parquet)
    import shutil as _shutil
    _shutil.rmtree(os.path.join(out_dir, "violations"), ignore_errors=True)

    def unpack_viols(batch: pa.Table) -> pa.Table:
        import io as _io
        tabs = [pa.ipc.open_stream(_io.BytesIO(b)).read_all()
                for b in batch.column("blob").to_pylist()]
        if not tabs:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "check": pa.array([], type=pa.string())})
        return pa.concat_tables(tabs)

    (partials.filter(expr="kind == 'viol'").select_columns(["blob"])
     .map_batches(unpack_viols, batch_format="pyarrow")
     .write_parquet(os.path.join(out_dir, "violations")))

    import pickle as _pickle

    def merge_stat_blobs(batch: pa.Table) -> pa.Table:
        """First reduce level INSIDE Ray: each block of per-batch stat blobs
        collapses to one merged raw-state blob, so the driver only ever sees
        O(blocks / batch_size) states, never the full partial stream (north
        star: sketches merge via tree-reduce aggregation)."""
        states = [ST.merge_partials(pa.Table.from_pylist(
                      _pickle.loads(b), schema=ST.PARTIAL_SCHEMA),
                      finalize=False)
                  for b in batch.column("blob").to_pylist()]
        if not states:
            return pa.table({"blob": pa.array([], type=pa.binary())})
        acc = states[0]
        for s in states[1:]:
            acc = ST.merge_stats(acc, s)
        return pa.table({"blob": pa.array([_pickle.dumps(acc, protocol=5)],
                                          type=pa.binary())})

    from katydid_haskell_ray.state.reduce import tree_reduce
    states = [_pickle.loads(b)
              for bt in (partials.filter(expr="kind == 'stat'")
                         .select_columns(["blob"])
                         .map_batches(merge_stat_blobs, batch_format="pyarrow",
                                      batch_size=4096)
                         .iter_batches(batch_format="pyarrow"))
              for b in bt.column("blob").to_pylist()]
    stats = (ST.finalize_stats(tree_reduce(states, ST.merge_stats))
             if states else {})

    # bucketed two-level dup aggregation (see stages.keys.duplicate_keys):
    # coarse bucketed shuffle + pandas reduce per bucket — grouping on the
    # raw key would hand the shuffle millions of groups; the (key, cnt)
    # partial stream grows with distinct keys, so the bucket count is
    # data-derived (exchange.resolve_exchange)
    import pandas as _pd

    def _bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column("key").to_numpy(zero_copy_only=False)
             .view("uint64"))
        return batch.append_column("bucket", pa.array(b))

    def _per_bucket(g: _pd.DataFrame) -> _pd.DataFrame:
        s = g.groupby(["kind", "key"], as_index=False)["cnt"].sum()
        return s[s["cnt"] > 1].rename(columns={"cnt": "dup_count"})

    from katydid_haskell_ray.stages.exchange import (
        bucket_map_groups, resolve_exchange)
    _mat, _nb, _max = resolve_exchange(
        partials.filter(expr="kind != 'stat'")
        .select_columns(["kind", "key", "cnt"])
        .map_batches(lambda b: b.filter(
            pa.compute.is_valid(b.column("key"))),
            batch_format="pyarrow")
        .map_batches(_bucket, batch_format="pyarrow"))
    # the dup-key stream stays a Dataset: dups are anomalies on healthy
    # data but UNBOUNDED on an adversarial all-duplicate input, so the
    # full list goes to a parquet sink and the driver pulls only a count
    # plus the top-5 hot keys (r3 verdict #6 — no unbounded to_pandas)
    key_counts = bucket_map_groups(
        _mat, _per_bucket, n_buckets=_nb, bucket_col="bucket",
        modular=True, max_bucket_bytes=_max).materialize()
    _shutil.rmtree(os.path.join(out_dir, "dup_keys"), ignore_errors=True)
    key_counts.write_parquet(os.path.join(out_dir, "dup_keys"))

    def _dup_summary(t: pa.Table) -> _pd.DataFrame:
        # ONE bounded per-block partial for everything the report needs:
        # per-kind dup counts (key=null rows) + the block's top-5 hot
        # phashes — driver sees O(blocks x 7) rows, never the key list
        df = t.to_pandas()
        cnt = (df.groupby("kind", as_index=False).size()
               .rename(columns={"size": "n"}))
        cnt["key"] = _pd.array([None] * len(cnt), dtype="Int64")
        cnt["dup_count"] = _pd.array([None] * len(cnt), dtype="Int64")
        top = df[df["kind"] == "phash"].nlargest(5, "dup_count")[
            ["kind", "key", "dup_count"]].copy()
        top["n"] = _pd.array([None] * len(top), dtype="Int64")
        return _pd.concat([cnt[["kind", "key", "dup_count", "n"]], top],
                          ignore_index=True)

    summary = key_counts.map_batches(
        _dup_summary, batch_format="pyarrow").to_pandas()
    n_dup_ids = int(summary.loc[summary["key"].isna()
                                & (summary["kind"] == "image_id"),
                                "n"].sum())
    hot_df = summary[summary["key"].notna()].nlargest(5, "dup_count")
    hot = [{"phash": int(r["key"]), "dup_count": int(r["dup_count"])}
           for _, r in hot_df.iterrows()]

    drift = (ST.drift_against(stats, profile, drift_threshold)
             if profile else None)

    n_viol_rows = _parquet_num_rows(
        _input_files(os.path.join(out_dir, "violations")))

    # restrict the summation to the CURRENT split's shard keys — stale
    # manifests from a previous run with a different sharding must not
    # leak into the totals (prune_stale also removed them from disk)
    key_set = set(keys)
    final = {sid: r for sid, r in M.completed_shards(out_dir).items()
             if sid in key_set}
    n_rows = sum(r["n_rows"] for r in final.values())
    n_fail = sum(r["n_violations"] for r in final.values())
    report = {
        "n_rows": n_rows,
        "n_pass": n_rows - n_fail,
        "n_fail": n_fail,
        "n_dup_image_ids": n_dup_ids,
        "hot_phash_top5": hot,
        "n_violation_rows": n_viol_rows,
        "stats": {c: {k: v for k, v in s.items() if k not in ("hll", "kll")}
                  for c, s in stats.items()},
        "profile": ST.profile_of(stats),
        "drift": drift,
        "wall_s": round(time.time() - t0, 3),
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, default=str)
    return report
