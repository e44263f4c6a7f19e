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


def _input_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                recursive=True))
    return [path]


def verdict_dataset(images_path, checks=DEFAULT_CHECKS, *,
                    decode_concurrency: int | None = None,
                    check_roundtrip: bool = False,
                    decode_batch_size: int = 512):
    """Build the lazy verdict Dataset (read -> constraints -> decode)."""
    ds = ray.data.read_parquet(images_path)
    ds = ds.map_batches(FlatConstraints(checks), batch_format="pyarrow")
    if decode_concurrency is None:
        import ray as _ray
        # decode dominates compute: size the pool to the node, leaving head-
        # room for the read + write stages so the pipeline stays streaming
        cpus = int(_ray.cluster_resources().get("CPU", 4))
        decode_concurrency = max(2, cpus - 2)
    ds = ds.map_batches(
        DecodeValidator, fn_constructor_kwargs={"check_roundtrip": check_roundtrip},
        batch_format="pyarrow", batch_size=decode_batch_size,
        concurrency=decode_concurrency, num_cpus=1,
    )
    check_cols = [f"check_{n}" for n, _ in checks] + [
        "check_decodes", "check_dims", "check_fmt_magic", "check_phash"]
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


def run_validation(images_path: str, out_dir: str, *,
                   checks=DEFAULT_CHECKS, n_shards: int = 4,
                   resume: bool = True, profile: dict | None = None,
                   drift_threshold: float = 0.1,
                   check_roundtrip: bool = False,
                   decode_concurrency: int | None = None) -> dict:
    """Run the full validation; returns the summary report dict.

    Resumable: re-invoking with the same out_dir skips shards whose manifest
    records are complete and recomputes the report from all shards' verdict
    parquet.
    """
    t0 = time.time()
    files = _input_files(images_path)
    shards = M.split_shards(files, n_shards)
    done = M.completed_shards(out_dir) if resume else {}
    os.makedirs(out_dir, exist_ok=True)

    for sid, shard_files in enumerate(shards):
        if sid in done:
            continue
        started = time.time()
        M.clear_shard_output(out_dir, sid)
        vds = verdict_dataset(shard_files, checks,
                              decode_concurrency=decode_concurrency,
                              check_roundtrip=check_roundtrip)
        shard_out = M.shard_output_dir(out_dir, sid)
        vds.write_parquet(shard_out)
        # cheap columnar pass over the verdict parquet for counts
        vparq = ray.data.read_parquet(shard_out, columns=["pass"])
        n_rows = vparq.count()
        n_fail = n_rows - int(vparq.sum("pass") or 0)
        M.write_shard_record(out_dir, sid, input_files=shard_files,
                             n_rows=n_rows, n_violations=n_fail,
                             metrics={}, started=started)

    # ---- table-level layer over all shards' verdict parquet ----
    verdict_glob = [f for sid in range(len(shards))
                    for f in _input_files(M.shard_output_dir(out_dir, sid))]
    meta_cols = ["image_id", "w", "h", "fmt", "phash", "pass"]
    vds = ray.data.read_parquet(verdict_glob, columns=meta_cols)

    partials_tab = pa.concat_tables(list(vds.map_batches(
        ST.StatsPartials(numeric=("w", "h"), keys=("image_id", "phash"),
                         strings=("fmt",)),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow")))
    stats = ST.merge_partials(partials_tab)

    dup_ids = K.duplicate_keys(vds, "image_id")
    n_dup_ids = dup_ids.count()
    dup_phash = K.duplicate_keys(vds, "phash")
    hot = dup_phash.sort("dup_count", descending=True).take(5)

    drift = (ST.drift_against(stats, profile, drift_threshold)
             if profile else None)

    full = ray.data.read_parquet(verdict_glob)
    viols = full.map_batches(lambda b: extract_violations(b),
                             batch_format="pyarrow")
    viols.write_parquet(os.path.join(out_dir, "violations"))
    n_viol_rows = ray.data.read_parquet(
        os.path.join(out_dir, "violations")).count()

    n_rows = sum(r["n_rows"] for r in M.completed_shards(out_dir).values())
    n_fail = sum(r["n_violations"] for r in M.completed_shards(out_dir).values())
    report = {
        "n_rows": n_rows,
        "n_pass": n_rows - n_fail,
        "n_fail": n_fail,
        "n_dup_image_ids": n_dup_ids,
        "hot_phash_top5": [{"phash": r["phash"], "dup_count": r["dup_count"]}
                           for r in hot],
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
