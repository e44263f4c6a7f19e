"""Per-partition lineage + metrics manifest for checkpointed, resumable runs.

The reference has no checkpointing (SURVEY.md §4); the north rule requires
"resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule).  Design:

- The driver splits input files into shards (one shard = one resumable unit
  = one output directory ``out_dir/shard=<i>/``).
- Each completed shard writes ``out_dir/manifest/shard-<i>.json`` ATOMICALLY
  (tmp + rename) containing lineage (input files, row counts) and metrics
  (violations, stats-partial summary, wall time).
- On resume, completed shard ids are skipped; a killed run redoes at most
  one shard per concurrent writer.

At 100 TB the shard count is a small multiple of cluster size, so manifest
I/O is negligible while bounding lost work on failure.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def shard_key(files: list[str]) -> str:
    """CONTENT identity of a shard — a hash of its (sorted-stable) input
    file list.  Keying outputs and manifest records by content instead of
    position makes resume append-friendly: adding new input files creates
    NEW shard keys while every existing shard's record and output stay
    valid (a positional id would shift and invalidate them).  80 bits: at
    the documented 400k-shard scale (and even 10^8 incremental shards)
    birthday collisions are < 1e-8."""
    import hashlib
    return hashlib.sha1("\n".join(files).encode()).hexdigest()[:20]


def _fmt(shard_id) -> str:
    # the pipeline passes string content keys; the int branch remains for
    # direct/legacy callers and tests that address shards positionally
    return f"{shard_id:05d}" if isinstance(shard_id, int) else str(shard_id)


def shard_record_path(out_dir: str, shard_id) -> str:
    return os.path.join(manifest_dir(out_dir), f"shard-{_fmt(shard_id)}.json")


def completed_shards(out_dir: str) -> dict:
    """Shard id/key -> manifest record for all completed shards (ids are
    content-key strings from run_validation; ints from legacy callers)."""
    d = manifest_dir(out_dir)
    out = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if name.startswith("shard-") and name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
                if rec.get("status") == "done":
                    out[rec["shard_id"]] = rec
            except (json.JSONDecodeError, KeyError, OSError):
                continue  # torn write: treat as not-done, shard will be redone
    return out


def write_shard_record(out_dir: str, shard_id, *, input_files: list[str],
                       n_rows: int, n_violations: int, metrics: dict,
                       started: float) -> dict:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    rec = {
        "shard_id": shard_id,
        "status": "done",
        "input_files": input_files,
        "n_rows": n_rows,
        "n_violations": n_violations,
        "metrics": metrics,
        "started_unix": started,
        "finished_unix": time.time(),
        "wall_s": round(time.time() - started, 3),
    }
    path = shard_record_path(out_dir, shard_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)  # atomic publish
    return rec


def clear_shard_output(out_dir: str, shard_id):
    """Remove a shard's (possibly partial) output before re-running it."""
    shard_out = shard_output_dir(out_dir, shard_id)
    if os.path.isdir(shard_out):
        shutil.rmtree(shard_out)


def shard_output_dir(out_dir: str, shard_id) -> str:
    return os.path.join(out_dir, f"shard={_fmt(shard_id)}")


def prune_stale(out_dir: str, current_ids) -> int:
    """Delete shard outputs and manifest records whose id/key is not in
    the CURRENT split — stale leftovers from a previous run with a
    different sharding.  Totals and the table-level layer only read
    current ids, so pruning is a disk-hygiene step, not a correctness
    one.  Returns the number of entries removed."""
    keep = {_fmt(i) for i in current_ids}
    removed = 0
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("shard=") and name.split("=", 1)[1] not in keep:
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
                removed += 1
    md = manifest_dir(out_dir)
    if os.path.isdir(md):
        for name in os.listdir(md):
            if name.startswith("shard-") and name.endswith(".json.tmp"):
                # torn write_shard_record leftovers: always safe to drop
                try:
                    os.remove(os.path.join(md, name))
                    removed += 1
                except OSError:
                    pass
            elif (name.startswith("shard-") and name.endswith(".json")
                    and name[len("shard-"):-len(".json")] not in keep):
                try:
                    os.remove(os.path.join(md, name))
                    removed += 1
                except OSError:
                    pass
    return removed


def split_shards(files: list[str], n_shards: int) -> list[list[str]]:
    """Deterministic round-robin split of input files into shards."""
    n_shards = max(1, min(n_shards, len(files)))
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(sorted(files)):
        shards[i % n_shards].append(f)
    return shards
