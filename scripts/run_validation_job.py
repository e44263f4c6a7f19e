"""Cluster entry point for the validation pipeline.

Submit to a Ray cluster (the north rule's launch mode)::

    ray job submit --working-dir . -- \
        python scripts/run_validation_job.py \
        --input /data/images_parquet --out /data/validation_out \
        [--resume] [--roundtrip] [--profile /data/profile.json]

Locally (this sandbox) it starts a local session instead.  The module
guards ray.init so it also works when a session already exists (e.g. under
``ray job submit``, where the job driver is pre-connected).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="images parquet file/dir")
    ap.add_argument("--out", required=True, help="output/checkpoint dir")
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--roundtrip", action="store_true",
                    help="enable the PSNR>=40dB re-encode check")
    ap.add_argument("--profile", default=None,
                    help="reference profile JSON for drift detection")
    ap.add_argument("--shard-bytes", type=int, default=1 << 30)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from katydid_haskell_ray.pipelines.validate import run_validation

    profile = None
    if args.profile:
        with open(args.profile) as f:
            profile = json.load(f)

    report = run_validation(args.input, args.out, resume=args.resume,
                            check_roundtrip=args.roundtrip,
                            target_shard_bytes=args.shard_bytes,
                            profile=profile)
    print(json.dumps({k: v for k, v in report.items() if k != "profile"},
                     default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
