"""Relapse CLI — the reference executable's UX, plus the bulk Dataset path.

The reference app (/root/reference/app/Main.hs) is a single-document
demo: parse a concrete-syntax grammar, decode a JSON document, print the
verdict.  This CLI mirrors that exactly AND exposes the engine's actual
surface — bulk validate/filter over parquet tables via the Dataset-level
api (katydid_haskell_ray/api.py):

    # single document (the reference app shape; no Ray session needed)
    python scripts/relapse_cli.py validate \
        --grammar '.DragonsExist == true' \
        --json '{"DragonsExist": false}'

    # bulk: add per-row verdicts / keep matching rows of a parquet table
    python scripts/relapse_cli.py validate --grammar 'k:-> ge($int, 10)' \
        --input events.parquet --json-col props --out /tmp/verdicts
    python scripts/relapse_cli.py filter --grammar '{caption: ~= "^[a-z ]+$"; (*)*}' \
        --input images.parquet --out /tmp/kept
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["validate", "filter"])
    ap.add_argument("--grammar", required=True,
                    help="concrete Relapse syntax (Parser.hs dialect)")
    ap.add_argument("--json", default=None,
                    help="one JSON document (single-doc mode)")
    ap.add_argument("--input", default=None, help="parquet file/dir (bulk)")
    ap.add_argument("--json-col", default=None,
                    help="treat this column as a JSON document per row; "
                         "default: validate the flat row itself")
    ap.add_argument("--out", default=None,
                    help="bulk output parquet dir (default: print summary)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    if (args.json is None) == (args.input is None):
        ap.error("exactly one of --json / --input is required")

    if args.json is not None:
        # single-document path — pure library, no Ray session
        from katydid_haskell_ray import derive as D
        from katydid_haskell_ray import relapse_parser as RP
        from katydid_haskell_ray import trees as T
        try:
            g = RP.compile_relapse(args.grammar)
            verdict = D.MemDeriver(g).validate(T.json_to_forest(args.json))
        except Exception as e:  # the reference prints "error:<err>"
            print(f"error:{e}")
            return 1
        # Main.hs:10-13 strings, verbatim
        print("dragons exist" if verdict else "dragons are fictional")
        return 0

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from katydid_haskell_ray import api

    ds = ray.data.read_parquet(args.input)
    if args.mode == "validate":
        out = api.validate(ds, args.grammar, json_col=args.json_col)
    else:
        out = api.filter(ds, args.grammar, json_col=args.json_col)
    if args.out:
        out.write_parquet(args.out)
        print(f"wrote {out.count()} rows to {args.out}")
    else:
        n = out.count()
        if args.mode == "validate":
            # 'pass' is a python keyword Ray's expr parser rejects
            npass = int(out.map_batches(
                lambda b: {"n": [int(b["pass"].sum())]},
                batch_format="pandas").to_pandas()["n"].sum())
            print(f"{npass}/{n} rows pass")
        else:
            print(f"{n} rows match")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
