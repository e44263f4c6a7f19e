"""Self-check: run every queries() entry against its oracle_sql() via DuckDB
and compare (row count + column names + order-insensitive values) — a local
replica of the driver's correctness gate.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype) in ("Int64", "Int32", "UInt64", "UInt32"):
            # arrow int-with-null round-trips as a pandas extension dtype;
            # normalize to float64 (what DuckDB .df() gives for nullable
            # BIGINT) so both sides hash identically
            df[c] = df[c].astype("float64")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif df[c].dtype == bool or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype(bool)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as RE

    qs = RE.queries()
    oracles = RE.oracle_sql()
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(got)} rows, cols={list(got.columns)}")
            n_rows_only += 1
            continue
        from katydid_haskell_ray.sources.synth_images import images_path_for_sf
        sql = sql.replace(images_path_for_sf("sf0.01"),
                          images_path_for_sf(sf_name))
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        if not problems:
            if not got.equals(exp):
                neq = (got != exp)
                bad_cols = [c for c in got.columns if neq[c].any()] \
                    if not got.empty else []
                problems.append(f"values differ in {bad_cols}")
                for c in bad_cols[:2]:
                    idx = neq[c].idxmax()
                    problems.append(
                        f"  first diff {c}[{idx}]: {got[c][idx]!r} vs {exp[c][idx]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok   {name}: {len(got)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rows_only} rows-only")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
