"""Deterministic synthetic image+caption table (FIXTURES.md F1 / input_hint).

Schema (BASELINE.json input_hint):
    image_id: string, bytes: binary, w: int32, h: int32,
    fmt: string, caption: string, phash: int64

Every row is a pure function of its index ``i`` (plus a fixed seed constant),
so generation is embarrassingly parallel and identical regardless of batch
boundaries — the property the resumable / retry-safe pipeline relies on
(deterministic block functions; SURVEY.md §4).

Injected anomalies (fixed residue classes of i, mirroring the reference test
corpus's "file named valid encodes expected validity",
/root/reference/test/Suite.hs:205-207 — here the anomaly class IS the golden
expectation):

    i % 1000 == 1   -> duplicate image_id (copies row i-1's id)
    i % 1000 == 3   -> corrupt bytes (payload truncated)
    i % 1000 == 5   -> w column disagrees with decoded width (+1)
    i % 1000 == 7   -> fmt label disagrees with magic bytes
    i % 1000 == 9   -> empty caption
    i % 1000 == 13  -> over-length caption (> 256 chars)
    i % 1000 == 15  -> non-ASCII caption (regex-check positive)
    i % 1000 == 17  -> null caption
    i % 20  == 11   -> phash = HOT_PHASH (skewed hot key, ~5% of rows)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from katydid_haskell_ray.functions import codecs

SEED = 20260817  # fixed generator constant (folded into per-row arithmetic)
HOT_PHASH = 0x5A5A5A5A5A5A5A5  # the skewed phash value (~5% of rows)

_FMTS = ("png", "bmp", "jpeg")

_VOCAB = (
    "cat dog bird tree river mountain sky cloud photo close-up portrait "
    "landscape night day red blue green golden vintage macro street aerial "
    "a the of on with under over beside two three tiny huge bright dark"
).split()

SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def _dims(i: int) -> tuple[int, int]:
    return 8 + (i * 7) % 25, 8 + (i * 11) % 25  # (w, h) in [8, 32]


def _pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixel pattern, vectorized: channel c = (a*x + b*y + f(i))."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    r = (3 * xx + 7 * yy + (i * 13) % 251) % 256
    g = (5 * xx + 2 * yy + (i * 29) % 241) % 256
    b = (xx * yy + (i * 53) % 239) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _caption(i: int) -> str | None:
    m = i % 1000
    if m == 9:
        return ""
    if m == 17:
        return None
    n_words = 4 + (i * 3) % 9
    words = [_VOCAB[(i * 17 + j * 31) % len(_VOCAB)] for j in range(n_words)]
    cap = " ".join(words)
    if m == 13:
        cap = (cap + " ") * (300 // max(1, len(cap)) + 1)  # force > 256 chars
    if m == 15:
        cap = cap + " café über"  # non-ASCII injection
    return cap


def make_row(i: int) -> dict:
    """Generate row i of the synthetic table (pure function of i)."""
    w, h = _dims(i)
    fmt = _FMTS[i % len(_FMTS)]
    arr = _pixels(i, w, h)
    data = codecs.ENCODERS[fmt](arr)
    ph = codecs.phash64(arr)
    m = i % 1000
    image_id = f"img-{i:012d}"
    if m == 1:
        image_id = f"img-{i - 1:012d}"  # duplicate id
    if m == 3:
        data = data[: max(8, len(data) // 2)]  # truncated payload
    if m == 5:
        w = w + 1  # metadata/dim mismatch
    if m == 7:
        fmt = "png" if fmt != "png" else "bmp"  # fmt label vs magic mismatch
    if i % 20 == 11:
        ph = HOT_PHASH
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": _caption(i),
        "phash": ph,
    }


def make_batch(lo: int, hi: int) -> pa.Table:
    """Rows [lo, hi) as a pyarrow Table with the canonical SCHEMA."""
    rows = [make_row(i) for i in range(lo, hi)]
    return pa.Table.from_pylist(rows, schema=SCHEMA)


def expected_anomalies(i: int, n: int) -> dict[str, bool]:
    """Golden expectation for row i (the 'valid'-file analog)."""
    m = i % 1000
    return {
        "dup_image_id": m == 1 or (m == 0 and i + 1 < n),  # both rows of a dup pair
        "corrupt_bytes": m == 3,
        "dim_mismatch": m == 5,
        "fmt_mismatch": m == 7,
        "empty_caption": m == 9,
        "overlong_caption": m == 13,
        "null_caption": m == 17,
        "hot_phash": i % 20 == 11,
    }


def n_rows_for_sf(sf_name: str) -> int:
    """Scale-factor name ('sf0.01') -> image row count (sf * 1e6)."""
    return max(100, int(float(sf_name.removeprefix("sf")) * 1_000_000))


def images_path_for_sf(sf_name: str, root: str = "/tmp/graft_images") -> str:
    return os.path.join(root, sf_name, "images.parquet")


def ensure_images_parquet(sf_name: str, root: str = "/tmp/graft_images") -> str:
    """Synthesize (once, driver-side) the images table for a scale factor.

    Small scales only — bench-scale generation goes through
    :func:`synthesize_dataset` which fans out over Ray. The file is the
    common input read by BOTH the Ray pipeline and the DuckDB oracle, so
    correctness compares identical bytes.
    """
    path = images_path_for_sf(sf_name, root)
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = n_rows_for_sf(sf_name)
    if n >= 20_000:
        # big table: fan generation out over Ray (the oracle only reads the
        # small sf0.01 single file, so a directory is fine here)
        import ray
        if ray.is_initialized():
            tmp = path + ".tmpdir"
            synthesize_dataset(n).write_parquet(tmp)
            os.replace(tmp, path)
            return path
    tmp = path + ".tmp"
    with pq.ParquetWriter(tmp, SCHEMA) as writer:
        for lo in range(0, n, 4096):
            writer.write_table(make_batch(lo, min(n, lo + 4096)))
    os.replace(tmp, path)  # atomic publish
    return path


def synthesize_dataset(n: int, parallelism: int = 0):
    """Bench-scale synthesis as a Ray Data pipeline (no driver-side loop).

    ``range(n) -> map_batches(make rows)``; each block generates only its own
    index range, so this scales to any n without materializing on the driver.
    """
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        rows = [make_row(int(i)) for i in ids]
        return pa.Table.from_pylist(rows, schema=SCHEMA)

    blocks = parallelism or max(32, n // 8192)  # ~8k rows (~10 MB) per file
    return ray.data.range(n, override_num_blocks=blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=8192
    )


def ensure_bench_images(n: int, root: str = "/tmp/graft_images") -> str:
    """Generate a bench-scale images parquet directory via Ray (cached)."""
    out_dir = os.path.join(root, f"bench_{n}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    ds = synthesize_dataset(n)
    ds.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write(str(n))
    return out_dir
