"""Reader helpers: Lance-first with Parquet fallback, pruned at the read.

The input_hint names Lance tables; this environment has no ``lance``/
``pylance`` wheel (SURVEY.md §7), so the engine reads Lance when the
library and a ``.lance`` dataset are present and otherwise falls back to
Parquet with the identical Arrow schema.  All call sites go through
:func:`read_images_table` so a deployment with Lance installed changes
nothing downstream.
"""

from __future__ import annotations

import os

import ray.data

try:  # optional dependency: not available in this container
    import lance  # type: ignore  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_images_table(path: str, columns: list[str] | None = None):
    """Read an image+caption table (Lance if possible, else Parquet).

    ``path`` may be a ``.lance`` dataset directory, a parquet file, or a
    directory of parquet files.  ``columns`` prunes at the read — never
    load ``bytes`` for a metadata-only stage."""
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        if not HAVE_LANCE:
            raise RuntimeError(
                "input is a Lance dataset but the lance library is not "
                "installed in this environment; re-materialize as parquet "
                "or install pylance")
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_images_table(ds, path: str, **kwargs):
    """Write an image+caption table (Lance if available, else Parquet)."""
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
