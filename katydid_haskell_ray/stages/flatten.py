"""Semi-structured flatten: JSON payload column -> typed Arrow columns.

The structural analog of the reference's binary parsers (protobuf decode,
SURVEY.md §2.1): a dynamic per-record payload becomes typed columns for
the vectorized engine downstream.  Parsing a dynamic payload is inherently
per-record (same as image/protobuf decode); everything around it — path
spec compilation, output typing, null policy — is set up once per actor.

Null policy mirrors the katydid error-as-value convention: a missing key
or a value of the wrong type yields NULL, never an error.
"""

from __future__ import annotations

import json

import pyarrow as pa

_ARROW_TYPES = {
    "int": pa.int64(),
    "double": pa.float64(),
    "string": pa.string(),
    "bool": pa.bool_(),
}

_PY_TYPES = {
    # bool is an int subclass in Python; exclude it from int/double
    "int": lambda v: v if type(v) is int else None,
    "double": lambda v: float(v) if type(v) in (int, float) else None,
    "string": lambda v: v if type(v) is str else None,
    "bool": lambda v: v if type(v) is bool else None,
}


class JsonFlatten:
    """Actor-pool stage: extract typed top-level fields from a JSON column.

    ``fields`` maps output column -> (json key, type in int|double|string|
    bool).  ``keep`` columns pass through unchanged.  Invalid JSON rows
    flatten to all-NULL fields."""

    def __init__(self, src_col: str, fields: dict[str, tuple[str, str]],
                 keep: list[str] = ()):  # noqa: B006 - tuple default is immutable
        self.src = src_col
        self.fields = {out: (key, _PY_TYPES[t], _ARROW_TYPES[t])
                       for out, (key, t) in fields.items()}
        self.keep = list(keep)

    def __call__(self, b: pa.Table) -> pa.Table:
        raw = b.column(self.src).to_pylist()
        parsed = []
        for s in raw:
            try:
                d = json.loads(s) if s else {}
            except (ValueError, TypeError):
                d = {}
            parsed.append(d if isinstance(d, dict) else {})
        cols = {c: b.column(c) for c in self.keep}
        for out, (key, conv, at) in self.fields.items():
            cols[out] = pa.array((conv(d[key]) if key in d else None
                                  for d in parsed), type=at)
        return pa.table(cols)
