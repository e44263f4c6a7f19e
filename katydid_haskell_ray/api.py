"""User-facing Relapse surface — the Dataset-level analog of the
reference's ``Relapse`` module API (``parse`` / ``validate`` / ``filter``,
/root/reference/src/Data/Katydid/Relapse/Relapse.hs:24-70), so a user of
the reference can switch with one import:

    from katydid_haskell_ray import api
    good = api.filter(ds, '(main = {"w": "->ge($int, 1)"})', ...)

A grammar is accepted in any of three forms:
- a CONCRETE Relapse syntax string (relapse_parser — the reference's
  ``Relapse.parse`` input format),
- a JSON spec-DSL dict (spec.compile_spec's input),
- an already-compiled :class:`patterns.Grammar`.

Evaluation picks the right Ray Data shape automatically:
- ``json_col=None`` (flat mode): each ROW is the tree (row_to_forest
  view); grammars in the lowerable fragment run as ONE vectorized column
  plan per batch, everything else falls back to the per-row memoized
  derivative — with the plan lowered and the memo warmed once per ACTOR,
  not once per batch.
- ``json_col="props"``: the named string column holds JSON documents;
  each is validated by the memoized derivative automaton (an actor pool,
  the MemDerive shared-cache pattern).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from katydid_haskell_ray import patterns as P
from katydid_haskell_ray import spec as SP
from katydid_haskell_ray.stages.util import auto_concurrency


def parse(src: str) -> dict:
    """Concrete Relapse syntax -> JSON spec-DSL doc (Relapse.parse analog;
    the doc is what compile/validate/filter accept)."""
    from katydid_haskell_ray.relapse_parser import parse as _parse
    return _parse(src)


def compile(grammar: "str | dict | P.Grammar") -> P.Grammar:
    """Any accepted grammar form -> compiled Grammar (Smart.compile)."""
    doc = _to_doc(grammar)
    return doc if isinstance(doc, P.Grammar) else SP.compile_spec(doc)


def _to_doc(grammar: Any):
    if isinstance(grammar, P.Grammar):
        return grammar
    if isinstance(grammar, str):
        return parse(grammar)
    if isinstance(grammar, dict):
        return grammar
    raise TypeError(f"grammar must be str/dict/Grammar, got {type(grammar)}")


class _FlatValidator:
    """Actor stage: row-as-tree validation of a flat table.

    The column plan is lowered once per (actor, schema); the NotLowerable
    fallback keeps ONE MemDeriver whose memo warms across batches (unlike
    colplan.validate_batch, which rebuilds both per call)."""

    def __init__(self, doc, out_col: str):
        self.g = doc if isinstance(doc, P.Grammar) else SP.compile_spec(doc)
        self.out_col = out_col
        self._plan = None
        self._plan_schema = None
        self._lowerable: bool | None = None
        self._deriver = None

    def _mask(self, batch: pa.Table) -> np.ndarray:
        from katydid_haskell_ray import colplan as CP
        if self._lowerable is None or self._plan_schema != batch.schema:
            try:
                self._plan = CP.lower_grammar(self.g, batch.schema)
                self._lowerable = True
            except CP.NotLowerable:
                self._lowerable = False
            self._plan_schema = batch.schema
        if self._lowerable:
            return CP.evaluate_plan(self._plan, batch)
        from katydid_haskell_ray import derive as D
        from katydid_haskell_ray import trees as T
        if self._deriver is None:
            self._deriver = D.MemDeriver(self.g)
        rows = batch.to_pylist()
        return np.fromiter(
            (self._deriver.validate(T.row_to_forest(r, batch.schema))
             for r in rows), dtype=bool, count=len(rows))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(self.out_col, pa.array(self._mask(batch)))


class _JsonValidator:
    """Actor stage: per-row derivative validation of a JSON string column."""

    def __init__(self, doc, json_col: str, out_col: str):
        from katydid_haskell_ray import derive as D
        self.g = doc if isinstance(doc, P.Grammar) else SP.compile_spec(doc)
        self.json_col = json_col
        self.out_col = out_col
        self.deriver = D.MemDeriver(self.g)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from katydid_haskell_ray import trees as T

        def one(v) -> bool:
            try:
                forest = () if v is None else T.json_to_forest(v)
            except (ValueError, TypeError):
                return False
            return self.deriver.validate(forest)

        vals = batch.column(self.json_col).to_pylist()
        res = np.fromiter((one(v) for v in vals), dtype=bool,
                          count=len(vals))
        return batch.append_column(self.out_col, pa.array(res))


def validate(ds, grammar, *, json_col: str | None = None,
             out_col: str = "pass", concurrency=None):
    """Dataset -> Dataset with a boolean ``out_col`` verdict per row
    (Relapse.validate, batched).  See the module docstring for modes."""
    doc = _to_doc(grammar)
    conc = concurrency if concurrency is not None else auto_concurrency()
    if json_col is not None:
        return ds.map_batches(
            _JsonValidator, fn_constructor_args=(doc, json_col, out_col),
            batch_format="pyarrow", concurrency=conc)
    return ds.map_batches(
        _FlatValidator, fn_constructor_args=(doc, out_col),
        batch_format="pyarrow", concurrency=conc)


def filter(ds, grammar, *, json_col: str | None = None, concurrency=None):
    """Dataset -> Dataset of only the rows the grammar matches
    (Relapse.filter, batched) — the verdict column is not kept."""
    out_col = "__relapse_pass"
    v = validate(ds, grammar, json_col=json_col, out_col=out_col,
                 concurrency=concurrency)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = batch.column(out_col)
        return batch.filter(pc.fill_null(mask, False)) \
            .drop_columns([out_col])

    return v.map_batches(keep, batch_format="pyarrow")
