"""Constraint-evaluation stages for Ray Data pipelines.

Two flavors, mirroring SURVEY.md §2.3's two evaluation paths:

- :class:`FlatConstraints` — constraints over flat columns compile to
  vectorized expression kernels evaluated ONCE per batch with CSE across
  checks (the columnar analog of compileIfExprs predicate sharing).  A
  stateless ``map_batches`` function: no actor needed, elastic tasks.
- :class:`TreeConstraints` — Relapse grammars over nested/JSON columns,
  evaluated per row by the memoized derivative automaton.  A callable CLASS
  for ``map_batches(..., concurrency=N)``: the grammar is compiled and the
  memo caches warmed once per actor (MemDerive's shared-Mem pattern,
  /root/reference/src/Data/Katydid/Relapse/Relapse.hs:66-70).

Both append one ``check_<name>: bool`` column per check plus an aggregate
``pass`` column; violation extraction is a separate cheap stage over the
verdict columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from katydid_haskell_ray import derive as D
from katydid_haskell_ray import spec as SP
from katydid_haskell_ray import trees as T
from katydid_haskell_ray.exprs import core as E


class FlatConstraints:
    """Named vectorized boolean checks over flat columns.

    checks: list of (name, expr_json) — expr_json in the spec.py DSL with
    ``col`` variables.  Errors at the top level of a check count as False
    (see exprs.core docstring) and are additionally surfaced in an
    ``eval_err`` column so violations can distinguish "failed" from
    "wrong type/null".
    """

    def __init__(self, checks: list[tuple[str, dict]]):
        self.checks = [(name, SP.parse_expr(j)) for name, j in checks]
        for name, e in self.checks:
            if e.vtype != "bool":
                raise SP.SpecError(f"check {name}: expression is not boolean")

    def check_names(self) -> list[str]:
        return [n for n, _ in self.checks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        memo: dict = {}  # CSE shared across all checks in this batch
        overall = np.ones(n, dtype=bool)
        any_err = np.zeros(n, dtype=bool)
        cols, names = [], []
        for name, e in self.checks:
            val, err = E.eval_vector(e, batch, memo)
            val = np.broadcast_to(np.asarray(val, dtype=bool), (n,)).copy()
            if err is not None:
                val &= ~err
                any_err |= err
            overall &= val
            cols.append(pa.array(val))
            names.append(f"check_{name}")
        out = batch
        for nm, arr in zip(names, cols):
            out = out.append_column(nm, arr)
        out = out.append_column("eval_err", pa.array(any_err))
        return out.append_column("pass", pa.array(overall))


class TreeConstraints:
    """Relapse-grammar validation of nested payload columns (actor stage).

    ``columns`` maps output-check name -> (column name, mode) where mode is
    ``"json"`` (string column holding JSON text — Json.hs conventions) or
    ``"arrow"`` (struct/list column — field-order conventions).  Rows whose
    payload fails to parse get verdict False.

    Use with ``ds.map_batches(TreeConstraints(spec_doc, cols),
    batch_format="pyarrow", concurrency=N)`` — construction compiles the
    grammar once per actor; the derivative memo warms across batches.
    """

    def __init__(self, spec_doc: dict, columns: dict[str, tuple[str, str]]):
        self.grammar = SP.compile_spec(spec_doc)
        self.columns = columns
        self.deriver = D.MemDeriver(self.grammar)

    def _validate_cell(self, value, typ, mode) -> bool:
        try:
            if value is None:
                forest = ()
            elif mode == "json":
                forest = T.json_to_forest(value)
            else:
                forest = T.arrow_value_to_forest(value, typ)
        except (ValueError, TypeError):
            return False
        return self.deriver.validate(forest)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        overall = np.ones(batch.num_rows, dtype=bool)
        for check_name, (col_name, mode) in self.columns.items():
            col = batch.column(col_name)
            typ = batch.schema.field(col_name).type
            vals = col.to_pylist()
            res = np.fromiter(
                (self._validate_cell(v, typ, mode) for v in vals),
                dtype=bool, count=len(vals),
            )
            overall &= res
            out = out.append_column(f"check_{check_name}", pa.array(res))
        return out.append_column("pass", pa.array(overall))


def extract_violations(batch: pa.Table, id_col: str = "image_id") -> pa.Table:
    """Verdict batch -> long-form violation rows (id, check, detail).

    The violations side-output of SURVEY.md §2.6; run over the verdict
    parquet (cheap: only bool columns + id are read)."""
    check_cols = [c for c in batch.column_names if c.startswith("check_")]
    ids, checks = [], []
    id_arr = batch.column(id_col)
    if isinstance(id_arr, pa.ChunkedArray):
        id_arr = id_arr.combine_chunks()
    for c in check_cols:
        mask = pc_invert_safe(batch.column(c))
        failed = id_arr.filter(mask)
        if isinstance(failed, pa.ChunkedArray):
            failed = failed.combine_chunks()
        ids.append(failed)
        checks.append(pa.array([c.removeprefix("check_")] * len(failed),
                               type=pa.string()))
    if not ids:
        return pa.table({id_col: pa.array([], type=id_arr.type),
                         "check": pa.array([], type=pa.string())})
    return pa.table({id_col: pa.concat_arrays(ids),
                     "check": pa.concat_arrays(checks)})


def pc_invert_safe(arr):
    import pyarrow.compute as pc
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.fill_null(pc.invert(arr), True)
