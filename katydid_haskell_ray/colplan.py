"""Column-plan compiler: lower a Relapse grammar to vectorized kernels.

The reference evaluates every record through the derivative automaton
(per-row, sequential).  For the dominant flat-record case — a grammar whose
main pattern is an Interleave/Concat of named-field patterns with leaf
predicates — the same semantics reduce to a handful of per-COLUMN vectorized
predicates evaluated once per Arrow batch.  This module performs that
lowering (the columnar big-sibling of compileIfExprs' predicate sharing,
/root/reference/src/Data/Katydid/Relapse/IfExprs.hs:45-66), with the scalar
derivative evaluator as the fallback (and the cross-check oracle in tests).

Supported fragment (detected structurally, conservative):

    main = Interleave{ F1; F2; ... }   (or Concat where field order matches
                                        the schema, or a single F)
    Fi   = Node(eq($string, "col"), leafpat)
         | Optional(Node(eq($string, "col"), leafpat))
    leafpat = Node(pred, Empty) | Empty | ZAny
              | Or/And/Not of leafpats        (boolean closure on the leaf)

Semantics of the lowered plan, matching the tree view row_to_forest (one
String-labeled node per column; a NULL cell yields a node with NO children):

    Fi with leafpat p matches column c iff
        p is ZAny                         -> cell may be anything (incl null)
        p is Empty                        -> cell must be NULL (no children)
        p is Node(pred, Empty)            -> cell non-null AND pred(cell)
        boolean combinations accordingly.
    Optional(Fi): in the row view the column node is ALWAYS present, so
        Optional contributes nothing extra — the node itself must still
        match.  (Optional matters for absent KEYS, which a fixed schema
        never produces; we therefore treat Optional(F) = F here and verify
        against the oracle in tests.)
    Interleave over distinct field names: every column's own pattern must
        match, all other columns of the schema must be covered — the plan
        requires the grammar to name EXACTLY the validated columns unless a
        trailing ZAny-star covers the rest (rejected otherwise: fallback).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from katydid_haskell_ray import patterns as P
from katydid_haskell_ray.exprs import core as E


class NotLowerable(Exception):
    """Grammar is outside the vectorizable fragment — use the tree path."""


def _field_name_of(expr: E.Expr) -> str | None:
    """Match eq($string, const) / eq(const, $string) label predicates."""
    k = expr.key
    if not (isinstance(k, tuple) and len(k) == 3 and k[0] == "eq"):
        return None
    p1, p2 = k[1], k[2]
    if p1 == ("v", "string", None) and p2[0] == "c" and p2[1] == "string":
        return p2[2]
    if p2 == ("v", "string", None) and p1[0] == "c" and p1[1] == "string":
        return p1[2]
    return None


def _lower_leaf(pat: P.Pattern, col: str, coltype: str) -> E.Expr:
    """Leaf pattern -> boolean column expression over `col`.

    Encodes the row-view semantics: a cell value v maps to child forest
    [leaf(v)] when non-null, [] when null."""
    if pat is P.zany_p:
        return E.true_e()
    if pat is P.empty_set:
        return E.false_e()
    if pat is P.empty_p:
        # matches only the empty child forest = NULL cell
        return E.not_e(E.func("type", [E.var(coltype, col)]))
    if pat.kind == P.NODE and pat.pat is P.empty_p:
        pred = _rebind_label_vars(pat.expr, col, coltype)
        present = E.func("type", [E.var(coltype, col)])
        return E.func("and", [present, pred])
    if pat.kind == P.OR:
        out = None
        for q in pat.pats:
            e = _lower_leaf(q, col, coltype)
            out = e if out is None else E.or_e(out, e)
        return out
    if pat.kind == P.AND:
        out = None
        for q in pat.pats:
            e = _lower_leaf(q, col, coltype)
            out = e if out is None else E.and_e(out, e)
        return out
    if pat.kind == P.NOT:
        return E.not_e(_lower_leaf(pat.pat, col, coltype))
    if pat.kind == P.OPT:
        # Optional(leaf): matches leaf or empty forest (null)
        return E.or_e(_lower_leaf(pat.pat, col, coltype),
                      E.not_e(E.func("type", [E.var(coltype, col)])))
    raise NotLowerable(f"leaf pattern {pat!r} not lowerable")


def _rebind_label_vars(expr: E.Expr, col: str, coltype: str) -> E.Expr:
    """Rewrite tree-label vars ($T) to named column vars (col:T).

    A var of a type other than the column's Arrow-mapped type stays a
    label-var mismatch: in tree context it would error on every cell, so we
    keep the (always-erroring) var to preserve error-as-value semantics —
    eval_vector marks a type-mismatched named var all-err the same way."""
    if expr.kind == "var":
        if expr.col is not None:
            return expr
        return E.var(expr.vtype, col)
    if expr.kind == "const":
        return expr
    args = [_rebind_label_vars(a, col, coltype) for a in expr.args]
    fd = E.FUNCS.get(expr.name) or E.UDFS.get(expr.name)
    return fd.mk(args)


def _unwrap_field(pat: P.Pattern):
    """Node(eq($string, name), leafpat) [possibly Optional-wrapped] ->
    (name, leafpat, optional)."""
    optional = False
    if pat.kind == P.OPT:
        optional = True
        pat = pat.pat
    if pat.kind != P.NODE:
        raise NotLowerable(f"not a field pattern: {pat!r}")
    name = _field_name_of(pat.expr)
    if name is None:
        raise NotLowerable(f"field label predicate not eq-name: {pat.expr!r}")
    return name, pat.pat, optional


def lower_grammar(g: P.Grammar, schema: pa.Schema) -> dict[str, E.Expr]:
    """Grammar -> {column: boolean expr}; raises NotLowerable outside the
    fragment.  The row matches iff ALL column exprs are True."""
    main = g.main
    if main.kind == P.REF:
        main = g.lookup(main.name)
    if main.kind == P.CONTAINS and main.pat.kind == P.NODE:
        # Contains(Node(name-eq, leaf)) = ZAny·node·ZAny over the column
        # sequence; every column appears exactly once in the row view, so
        # the named column must match and the rest are free.  A Contains
        # whose inner node is not a single name-eq field (e.g. any-name)
        # would need an OR across columns: tree path.
        name, leafpat, _ = _unwrap_field(main.pat)
        coltypes = {f.name: E.arrow_type_to_vtype(f.type) for f in schema}
        if name not in coltypes or coltypes[name] is None:
            raise NotLowerable(f"unknown/unmappable column {name}")
        return {name: _lower_leaf(leafpat, name, coltypes[name])}
    if main.kind in (P.ILEAVE,):
        parts = list(main.pats)
    elif main.kind == P.CONCAT:
        parts = []
        cur = main
        while cur.kind == P.CONCAT:
            parts.append(cur.left)
            cur = cur.right
        parts.append(cur)
    else:
        parts = [main]

    coltypes = {f.name: E.arrow_type_to_vtype(f.type) for f in schema}
    fields: list[tuple[str, P.Pattern, bool]] = []
    seen: set[str] = set()
    covers_rest = False
    for i, part in enumerate(parts):
        if part is P.zany_p or (part.kind == P.STAR and part.pat is P.zany_p):
            # In a Concat, a zany/zany-star "covers the rest" ONLY when it is
            # the final element; a non-trailing star can absorb named-field
            # columns and is not expressible column-wise (tree path instead).
            if main.kind == P.CONCAT and i != len(parts) - 1:
                raise NotLowerable("non-trailing zany-star in concat")
            covers_rest = True
            continue
        name, leafpat, opt = _unwrap_field(part)
        if name in seen:
            raise NotLowerable(f"duplicate field {name}")
        if name not in coltypes or coltypes[name] is None:
            raise NotLowerable(f"unknown/unmappable column {name}")
        seen.add(name)
        fields.append((name, leafpat, opt))
    plan: dict[str, E.Expr] = {}
    for name, leafpat, opt in fields:
        if opt and covers_rest:
            if main.kind == P.CONCAT:
                # In a Concat an Optional before another required field DOES
                # constrain its column (emptiness shifts the match left);
                # only a trailing optional-run before the star is free.
                # Conservative: tree path.
                raise NotLowerable("optional field with covering star in concat")
            # Interleave: the column node may EITHER satisfy the Optional
            # field OR be absorbed by the covering zany-star (Optional then
            # matches empty) — so the column is unconstrained.
            plan[name] = E.true_e()
        else:
            plan[name] = _lower_leaf(leafpat, name, coltypes[name])
    if main.kind == P.CONCAT:
        # concat imposes field ORDER = schema order of the named columns
        named = [n for n in schema.names if n in seen]
        if named != [n for n in plan]:
            raise NotLowerable("concat field order differs from schema order")
    missing = set(schema.names) - seen
    if missing and not covers_rest:
        raise NotLowerable(f"columns {sorted(missing)} not covered "
                           f"(add a zany-star or use the tree path)")
    return plan


def evaluate_plan(plan: dict[str, E.Expr], batch: pa.Table) -> np.ndarray:
    """Evaluate the lowered plan -> per-row verdict mask (CSE shared)."""
    memo: dict = {}
    out = np.ones(batch.num_rows, dtype=bool)
    for col, expr in plan.items():
        val, err = E.eval_vector(expr, batch, memo)
        val = np.broadcast_to(np.asarray(val, dtype=bool), (batch.num_rows,)).copy()
        if err is not None:
            val &= ~err
        out &= val
    return out


def validate_batch(g: P.Grammar, batch: pa.Table) -> np.ndarray:
    """Vectorized grammar validation of a flat batch with automatic
    fallback: lowered column plan when possible, else the per-row memoized
    derivative over the row_to_forest view."""
    try:
        plan = lower_grammar(g, batch.schema)
        return evaluate_plan(plan, batch)
    except NotLowerable:
        from katydid_haskell_ray import derive as D
        from katydid_haskell_ray import trees as T
        m = D.MemDeriver(g)
        rows = batch.to_pylist()
        return np.fromiter(
            (m.validate(T.row_to_forest(r, batch.schema)) for r in rows),
            dtype=bool, count=len(rows))
