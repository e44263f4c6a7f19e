"""Constraint-spec front-end: a JSON DSL with Relapse pattern semantics.

The reference parses the concrete Relapse syntax with Parsec
(/root/reference/src/Data/Katydid/Relapse/Parser.hs:43-462) into an AST
(Ast.hs:31-44) and compiles it with Smart.compile (Smart.hs:43-55).  This
engine keeps the same *semantic* operator set but accepts a JSON-able spec
(SURVEY.md §2.2: "we do not need the concrete Relapse syntax to match the
oracle — only evaluation semantics"), which also makes specs picklable for
broadcast to Ray workers.

Spec document::

    {"main": <pattern>, "refs": {"name": <pattern>, ...}}

Pattern forms::

    "empty" | "zany" | "emptyset"
    {"leaf": <expr>}                       # Node(expr, Empty)
    {"node": <expr>, "child": <pattern>}   # Node(expr, child)
    {"field": "Name", "child": <pattern>}  # Node(eq($string,"Name"), child)
    {"or": [...]}, {"and": [...]}, {"not": p}
    {"concat": [...]}, {"interleave": [...]}
    {"star": p}, {"optional": p}, {"contains": p}
    {"ref": "name"}

Expr forms::

    true | false
    {"func": "eq", "args": [...]}
    {"var": "int"}                         # current tree label, typed
    {"col": "w", "type": "int"}            # named column (flat-table mode)
    {"const": ["int", 5]}  or shorthand  {"int": 5}, {"string": "x"},
        {"uint": 1}, {"double": 1.5}, {"bool": true}, {"bytes": "base64:..."},
        {"list_string": [...]}, ...
    {"op": "==", "value": <const expr>}    # builtin sugar on current label
    {"op": "==", "col": "w", "value": ...} # builtin sugar on a column

Recursion through references is detected and rejected at compile time
(Ast.hs:104-126, Smart.hs:46-47: compiled grammars are finite-depth).
"""

from __future__ import annotations

import base64
from typing import Any

from katydid_haskell_ray import patterns as P
from katydid_haskell_ray.exprs import core as E


class SpecError(ValueError):
    pass


# ---------------------------------------------------------------------------
# expressions
# ---------------------------------------------------------------------------

_CONST_SHORTHAND = set(E.VTYPES)


def parse_expr(j: Any) -> E.Expr:
    if j is True:
        return E.true_e()
    if j is False:
        return E.false_e()
    if not isinstance(j, dict):
        raise SpecError(f"bad expr {j!r}")
    if "func" in j:
        return E.func(j["func"], [parse_expr(a) for a in j.get("args", [])])
    if "op" in j:  # builtin sugar — may also carry a "col" target
        cexpr = parse_expr(j["value"])
        return E.builtin(j["op"], cexpr, col=j.get("col"))
    if "var" in j:
        return E.var(j["var"])
    if "col" in j:
        return E.var(j["type"], j["col"])
    if "const" in j:
        t, v = j["const"]
        return _const(t, v)
    for t in _CONST_SHORTHAND:
        if t in j:
            return _const(t, j[t])
    raise SpecError(f"bad expr {j!r}")


def _const(t: str, v: Any) -> E.Expr:
    if t == "bytes" and isinstance(v, str):
        v = base64.b64decode(v.removeprefix("base64:"))
    if t == "list_bytes" and isinstance(v, list):
        v = [base64.b64decode(x.removeprefix("base64:")) if isinstance(x, str) else x
             for x in v]
    return E.const(t, v)


# ---------------------------------------------------------------------------
# ast-level nullability (before smart construction) + recursion check
# ---------------------------------------------------------------------------


def _ast_nullable(j: Any, refs: dict, stack: tuple) -> bool:
    """Ast.nullable (Ast.hs:49-61) on the raw spec, with the recursion check
    of Ast.hs:104-126 folded in via the ref stack."""
    if j in ("empty", "zany"):
        return True
    if j == "emptyset":
        return False
    if not isinstance(j, dict):
        raise SpecError(f"bad pattern {j!r}")
    if "leaf" in j or "node" in j or "field" in j:
        return False
    if "or" in j:
        return any(_ast_nullable(q, refs, stack) for q in j["or"])
    if "and" in j:
        return all(_ast_nullable(q, refs, stack) for q in j["and"])
    if "not" in j:
        return not _ast_nullable(j["not"], refs, stack)
    if "concat" in j:
        return all(_ast_nullable(q, refs, stack) for q in j["concat"])
    if "interleave" in j:
        return all(_ast_nullable(q, refs, stack) for q in j["interleave"])
    if "star" in j or "optional" in j:
        return True
    if "contains" in j:
        return _ast_nullable(j["contains"], refs, stack)
    if "ref" in j:
        name = j["ref"]
        if name in stack:
            raise SpecError("recursion not supported (Smart.hs:46-47)")
        if name not in refs:
            raise SpecError(f"no reference named: {name}")
        return _ast_nullable(refs[name], refs, stack + (name,))
    raise SpecError(f"bad pattern {j!r}")


# ---------------------------------------------------------------------------
# pattern building
# ---------------------------------------------------------------------------


def _fold(ctor, items):
    acc = None
    for it in items:
        acc = it if acc is None else ctor(acc, it)
    if acc is None:
        raise SpecError("empty combinator list")
    return acc


def parse_pattern(j: Any, nulls: dict[str, bool]) -> P.Pattern:
    if j == "empty":
        return P.empty_p
    if j == "zany":
        return P.zany_p
    if j == "emptyset":
        return P.empty_set
    if not isinstance(j, dict):
        raise SpecError(f"bad pattern {j!r}")
    if "leaf" in j:
        return P.node_p(parse_expr(j["leaf"]), P.empty_p)
    if "node" in j:
        child = parse_pattern(j.get("child", "empty"), nulls)
        return P.node_p(parse_expr(j["node"]), child)
    if "field" in j:
        child = parse_pattern(j.get("child", "empty"), nulls)
        e = E.func("eq", [E.var("string"), E.const("string", j["field"])])
        return P.node_p(e, child)
    if "or" in j:
        return _fold(P.or_p, (parse_pattern(q, nulls) for q in j["or"]))
    if "and" in j:
        return _fold(P.and_p, (parse_pattern(q, nulls) for q in j["and"]))
    if "not" in j:
        return P.not_p(parse_pattern(j["not"], nulls))
    if "concat" in j:
        items = [parse_pattern(q, nulls) for q in j["concat"]]
        out = items[-1]
        for q in reversed(items[:-1]):
            out = P.concat_p(q, out)
        return out
    if "interleave" in j:
        return _fold(P.interleave_p, (parse_pattern(q, nulls) for q in j["interleave"]))
    if "star" in j:
        return P.zero_or_more_p(parse_pattern(j["star"], nulls))
    if "optional" in j:
        return P.optional_p(parse_pattern(j["optional"], nulls))
    if "contains" in j:
        return P.contains_p(parse_pattern(j["contains"], nulls))
    if "ref" in j:
        return P.ref_p(j["ref"], nulls[j["ref"]])
    raise SpecError(f"bad pattern {j!r}")


def compile_spec(doc: dict) -> P.Grammar:
    """Spec document -> compiled Grammar (the Smart.compile analog)."""
    if "main" not in doc:
        raise SpecError("grammar has no main pattern")
    refs_ast = dict(doc.get("refs", {}))
    refs_ast["main"] = doc["main"]
    nulls = {name: _ast_nullable(ast, refs_ast, (name,))
             for name, ast in refs_ast.items()}
    refs = {name: parse_pattern(ast, nulls) for name, ast in refs_ast.items()}
    return P.Grammar(refs)
