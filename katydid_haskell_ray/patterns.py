"""Relapse pattern algebra with smart-constructor normalization.

From-scratch re-expression of /root/reference/src/Data/Katydid/Relapse/
Smart.hs (422 LoC): hash-consed, normalized patterns over the algebra

    Empty | ZAny | Node expr child | Or | And | Not | Concat
    | Interleave | ZeroOrMore | Optional | Contains | Reference

with precomputed nullability and the full set of algebraic rewrites:

- not(not p) = p                                   (Smart.hs:195-197)
- Node with statically-False expr -> EmptySet      (Smart.hs:205-211)
- concat right-assoc + Empty/EmptySet units        (Smart.hs:218-230)
- ZAny . p . ZAny -> Contains p                    (Smart.hs:224)
- or/and flattening into sorted de-duplicated sets with ZAny/EmptySet
  absorption, leaf-predicate merging and same-name node merging
  (Smart.hs:262-332)
- interleave flattening + Empty/ZAny handling      (Smart.hs:364-384)

Patterns are interned: structural equality is identity, hashes precomputed
(the _hash-field hash-consing of Smart.hs:144-169), so derivative states can
be dict keys with O(1) comparison — the property the memoized evaluator's
cache hit-rate depends on.
"""

from __future__ import annotations

from typing import Iterable

from katydid_haskell_ray.exprs import core as E

# kinds
EMPTY, ZANY, NODE, OR, AND, NOT, CONCAT, ILEAVE, STAR, OPT, CONTAINS, REF = (
    "empty", "zany", "node", "or", "and", "not", "concat", "interleave",
    "zero_or_more", "optional", "contains", "ref",
)


class Pattern:
    __slots__ = ("kind", "expr", "pat", "left", "right", "pats", "name",
                 "nullable", "_hash", "_key")

    def __init__(self, kind, expr=None, pat=None, left=None, right=None,
                 pats=(), name=None, nullable=False):
        self.kind = kind
        self.expr = expr
        self.pat = pat
        self.left = left
        self.right = right
        self.pats = tuple(pats)
        self.name = name
        self.nullable = nullable

    # identity semantics: patterns are interned, equality is `is`
    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return self is other

    def __lt__(self, other):  # deterministic total order for sorted sets
        if self._hash != other._hash:
            return self._hash < other._hash
        return repr(self._key) < repr(other._key)  # rare hash-tie: stable fallback

    def __repr__(self):
        k = self.kind
        if k == EMPTY:
            return "<empty>"
        if k == ZANY:
            return "*"
        if k == NODE:
            return f"{self.expr!r}:{self.pat!r}"
        if k == CONCAT:
            return f"[{self.left!r},{self.right!r}]"
        if k == OR:
            return "(" + "|".join(map(repr, self.pats)) + ")"
        if k == AND:
            return "(" + "&".join(map(repr, self.pats)) + ")"
        if k == ILEAVE:
            return "{" + ";".join(map(repr, self.pats)) + "}"
        if k == NOT:
            return f"!({self.pat!r})"
        if k == STAR:
            return f"({self.pat!r})*"
        if k == OPT:
            return f"({self.pat!r})?"
        if k == CONTAINS:
            return f".{self.pat!r}"
        if k == REF:
            return f"@{self.name}"
        return k


_INTERN: dict[tuple, Pattern] = {}


def _intern(p: Pattern) -> Pattern:
    if p.kind == NODE:
        key = (NODE, p.expr.skey, id_key(p.pat))
    elif p.kind == CONCAT:
        key = (CONCAT, id_key(p.left), id_key(p.right))
    elif p.kind in (OR, AND, ILEAVE):
        key = (p.kind,) + tuple(id_key(q) for q in p.pats)
    elif p.kind in (NOT, STAR, OPT, CONTAINS):
        key = (p.kind, id_key(p.pat))
    elif p.kind == REF:
        key = (REF, p.name)
    else:
        key = (p.kind,)
    got = _INTERN.get(key)
    if got is not None:
        return got
    p._key = key
    p._hash = hash(key)
    _INTERN[key] = p
    return p


def id_key(p: Pattern):
    return p._key


# ---------------------------------------------------------------------------
# smart constructors
# ---------------------------------------------------------------------------

empty_p: Pattern = _intern(Pattern(EMPTY, nullable=True))
zany_p: Pattern = _intern(Pattern(ZANY, nullable=True))


def not_p(p: Pattern) -> Pattern:
    if p.kind == NOT:
        return p.pat  # ¬¬p = p
    return _intern(Pattern(NOT, pat=p, nullable=not p.nullable))


empty_set: Pattern = not_p(zany_p)  # !(*) — matches nothing (Smart.hs emptySet)


def node_p(expr: E.Expr, child: Pattern) -> Pattern:
    if expr.const is False:
        return empty_set  # Node with never-true predicate (Smart.hs:205-211)
    return _intern(Pattern(NODE, expr=expr, pat=child, nullable=False))


def concat_p(a: Pattern, b: Pattern) -> Pattern:
    if a is empty_set or b is empty_set:
        return empty_set
    if a is empty_p:
        return b
    if b is empty_p:
        return a
    if a.kind == CONCAT:  # right-assoc flatten
        return concat_p(a.left, concat_p(a.right, b))
    if a is zany_p and b.kind == CONCAT and b.right is zany_p:
        return contains_p(b.left)  # ZAny·p·ZAny → Contains p (Smart.hs:224)
    return _intern(Pattern(CONCAT, left=a, right=b,
                           nullable=a.nullable and b.nullable))


def contains_p(p: Pattern) -> Pattern:
    if p is empty_p:
        return zany_p
    if p is zany_p or p is empty_set:
        return p
    return _intern(Pattern(CONTAINS, pat=p, nullable=p.nullable))


def optional_p(p: Pattern) -> Pattern:
    if p is empty_p or p.kind == OPT:
        return p
    return _intern(Pattern(OPT, pat=p, nullable=True))


def zero_or_more_p(p: Pattern) -> Pattern:
    if p.kind == STAR:
        return p
    return _intern(Pattern(STAR, pat=p, nullable=True))


def _is_leaf(p: Pattern) -> bool:
    return p.kind == NODE and p.pat is empty_p


def _merge_adjacent(ps: list[Pattern], merger) -> list[Pattern]:
    """Fold a sorted list pairwise with a merger that may combine neighbors
    (the `merge` helper of Smart.hs:337-343)."""
    out = [ps[0]]
    for b in ps[1:]:
        merged = merger(out[-1], b)
        out[-1:] = merged
    return out


def _sort_leaves_first(ps: Iterable[Pattern]) -> list[Pattern]:
    """leavesThenNamesAndThenContains ordering (Smart.hs:345-367): leaf nodes
    first (sorted), then other nodes grouped by predicate, then contains,
    then the rest — so the pairwise merger sees mergeable neighbors."""
    def rank(p: Pattern):
        if p.kind == NODE:
            if _is_leaf(p):
                return (0, p.expr._hash, p._hash)
            return (1, p.expr._hash, p._hash)
        if p.kind == CONTAINS:
            return (2, 0, p._hash)
        return (3, 0, p._hash)
    return sorted(ps, key=lambda p: rank(p) + (repr(p._key),))


def _dedupe_sorted(ps: Iterable[Pattern]) -> list[Pattern]:
    return sorted(set(ps))


def _or_list(ps: set[Pattern]) -> Pattern:
    if len(ps) == 1:
        return next(iter(ps))
    if zany_p in ps:
        return zany_p
    ps = ps - {empty_set}
    if len(ps) == 1:
        return next(iter(ps))
    if not ps:
        return empty_set
    if all(p.nullable for p in ps):
        ps = ps - {empty_p} or {empty_p}
    if len(ps) == 1:
        return next(iter(ps))

    def merge_leaves(a, b):
        if _is_leaf(a) and _is_leaf(b):
            return [node_p(E.or_e(a.expr, b.expr), empty_p)]
        return [a, b]

    merged = set(_merge_adjacent(_sort_leaves_first(ps), merge_leaves))
    if len(merged) == 1:
        return next(iter(merged))

    def merge_same_name(a, b):
        if a.kind == NODE and b.kind == NODE and a.expr == b.expr:
            return [node_p(a.expr, or_p(a.pat, b.pat))]
        return [a, b]

    merged = set(_merge_adjacent(_sort_leaves_first(merged), merge_same_name))
    if len(merged) == 1:
        return next(iter(merged))
    pats = _dedupe_sorted(merged)
    return _intern(Pattern(OR, pats=pats, nullable=any(p.nullable for p in pats)))


def or_p(a: Pattern, b: Pattern) -> Pattern:
    ps = set(a.pats if a.kind == OR else (a,)) | set(b.pats if b.kind == OR else (b,))
    return _or_list(ps)


def _and_list(ps: set[Pattern]) -> Pattern:
    if len(ps) == 1:
        return next(iter(ps))
    if empty_set in ps:
        return empty_set
    ps = ps - {zany_p}
    if len(ps) == 1:
        return next(iter(ps))
    if not ps:
        return zany_p
    if empty_p in ps:
        return empty_p if all(p.nullable for p in ps) else empty_set

    def merge_leaves(a, b):
        if _is_leaf(a) and _is_leaf(b):
            return [node_p(E.and_e(a.expr, b.expr), empty_p)]
        return [a, b]

    merged = set(_merge_adjacent(_sort_leaves_first(ps), merge_leaves))
    if len(merged) == 1:
        return next(iter(merged))

    def merge_same_name(a, b):
        if a.kind == NODE and b.kind == NODE and a.expr == b.expr:
            return [node_p(a.expr, and_p(a.pat, b.pat))]
        return [a, b]

    merged = set(_merge_adjacent(_sort_leaves_first(merged), merge_same_name))
    if len(merged) == 1:
        return next(iter(merged))
    pats = _dedupe_sorted(merged)
    return _intern(Pattern(AND, pats=pats, nullable=all(p.nullable for p in pats)))


def and_p(a: Pattern, b: Pattern) -> Pattern:
    ps = set(a.pats if a.kind == AND else (a,)) | set(b.pats if b.kind == AND else (b,))
    return _and_list(ps)


def interleave_p(a: Pattern, b: Pattern) -> Pattern:
    ps = list(a.pats if a.kind == ILEAVE else (a,)) + list(b.pats if b.kind == ILEAVE else (b,))
    if any(p is empty_set for p in ps):
        return empty_set
    if all(p is empty_p for p in ps):
        return empty_p
    ps = [p for p in ps if p is not empty_p]
    if len(ps) == 1:
        return ps[0]
    if any(p is zany_p for p in ps):  # collapse multiple ZAny to one
        ps = [zany_p] + [p for p in ps if p is not zany_p]
        if len(ps) == 1:
            return zany_p
    pats = sorted(ps)
    return _intern(Pattern(ILEAVE, pats=pats,
                           nullable=all(p.nullable for p in pats)))


def ref_p(name: str, nullable: bool) -> Pattern:
    p = _INTERN.get((REF, name))
    if p is not None:
        return p
    return _intern(Pattern(REF, name=name, nullable=nullable))


def unescapable(p: Pattern) -> bool:
    """ZAny and !(ZAny) absorb any further input — short-circuit signal
    (Smart.hs:396-399, used by Derive.hs:129-130)."""
    return p is zany_p or p is empty_set


# ---------------------------------------------------------------------------
# Grammar
# ---------------------------------------------------------------------------


class Grammar:
    """Map from reference name -> pattern with a distinguished 'main'
    (Smart.hs:402-422).  Recursion is rejected at compile time by the spec
    front-end (Ast.hs:104-126 / Smart.hs:46-47), so lookups terminate."""

    __slots__ = ("refs",)

    def __init__(self, refs: dict[str, Pattern]):
        if "main" not in refs:
            raise ValueError("grammar has no main pattern")
        self.refs = refs

    def lookup(self, name: str) -> Pattern:
        return self.refs[name]

    @property
    def main(self) -> Pattern:
        return self.refs["main"]
