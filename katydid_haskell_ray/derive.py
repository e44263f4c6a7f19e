"""Brzozowski tree-derivative evaluation of Relapse patterns.

From-scratch re-expression of the reference's evaluation core:

- ``calls`` / ``derive_call``    — collect per-node if-expressions
  (/root/reference/src/Data/Katydid/Relapse/Derive.hs:42-60)
- ``compile_if_exprs`` / ``eval_if_exprs`` — decision-tree compilation with
  static branch pruning via the smart and/not expression constructors
  (IfExprs.hs:45-66)
- ``returns`` / ``derive_return`` — rebuild parent patterns from child
  nullability bits, one rule per constructor (Derive.hs:67-117)
- ``zippy`` / ``unzipby``         — state canonicalization: dedupe + sort the
  pattern list, dropping ZAny / EmptySet, remembering indices (Zip.hs:29-50)
- ``derive_forest``              — the plain unmemoized evaluator
  (Derive.hs:121-138), used as the oracle in tests
- ``Mem`` / ``MemDeriver``        — the memoized evaluator (MemDerive.hs:41-105):
  Calls keyed on the state tuple, Returns keyed on (state, null-bits).  One
  Mem per Ray actor replicates the reference's single shared memo
  (Relapse.hs:66-70) — caches are pure memoization, so per-actor replication
  is semantically identical (SURVEY.md §2.3).

The evaluator consumes trees from :mod:`katydid_haskell_ray.trees`.
"""

from __future__ import annotations

from typing import Iterable

from katydid_haskell_ray import patterns as P
from katydid_haskell_ray.exprs import core as E

# ---------------------------------------------------------------------------
# calls: [Pattern] -> if-expressions over the node label
# ---------------------------------------------------------------------------


def derive_call(g: P.Grammar, p: P.Pattern, res: list) -> list:
    """Collect (cond, then-pat, else-pat) triples, preserving the reference's
    collection order (Derive.hs:45-60) — returns consumes bits in the same
    order."""
    k = p.kind
    if k in (P.EMPTY, P.ZANY):
        return res
    if k == P.NODE:
        return [(p.expr, p.pat, P.empty_set)] + res
    if k == P.CONCAT:
        if p.left.nullable:
            return derive_call(g, p.left, derive_call(g, p.right, res))
        return derive_call(g, p.left, res)
    if k in (P.OR, P.AND, P.ILEAVE):
        for q in reversed(p.pats):
            res = derive_call(g, q, res)
        return res
    if k in (P.STAR, P.NOT, P.CONTAINS, P.OPT):
        return derive_call(g, p.pat, res)
    if k == P.REF:
        return derive_call(g, g.lookup(p.name), res)
    raise AssertionError(k)


def calls(g: P.Grammar, state: tuple[P.Pattern, ...]) -> "IfExprs":
    out: list = []
    for p in reversed(state):
        out = derive_call(g, p, out)
    return compile_if_exprs(out)


# decision tree: ("ret", [patterns]) | ("cond", expr, then, else)


def compile_if_exprs(ifs: list) -> tuple:
    """Merge if-expressions into a decision tree, pruning statically-false
    branches (IfExprs.hs:45-66).  Conditions shared by many patterns are
    tested once — the reference's predicate CSE."""
    tree: tuple = ("ret", [])
    for trip in reversed(ifs):
        tree = _add_if(trip, tree)
    return tree


def _add_if(trip, tree) -> tuple:
    c, t, e = trip
    if tree[0] == "ret":
        return ("cond", c, ("ret", [t] + tree[1]), ("ret", [e] + tree[1]))
    _, cs, thn, els = tree
    if c == cs:
        return ("cond", cs, _add_ret(t, thn), _add_ret(e, els))
    if E.and_e(c, cs).const is False:  # c impossible inside then-branch
        return ("cond", cs, _add_ret(e, thn), _add_if(trip, els))
    if E.and_e(E.not_e(c), cs).const is False:  # ¬c impossible inside then
        return ("cond", cs, _add_if(trip, thn), _add_ret(t, els))
    return ("cond", cs, _add_if(trip, thn), _add_if(trip, els))


def _add_ret(p, tree) -> tuple:
    if tree[0] == "ret":
        return ("ret", [p] + tree[1])
    _, c, t, e = tree
    return ("cond", c, _add_ret(p, t), _add_ret(p, e))


class CondEvalError(Exception):
    """A decision-tree condition evaluated to an error at top level.

    The reference threads `Either` through evalIf and any Left aborts the
    ENTIRE document's validation with False (MemDerive.hs validate /
    IfExprs.hs:50-54) — errors are only swallowed inside `not` (error⇒True)
    and short-circuited and/or.  The validate entry points catch this and
    return False for the whole tree."""


def eval_if_exprs(tree: tuple, label) -> list[P.Pattern]:
    """Run the decision tree on one label (IfExprs.hs:50-54).  A top-level
    condition eval error aborts the whole document (CondEvalError)."""
    env = E.LabelEnv(label[0], label[1])
    while tree[0] == "cond":
        b = E.eval_scalar(tree[1], env)
        if E.is_err(b):
            raise CondEvalError(tree[1])
        tree = tree[2] if b else tree[3]
    return tree[1]


# ---------------------------------------------------------------------------
# returns: child nullability bits -> derived parent patterns
# ---------------------------------------------------------------------------


def derive_return(g: P.Grammar, p: P.Pattern, ns: list[bool], i: int):
    """One constructor-directed rebuild step (Derive.hs:81-117).  Consumes
    nullability bits starting at index i; returns (pattern, next_i)."""
    k = p.kind
    if k == P.EMPTY:
        return P.empty_set, i
    if k == P.ZANY:
        return P.zany_p, i
    if k == P.NODE:
        return (P.empty_p if ns[i] else P.empty_set), i + 1
    if k == P.CONCAT:
        if p.left.nullable:
            dl, i = derive_return(g, p.left, ns, i)
            dr, i = derive_return(g, p.right, ns, i)
            return P.or_p(P.concat_p(dl, p.right), dr), i
        dl, i = derive_return(g, p.left, ns, i)
        return P.concat_p(dl, p.right), i
    if k == P.OR:
        acc = None
        for q in p.pats:
            dq, i = derive_return(g, q, ns, i)
            acc = dq if acc is None else P.or_p(acc, dq)
        return acc, i
    if k == P.AND:
        acc = None
        for q in p.pats:
            dq, i = derive_return(g, q, ns, i)
            acc = dq if acc is None else P.and_p(acc, dq)
        return acc, i
    if k == P.ILEAVE:
        # or over j of interleave(ps with j-th replaced by its derivative)
        # (Derive.hs:96-101 removeOneForEach)
        dps = []
        for q in p.pats:
            dq, i = derive_return(g, q, ns, i)
            dps.append(dq)
        alts = []
        for j in range(len(p.pats)):
            parts = [dps[j]] + [p.pats[m] for m in range(len(p.pats)) if m != j]
            acc = parts[0]
            for q in parts[1:]:
                acc = P.interleave_p(acc, q)
            alts.append(acc)
        out = alts[0]
        for a in alts[1:]:
            out = P.or_p(out, a)
        return out, i
    if k == P.STAR:
        dp, i = derive_return(g, p.pat, ns, i)
        return P.concat_p(dp, p), i
    if k == P.REF:
        return derive_return(g, g.lookup(p.name), ns, i)
    if k == P.NOT:
        dp, i = derive_return(g, p.pat, ns, i)
        return P.not_p(dp), i
    if k == P.CONTAINS:
        dp, i = derive_return(g, p.pat, ns, i)
        return P.or_p(p, P.contains_p(dp)), i
    if k == P.OPT:
        return derive_return(g, p.pat, ns, i)
    raise AssertionError(k)


def returns(g: P.Grammar, state: tuple[P.Pattern, ...], ns: list[bool]) -> tuple:
    out, i = [], 0
    for p in state:
        dp, i = derive_return(g, p, ns, i)
        out.append(dp)
    return tuple(out)


# ---------------------------------------------------------------------------
# zipper: state-space compression (Zip.hs:29-50)
# ---------------------------------------------------------------------------

_ZANY_IDX, _NOTZANY_IDX = -1, -2


def zippy(ps: Iterable[P.Pattern]):
    """Dedupe + sort, dropping ZAny / EmptySet; remember positions so
    nullability bits can be re-expanded with unzipby."""
    ps = list(ps)
    uniq = sorted(set(ps) - {P.zany_p, P.empty_set})
    index = {p: i for i, p in enumerate(uniq)}
    zipper = tuple(
        _ZANY_IDX if p is P.zany_p
        else _NOTZANY_IDX if p is P.empty_set
        else index[p]
        for p in ps
    )
    return tuple(uniq), zipper


def unzipby(zipper: tuple[int, ...], bits: list[bool]) -> list[bool]:
    return [True if z == _ZANY_IDX else False if z == _NOTZANY_IDX else bits[z]
            for z in zipper]


# ---------------------------------------------------------------------------
# plain (oracle) evaluator — Derive.hs:121-138
# ---------------------------------------------------------------------------


def _deriv_tree(g: P.Grammar, state: tuple, tree) -> tuple:
    if all(P.unescapable(p) for p in state):
        return state  # short-circuit (Derive.hs:129-130)
    label, children = tree
    childstate = tuple(eval_if_exprs(calls(g, state), label))
    for c in children:
        childstate = _deriv_tree(g, childstate, c)
    return returns(g, state, [p.nullable for p in childstate])


def derive_forest(g: P.Grammar, forest) -> P.Pattern:
    state = (g.main,)
    for t in forest:
        state = _deriv_tree(g, state, t)
    assert len(state) == 1
    return state[0]


def validate_forest(g: P.Grammar, forest) -> bool:
    """validate g ts — nullability of the final derivative (Relapse.hs:58-61).
    A condition eval error anywhere in the tree ⇒ False for the whole
    document (reference Left propagation)."""
    try:
        return derive_forest(g, forest).nullable
    except CondEvalError:
        return False


# ---------------------------------------------------------------------------
# memoized evaluator — MemDerive.hs
# ---------------------------------------------------------------------------


class MemDeriver:
    """Memoized derivative evaluator with zipper compression.

    One instance per Ray actor; the calls/returns dicts grow monotonically
    and warm up over the actor's batches (MemDerive.hs:41-64).  Keys are
    interned Pattern tuples, so hashing is O(state size) pointer hashes.
    """

    __slots__ = ("g", "_calls", "_returns")

    def __init__(self, g: P.Grammar):
        self.g = g
        self._calls: dict = {}
        self._returns: dict = {}

    def _calls_for(self, state: tuple):
        ifs = self._calls.get(state)
        if ifs is None:
            ifs = self._calls[state] = calls(self.g, state)
        return ifs

    def _returns_for(self, state: tuple, bits: tuple):
        key = (state, bits)
        out = self._returns.get(key)
        if out is None:
            out = self._returns[key] = returns(self.g, state, list(bits))
        return out

    def _deriv(self, state: tuple, tree) -> tuple:
        if all(P.unescapable(p) for p in state):
            return state
        label, children = tree
        childstate = tuple(eval_if_exprs(self._calls_for(state), label))
        zstate, zipper = zippy(childstate)
        cur = zstate
        for c in children:
            cur = self._deriv(cur, c)
        bits = tuple(unzipby(zipper, [p.nullable for p in cur]))
        return self._returns_for(state, bits)

    def validate(self, forest) -> bool:
        try:
            state = (self.g.main,)
            for t in forest:
                state = self._deriv(state, t)
        except CondEvalError:
            return False
        return len(state) == 1 and state[0].nullable

    def cache_sizes(self) -> tuple[int, int]:
        return len(self._calls), len(self._returns)


# ---------------------------------------------------------------------------
# VPA-style evaluator — VpaDerive.hs:39-106
# ---------------------------------------------------------------------------


class VpaDeriver:
    """The derivative algorithm reformulated as a Visibly Pushdown Automaton
    over an (open, label, close) token stream (VpaDerive.hs:39-106): state =
    pattern tuple, stack holds (parent state, zipper) frames.

    Proof-of-concept that evaluation is a streaming automaton — the shape
    that would consume nested Arrow offsets directly without materializing
    trees (SURVEY.md §2.3).  All three memo tables (nullable per state,
    calls, returns) are per-instance, mirroring the reference's
    get/put-threaded maps.
    """

    __slots__ = ("g", "_calls", "_returns", "_nulls")

    def __init__(self, g: P.Grammar):
        self.g = g
        self._calls: dict = {}
        self._returns: dict = {}
        self._nulls: dict = {}

    def _nullable(self, state: tuple) -> tuple:
        out = self._nulls.get(state)
        if out is None:
            out = self._nulls[state] = tuple(p.nullable for p in state)
        return out

    def _call(self, state: tuple, label) -> tuple:
        ifs = self._calls.get(state)
        if ifs is None:
            ifs = self._calls[state] = calls(self.g, state)
        childstate = tuple(eval_if_exprs(ifs, label))
        return zippy(childstate)

    def _return(self, parent: tuple, bits: tuple) -> tuple:
        key = (parent, bits)
        out = self._returns.get(key)
        if out is None:
            out = self._returns[key] = returns(self.g, parent, list(bits))
        return out

    @staticmethod
    def tokens(forest):
        """Flatten a forest to (kind, payload) VPA tokens."""
        for label, children in forest:
            yield ("open", label)
            yield from VpaDeriver.tokens(children)
            yield ("close", None)

    def validate(self, forest) -> bool:
        try:
            return self._validate(forest)
        except CondEvalError:
            return False

    def _validate(self, forest) -> bool:
        state: tuple = (self.g.main,)
        stack: list = []
        for kind, payload in self.tokens(forest):
            if kind == "open":
                if all(P.unescapable(p) for p in state):
                    # short-circuit: absorb the whole subtree
                    stack.append((state, None))
                    continue
                zstate, zipper = self._call(state, payload)
                stack.append((state, zipper))
                state = zstate
            else:  # close
                parent, zipper = stack.pop()
                if zipper is None:
                    state = parent  # short-circuited subtree
                    continue
                bits = tuple(unzipby(zipper, list(self._nullable(state))))
                state = self._return(parent, bits)
        return len(state) == 1 and state[0].nullable
