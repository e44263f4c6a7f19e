"""Relapse scalar-expression stdlib with katydid error-as-value semantics.

From-scratch re-expression of the reference's expression layer
(/root/reference/src/Data/Katydid/Relapse/Expr.hs, Exprs/*.hs) for a
columnar engine.  Every expression carries TWO evaluators:

- **scalar** — evaluates against a single tree label or table row; the
  oracle path, mirroring the reference's `eval :: Label -> Either String a`
  exactly (used by the tree-derivative evaluator and by tests).
- **vector** — evaluates against a whole ``pyarrow.Table`` batch at once as
  numpy / pyarrow arrays with an explicit *error mask* (the vectorization of
  `Either String a`: ``err[i]`` ⇔ row i's eval would be ``Left``).

Error semantics preserved from the reference (load-bearing for parity):

- ``eq``/``ne``/``lt``/``gt``/``le``/``ge``: an eval error on either side
  yields **False** (for both eq AND ne) — Exprs/Compare.hs:50-53,83-86.
- ``not``: an eval error yields **True** — Exprs/Logic.hs:26-32.
- ``type``: True iff the argument evaluates without error — Exprs/Type.hs:28-34.
- ``and``/``or``: PROPAGATE errors (applicative, non-short-circuit) —
  Exprs/Logic.hs `defaultAnd`: ``(&&) <$> eval a <*> eval b``.
- ``contains``/``hasPrefix``/``hasSuffix``/``regex``/``elem``/``length``/
  ``toLower``/``toUpper``: propagate errors.
- Variables (``$int`` etc.) error on a label/cell of a different type or a
  null cell — Exprs/Var.hs:61-64.

Equality of expressions is by *canonical description key* with not-pushdown
normalization (¬¬x→x, De Morgan, ¬eq↔ne — Exprs/Logic.hs:36-51 `notDesc`),
so syntactically different but equivalent predicates merge during pattern
simplification.  NOTE (as in the reference): the desc key identifies
``not(eq(..))`` with ``ne(..)`` even though their *error* behavior differs;
evaluation always follows the structure, only simplification uses the key.

Argument order conventions (match the reference):
- ``contains(s, sub)``     — sub is a substring of s (string version), or
  ``contains(x, xs)`` — x is an element of list xs (Exprs/Contains.hs).
- ``hasPrefix(s, pre)`` / ``hasSuffix(s, suf)`` (Exprs/Strings.hs:40-61).
- ``regex(pattern, s)`` — PATTERN FIRST (Exprs/Strings.hs:74-81); unanchored.
- builtin sugar ``field op const`` expands to ``op(var, const)`` except
  ``~=`` → ``regex(const, var)`` and ``::`` → ``type(var)`` (Exprs.hs:57-79).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# types
# ---------------------------------------------------------------------------

SCALAR_VTYPES = ("bool", "int", "uint", "double", "string", "bytes")
LIST_VTYPES = tuple("list_" + t for t in SCALAR_VTYPES)
VTYPES = SCALAR_VTYPES + LIST_VTYPES


class _ErrType:
    """Sentinel for a scalar eval error (the `Left` of the reference)."""

    __slots__ = ("msg",)

    def __init__(self, msg: str = "error"):
        self.msg = msg

    def __repr__(self):
        return f"<Err {self.msg}>"

    def __bool__(self):  # make accidental truthiness loud
        raise TypeError("Err sentinel used as bool")


ERR = _ErrType("eval error")


def is_err(v: Any) -> bool:
    return isinstance(v, _ErrType)


def arrow_type_to_vtype(t: pa.DataType) -> str | None:
    """Map an Arrow column type to the Relapse Label vtype it carries.

    Mirrors the Label union of /root/reference/src/Data/Katydid/Parser/
    Parser.hs:22-29 onto Arrow (SURVEY.md §1.1 table).
    """
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_signed_integer(t):
        return "int"
    if pa.types.is_unsigned_integer(t):
        return "uint"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        inner = arrow_type_to_vtype(t.value_type)
        return None if inner is None or inner.startswith("list_") else "list_" + inner
    return None


# ---------------------------------------------------------------------------
# Expr objects (interned)
# ---------------------------------------------------------------------------


class Expr:
    """An immutable, interned expression node.

    ``key``   — canonical desc key (not-pushdown normalized); defines __eq__/
                __hash__, used by pattern simplification (Expr.hs:349-373).
    ``skey``  — structural key; identifies actual evaluation behavior and is
                the CSE key for the vectorized evaluator.
    ``const`` — folded constant value if the expr has no variables and
                evaluates without error, else None (Expr.hs:381-386).
    """

    __slots__ = (
        "kind", "vtype", "name", "args", "value", "col",
        "key", "skey", "const", "has_var", "_hash",
    )

    def __init__(self, kind, vtype, name=None, args=(), value=None, col=None):
        self.kind = kind
        self.vtype = vtype
        self.name = name
        self.args = tuple(args)
        self.value = value
        self.col = col

    def __eq__(self, other):
        return isinstance(other, Expr) and self.key == other.key

    def __hash__(self):
        return self._hash

    def __repr__(self):
        if self.kind == "const":
            return f"{self.value!r}:{self.vtype}"
        if self.kind == "var":
            return f"${self.col or ''}:{self.vtype}"
        return f"{self.name}({', '.join(map(repr, self.args))})"


_INTERN: dict[tuple, Expr] = {}


def _not_key(k: tuple) -> tuple:
    """not-pushdown desc normalization — Exprs/Logic.hs:36-51 notDesc."""
    head = k[0]
    if head == "not":
        return k[1]
    if head == "and":
        return ("or",) + tuple(_not_key(a) for a in k[1:])
    if head == "or":
        return ("and",) + tuple(_not_key(a) for a in k[1:])
    if head == "ne":
        return ("eq",) + k[1:]
    if head == "eq":
        return ("ne",) + k[1:]
    return ("not", k)


def _intern(e: Expr) -> Expr:
    if e.kind == "const":
        v = e.value
        if isinstance(v, list):
            v = tuple(v)
        e.skey = ("c", e.vtype, v)
        e.key = e.skey
        e.has_var = False
        e.const = e.value
    elif e.kind == "var":
        e.skey = ("v", e.vtype, e.col)
        e.key = e.skey
        e.has_var = True
        e.const = None
    else:
        e.skey = (e.name, e.vtype) + tuple(a.skey for a in e.args)
        if e.name == "not":
            e.key = _not_key(e.args[0].key)
        else:
            e.key = (e.name,) + tuple(a.key for a in e.args)
        e.has_var = any(a.has_var for a in e.args)
        e.const = None
    cached = _INTERN.get(e.skey)
    if cached is not None:
        return cached
    e._hash = hash(e.key)
    if e.kind == "func" and not e.has_var:
        v = eval_scalar(e, None)
        e.const = None if is_err(v) else v
    _INTERN[e.skey] = e
    return e


def const(vtype: str, value: Any) -> Expr:
    assert vtype in VTYPES, vtype
    if vtype.startswith("list_"):
        value = tuple(value)
    return _intern(Expr("const", vtype, value=value))


def var(vtype: str, col: str | None = None) -> Expr:
    """A variable: the current tree label (col=None) or a named column."""
    assert vtype in VTYPES, vtype
    return _intern(Expr("var", vtype, col=col))


def true_e() -> Expr:
    return const("bool", True)


def false_e() -> Expr:
    return const("bool", False)


class BuildError(ValueError):
    """Expression construction error (the reference's `Left` at mk-time)."""


# ---------------------------------------------------------------------------
# function registry
# ---------------------------------------------------------------------------


class FuncDef:
    __slots__ = ("name", "mk", "scalar", "vector")

    def __init__(self, name, mk, scalar, vector):
        self.name, self.mk, self.scalar, self.vector = name, mk, scalar, vector


FUNCS: dict[str, FuncDef] = {}
UDFS: dict[str, FuncDef] = {}


def _register(name, mk, scalar, vector):
    FUNCS[name] = FuncDef(name, mk, scalar, vector)


def register_udf(name: str, mk, scalar, vector=None):
    """Register a user-defined function (the MkFunc extension surface,
    /root/reference/src/Data/Katydid/Relapse/Exprs.hs:24, Relapse.hs:51-54).

    ``mk(args) -> result_vtype`` validates/types; ``scalar(*vals)`` evaluates
    one row (may return ERR); ``vector`` is an optional vectorized kernel
    ``(n, *(value, err) pairs) -> (value, err)`` — when absent the engine
    falls back to looping the scalar impl over the batch.
    """
    UDFS[name] = FuncDef(name, mk, scalar, vector)


def func(name: str, args: list[Expr]) -> Expr:
    """Build a function expression — the mkExpr dispatcher (Exprs.hs:28-47).

    Stdlib is consulted first, then UDFs (Parser.hs:47-52 order).
    """
    fd = FUNCS.get(name) or UDFS.get(name)
    if fd is None:
        raise BuildError(f"unknown function: {name}")
    return fd.mk(list(args))


def _mk_plain(name: str, vtype: str, args: list[Expr]) -> Expr:
    e = _intern(Expr("func", vtype, name=name, args=args))
    # trimBool/trimInt/... : fold constant expressions (Expr.hs:487-542)
    if e.const is not None and e.kind == "func":
        return const(e.vtype, e.const)
    return e


def _assert_nargs(name, args, n):
    if len(args) != n:
        raise BuildError(f"{name} expects {n} args, got {len(args)}")


def _same_scalar(name, args):
    t = args[0].vtype
    if t not in SCALAR_VTYPES or any(a.vtype != t for a in args):
        raise BuildError(f"{name}: mismatched/unsupported arg types "
                         f"{[a.vtype for a in args]}")
    return t


# ---------------------------------------------------------------------------
# scalar evaluation (the oracle path)
# ---------------------------------------------------------------------------


class LabelEnv:
    """Env binding the single current tree label, like the reference's
    ``eval :: Label -> Either String a`` (Exprs/Var.hs:36-128)."""

    __slots__ = ("vtype", "value")

    def __init__(self, vtype: str, value: Any):
        self.vtype, self.value = vtype, value

    def get_var(self, vtype: str, col: str | None):
        if col is not None:
            return ERR  # named column vars are not bound in tree context
        if vtype != self.vtype or self.value is None:
            return ERR
        return self.value


class RowEnv:
    """Env binding a flat table row: vars are named columns."""

    __slots__ = ("row", "coltypes")

    def __init__(self, row: dict, coltypes: dict[str, str]):
        self.row, self.coltypes = row, coltypes

    def get_var(self, vtype: str, col: str | None):
        if col is None or col not in self.coltypes:
            return ERR
        if self.coltypes[col] != vtype:
            return ERR
        v = self.row.get(col)
        if v is None:
            return ERR
        return tuple(v) if vtype.startswith("list_") and not isinstance(v, tuple) else v


def eval_scalar(e: Expr, env) -> Any:
    """Evaluate one expression against one label/row. Returns value or ERR."""
    if e.kind == "const":
        return e.value
    if e.kind == "var":
        return env.get_var(e.vtype, e.col) if env is not None else ERR
    fd = FUNCS.get(e.name) or UDFS.get(e.name)
    vals = [eval_scalar(a, env) for a in e.args]
    return fd.scalar(*vals)


# ---------------------------------------------------------------------------
# vector evaluation
# ---------------------------------------------------------------------------

_NP_DTYPES = {"bool": np.bool_, "int": np.int64, "uint": np.uint64, "double": np.float64}


def _is_pyscalar(v) -> bool:
    return not isinstance(v, (np.ndarray, pa.Array, pa.ChunkedArray))


def _or_masks(*masks):
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else (out | m)
    return out


def _np_bool(v, n):
    if _is_pyscalar(v):
        return np.full(n, bool(v))
    return v


def _to_np(col: pa.Array, vtype: str) -> np.ndarray:
    return col.fill_null(_NP_DTYPES[vtype](0)).to_numpy(zero_copy_only=False).astype(
        _NP_DTYPES[vtype], copy=False
    )


def _var_vector(e: Expr, batch: pa.Table):
    n = batch.num_rows
    if e.col is None or e.col not in batch.column_names:
        return _empty_of(e.vtype, n), np.ones(n, dtype=bool)
    col = batch.column(e.col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vt = arrow_type_to_vtype(col.type)
    if vt != e.vtype:
        return _empty_of(e.vtype, n), np.ones(n, dtype=bool)
    err = None
    if col.null_count:
        err = pc.is_null(col).to_numpy(zero_copy_only=False)
    if e.vtype in _NP_DTYPES:
        return _to_np(col, e.vtype), err
    return col, err


def _empty_of(vtype: str, n: int):
    if vtype in _NP_DTYPES:
        return np.zeros(n, dtype=_NP_DTYPES[vtype])
    if vtype == "string":
        return pa.nulls(n, pa.string())
    if vtype == "bytes":
        return pa.nulls(n, pa.binary())
    return pa.nulls(n, pa.list_(pa.string()))


def eval_vector(e: Expr, batch: pa.Table, memo: dict | None = None):
    """Evaluate an expression over a whole Arrow batch.

    Returns ``(value, err)`` where value is a numpy array (bool/int/uint/
    double), a pyarrow Array (string/bytes/list), or a python scalar for
    constant expressions; ``err`` is a numpy bool mask or None.

    ``memo`` (keyed on the *structural* key) provides CSE: each distinct
    predicate is evaluated once per batch no matter how many constraints
    reference it — the columnar analog of compileIfExprs' condition sharing
    (/root/reference/src/Data/Katydid/Relapse/IfExprs.hs:45-66).
    """
    if memo is None:
        memo = {}
    hit = memo.get(e.skey)
    if hit is not None:
        return hit
    if e.kind == "const":
        res = (list(e.value) if e.vtype.startswith("list_") else e.value, None)
    elif e.kind == "var":
        res = _var_vector(e, batch)
    else:
        fd = FUNCS.get(e.name) or UDFS.get(e.name)
        args = [eval_vector(a, batch, memo) for a in e.args]
        n = batch.num_rows
        if fd.vector is not None:
            res = fd.vector(n, *args)
        else:
            res = _vector_via_scalar(fd, n, args, e.vtype)
    memo[e.skey] = res
    return res


def _iter_cells(v, err, n):
    """Yield python-level cell values (or ERR) from a vector repr."""
    if _is_pyscalar(v):
        for i in range(n):
            yield ERR if (err is not None and err[i]) else v
        return
    pyvals = v.tolist() if isinstance(v, np.ndarray) else v.to_pylist()
    for i in range(n):
        yield ERR if (err is not None and err[i]) or pyvals[i] is None else pyvals[i]


def _vector_via_scalar(fd: FuncDef, n: int, args, vtype: str):
    """Fallback: loop the scalar implementation over the batch (UDFs without
    a vectorized kernel — the np.vectorize analog of SURVEY.md §2.5)."""
    its = [list(_iter_cells(v, e, n)) for (v, e) in args]
    out, err = [], np.zeros(n, dtype=bool)
    for i in range(n):
        r = fd.scalar(*(col[i] for col in its))
        if is_err(r):
            err[i] = True
            out.append(None)
        else:
            out.append(r)
    if vtype in _NP_DTYPES:
        arr = np.array([_NP_DTYPES[vtype](0) if o is None else o for o in out],
                       dtype=_NP_DTYPES[vtype])
        return arr, (err if err.any() else None)
    pa_t = {"string": pa.string(), "bytes": pa.binary()}.get(vtype)
    return pa.array(out, type=pa_t), (err if err.any() else None)


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------


def _vec_squash_bool(raw: np.ndarray | None, *errs):
    """Comparison result: False where any input errored; never errors."""
    err = _or_masks(*errs)
    if err is None:
        return raw, None
    return raw & ~err, None


def _pa_bool_to_np(arr, fill=False) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.fill_null(fill).to_numpy(zero_copy_only=False).astype(bool, copy=False)


def _both_pa(a, b, pa_type):
    """Coerce operands for a pyarrow kernel; python scalars pass through."""
    def conv(x):
        if _is_pyscalar(x):
            return pa.scalar(x, type=pa_type)
        return x
    return conv(a), conv(b)


# ---------------------------------------------------------------------------
# stdlib: comparisons (Exprs/Compare.hs)
# ---------------------------------------------------------------------------

_CMP_TYPES = ("int", "uint", "double", "bytes")  # Compare.hs:89-206
_PA_OF = {"string": pa.string(), "bytes": pa.binary()}


def _mk_eqlike(opname):
    def mk(args):
        _assert_nargs(opname, args, 2)
        _same_scalar(opname, args)
        return _mk_plain(opname, "bool", args)
    return mk


def _mk_cmp(opname):
    def mk(args):
        _assert_nargs(opname, args, 2)
        t = _same_scalar(opname, args)
        if t not in _CMP_TYPES:
            raise BuildError(f"{opname}: unsupported type {t}")
        return _mk_plain(opname, "bool", args)
    return mk


def _scalar_cmp(py_op):
    def f(a, b):
        if is_err(a) or is_err(b):
            return False  # Compare.hs:50-53 — error ⇒ False (eq AND ne alike)
        return py_op(a, b)
    return f


_PC_CMP = {
    "eq": pc.equal, "ne": pc.not_equal, "lt": pc.less, "le": pc.less_equal,
    "gt": pc.greater, "ge": pc.greater_equal,
}
_NP_CMP = {
    "eq": np.equal, "ne": np.not_equal, "lt": np.less, "le": np.less_equal,
    "gt": np.greater, "ge": np.greater_equal,
}


def _vec_cmp(opname, vtype_hint=None):
    def f(n, a, b):
        (va, ea), (vb, eb) = a, b
        if _is_pyscalar(va) and _is_pyscalar(vb):
            raw = np.full(n, bool(_NP_CMP[opname](va, vb)))
        elif isinstance(va, (pa.Array, pa.ChunkedArray)) or isinstance(vb, (pa.Array, pa.ChunkedArray)):
            pa_t = None
            for x in (va, vb):
                if isinstance(x, (pa.Array, pa.ChunkedArray)):
                    pa_t = x.type
            x, y = _both_pa(va, vb, pa_t)
            raw = _pa_bool_to_np(_PC_CMP[opname](x, y))
        else:
            raw = _NP_CMP[opname](va, vb)
            if raw.dtype != np.bool_:
                raw = raw.astype(bool)
        return _vec_squash_bool(raw, ea, eb)
    return f


import operator as _op

for _name, _pyop in [("eq", _op.eq), ("ne", _op.ne)]:
    _register(_name, _mk_eqlike(_name), _scalar_cmp(_pyop), _vec_cmp(_name))
for _name, _pyop in [("lt", _op.lt), ("le", _op.le), ("gt", _op.gt), ("ge", _op.ge)]:
    _register(_name, _mk_cmp(_name), _scalar_cmp(_pyop), _vec_cmp(_name))


# ---------------------------------------------------------------------------
# stdlib: logic (Exprs/Logic.hs)
# ---------------------------------------------------------------------------


def _scalar_not(a):
    if is_err(a):
        return True  # Logic.hs:26-32 — not of an eval error is True
    return not a


def _vec_not(n, a):
    va, ea = a
    va = _np_bool(va, n)
    out = ~va
    if ea is not None:
        out = out | ea
    return out, None


def _mk_not(args):
    _assert_nargs("not", args, 1)
    if args[0].vtype != "bool":
        raise BuildError("not: arg must be bool")
    return _mk_plain("not", "bool", args)


_register("not", _mk_not, _scalar_not, _vec_not)


def _scalar_bin_logic(py_op):
    def f(a, b):
        if is_err(a) or is_err(b):
            return ERR  # defaultAnd/defaultOr propagate errors (applicative)
        return py_op(a, b)
    return f


def _vec_bin_logic(np_op):
    def f(n, a, b):
        (va, ea), (vb, eb) = a, b
        return np_op(_np_bool(va, n), _np_bool(vb, n)), _or_masks(ea, eb)
    return f


def _key_name(e: Expr) -> str:
    return e.key[0] if isinstance(e.key, tuple) else ""


def _var_and_const(e: Expr):
    """If e's desc is eq/ne(var, const) return (var_key, const_key) — the
    varAndConst helper of Exprs/Logic.hs:98-108 extended with the var side
    (needed because our columnar vars are NAMED, unlike the reference's
    single anonymous label var)."""
    k = e.key
    if not isinstance(k, tuple) or len(k) != 3 or k[0] not in ("eq", "ne"):
        return None
    p1, p2 = k[1], k[2]
    if p1[0] == "v" and p2[0] == "c":
        return p1, p2
    if p2[0] == "v" and p1[0] == "c":
        return p2, p1
    return None


def _mk_and_raw(args):
    _assert_nargs("and", args, 2)
    if any(a.vtype != "bool" for a in args):
        raise BuildError("and: args must be bool")
    return _mk_plain("and", "bool", args)


def and_e(a: Expr, b: Expr) -> Expr:
    """Smart AND with the reference's static simplifications
    (Exprs/Logic.hs:54-87): const folding, a∧a=a, a∧¬a=False, and
    eq/ne-against-distinct-constants contradiction folding."""
    if a.const is True:
        return b
    if a.const is False:
        return false_e()
    if b.const is True:
        return a
    if b.const is False:
        return false_e()
    if a.key == b.key:
        return a
    if _key_name(a) == "not" and a.key[1] == b.key:
        return false_e()
    if _key_name(b) == "not" and b.key[1] == a.key:
        return false_e()
    na, nb = _key_name(a), _key_name(b)
    ca, cb = _var_and_const(a), _var_and_const(b)
    if ca is not None and cb is not None and ca[0] == cb[0]:  # same var
        if na == "eq" and nb == "eq":
            return a if ca[1] == cb[1] else false_e()
        if na == "eq" and nb == "ne":
            return false_e() if ca[1] == cb[1] else a
        if na == "ne" and nb == "eq":
            return false_e() if ca[1] == cb[1] else b
    return _mk_and_raw([a, b])


def or_e(a: Expr, b: Expr) -> Expr:
    """Smart OR (Exprs/Logic.hs:117-134): const folding, a∨a=a, a∨¬a=True."""
    if a.const is True:
        return true_e()
    if a.const is False:
        return b
    if b.const is True:
        return true_e()
    if b.const is False:
        return a
    if a.key == b.key:
        return a
    if _key_name(a) == "not" and a.key[1] == b.key:
        return true_e()
    if _key_name(b) == "not" and b.key[1] == a.key:
        return true_e()
    return _mk_plain("or", "bool", [a, b])


def not_e(e: Expr) -> Expr:
    return func("not", [e])


_register("and", lambda args: and_e(*args) if len(args) == 2 else _mk_and_raw(args),
          _scalar_bin_logic(lambda x, y: x and y), _vec_bin_logic(np.logical_and))
_register("or", lambda args: or_e(args[0], args[1]) if len(args) == 2 else _mk_plain("or", "bool", args),
          _scalar_bin_logic(lambda x, y: x or y), _vec_bin_logic(np.logical_or))


# ---------------------------------------------------------------------------
# stdlib: type (Exprs/Type.hs)
# ---------------------------------------------------------------------------


def _mk_type(args):
    _assert_nargs("type", args, 1)
    if args[0].vtype not in SCALAR_VTYPES:
        raise BuildError("type: unsupported arg type")
    return _mk_plain("type", "bool", args)


def _scalar_type(a):
    return not is_err(a)


def _vec_type(n, a):
    va, ea = a
    if ea is None:
        return np.ones(n, dtype=bool), None
    return ~ea, None


_register("type", _mk_type, _scalar_type, _vec_type)


# ---------------------------------------------------------------------------
# stdlib: strings (Exprs/Strings.hs) + contains (Exprs/Contains.hs)
# ---------------------------------------------------------------------------


def _mk_str2(name):
    def mk(args):
        _assert_nargs(name, args, 2)
        if args[0].vtype != "string" or args[1].vtype != "string":
            raise BuildError(f"{name}: args must be strings")
        return _mk_plain(name, "bool", args)
    return mk


def _scalar_err2(py_op):
    def f(a, b):
        if is_err(a) or is_err(b):
            return ERR  # these functions PROPAGATE errors
        return py_op(a, b)
    return f


def _mk_contains(args):
    _assert_nargs("contains", args, 2)
    t1, t2 = args[0].vtype, args[1].vtype
    if t1 == "string" and t2 == "string":
        return _mk_plain("contains", "bool", args)
    if t2 == "list_" + t1 and t1 in ("string", "int", "uint"):
        return _mk_plain("contains", "bool", args)  # Contains.hs:48-52
    raise BuildError(f"contains: unsupported types ({t1}, {t2})")


def _scalar_contains(a, b):
    if is_err(a) or is_err(b):
        return ERR
    if isinstance(b, (tuple, list)):
        return a in b
    return b in a  # contains(s, sub): sub infix-of s (Contains.hs:37-41)


def _vec_contains(n, a, b):
    (va, ea), (vb, eb) = a, b
    err = _or_masks(ea, eb)
    if isinstance(vb, (tuple, list)):  # membership against a const list
        if isinstance(va, np.ndarray):
            raw = np.isin(va, np.asarray(vb))
        elif isinstance(va, (pa.Array, pa.ChunkedArray)):
            raw = _pa_bool_to_np(pc.is_in(va, value_set=pa.array(list(vb))))
        else:
            raw = np.full(n, va in vb)
        return (raw if err is None else raw & ~err), err
    if _is_pyscalar(vb) and isinstance(va, (pa.Array, pa.ChunkedArray)):
        raw = _pa_bool_to_np(pc.match_substring(va, pattern=vb))
        return (raw if err is None else raw & ~err), err
    return _vector_via_scalar(FUNCS["contains"], n, [a, b], "bool")


_register("contains", _mk_contains, _scalar_contains, _vec_contains)


def _vec_hasprefix(n, a, b):
    (va, ea), (vb, eb) = a, b
    err = _or_masks(ea, eb)
    if _is_pyscalar(vb) and isinstance(va, (pa.Array, pa.ChunkedArray)):
        raw = _pa_bool_to_np(pc.starts_with(va, pattern=vb))
        return (raw if err is None else raw & ~err), err
    return _vector_via_scalar(FUNCS["hasPrefix"], n, [a, b], "bool")


def _vec_hassuffix(n, a, b):
    (va, ea), (vb, eb) = a, b
    err = _or_masks(ea, eb)
    if _is_pyscalar(vb) and isinstance(va, (pa.Array, pa.ChunkedArray)):
        raw = _pa_bool_to_np(pc.ends_with(va, pattern=vb))
        return (raw if err is None else raw & ~err), err
    return _vector_via_scalar(FUNCS["hasSuffix"], n, [a, b], "bool")


_register("hasPrefix", _mk_str2("hasPrefix"),
          _scalar_err2(lambda s, pre: s.startswith(pre)), _vec_hasprefix)
_register("hasSuffix", _mk_str2("hasSuffix"),
          _scalar_err2(lambda s, suf: s.endswith(suf)), _vec_hassuffix)


_RE_CACHE: dict[str, "re.Pattern"] = {}


def _re_compiled(pat: str):
    r = _RE_CACHE.get(pat)
    if r is None:
        r = _RE_CACHE[pat] = re.compile(pat)
    return r


def _scalar_regex(pat, s):
    # regex(pattern, string) — PATTERN first; unanchored search
    # (Exprs/Strings.hs:74-81).  Dialect: reference uses POSIX-ERE (TDFA);
    # we restrict specs to the common subset shared with python re / RE2.
    if is_err(pat) or is_err(s):
        return ERR
    return _re_compiled(pat).search(s) is not None


def _vec_regex(n, a, b):
    (vpat, epat), (vs, es) = a, b
    err = _or_masks(epat, es)
    if _is_pyscalar(vpat) and isinstance(vs, (pa.Array, pa.ChunkedArray)):
        raw = _pa_bool_to_np(pc.match_substring_regex(vs, pattern=vpat))
        return (raw if err is None else raw & ~err), err
    return _vector_via_scalar(FUNCS["regex"], n, [a, b], "bool")


_register("regex", _mk_str2("regex"), _scalar_regex, _vec_regex)


def _mk_str1(name):
    def mk(args):
        _assert_nargs(name, args, 1)
        if args[0].vtype != "string":
            raise BuildError(f"{name}: arg must be string")
        return _mk_plain(name, "string", args)
    return mk


def _scalar_err1(py_op):
    def f(a):
        if is_err(a):
            return ERR
        return py_op(a)
    return f


def _vec_str1(kernel, pyop):
    def f(n, a):
        va, ea = a
        if isinstance(va, (pa.Array, pa.ChunkedArray)):
            return kernel(va), ea
        return pyop(va), ea
    return f


_register("toLower", _mk_str1("toLower"), _scalar_err1(str.lower),
          _vec_str1(pc.utf8_lower, str.lower))
_register("toUpper", _mk_str1("toUpper"), _scalar_err1(str.upper),
          _vec_str1(pc.utf8_upper, str.upper))


# ---------------------------------------------------------------------------
# stdlib: length (Exprs/Length.hs) and elem (Exprs/Elem.hs)
# ---------------------------------------------------------------------------


def _mk_length(args):
    _assert_nargs("length", args, 1)
    t = args[0].vtype
    if not (t.startswith("list_") or t in ("string", "bytes")):
        raise BuildError(f"length: unsupported type {t}")
    return _mk_plain("length", "int", args)


def _scalar_length(a):
    if is_err(a):
        return ERR
    return len(a)  # chars for str (Text.length), bytes for bytes, items for list


def _vec_length(n, a):
    va, ea = a
    if _is_pyscalar(va):
        return np.full(n, len(va), dtype=np.int64), ea
    t = va.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        raw = pc.utf8_length(va)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        raw = pc.binary_length(va)
    else:
        raw = pc.list_value_length(va)
    return raw.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64), ea


_register("length", _mk_length, _scalar_length, _vec_length)


def _mk_elem(args):
    _assert_nargs("elem", args, 2)
    t1, t2 = args[0].vtype, args[1].vtype
    if not t1.startswith("list_") or t2 != "int":
        raise BuildError(f"elem: unsupported types ({t1}, {t2})")
    return _mk_plain("elem", t1.removeprefix("list_"), args)


def _scalar_elem(xs, i):
    if is_err(xs) or is_err(i):
        return ERR
    if i < 0 or i >= len(xs):
        return ERR  # Haskell (!!) is partial — OOB is an eval error
    return xs[i]


def _vec_elem(n, a, b):
    (va, ea), (vb, eb) = a, b
    if not isinstance(va, (pa.Array, pa.ChunkedArray)) or not _is_pyscalar(vb):
        return _vector_via_scalar(FUNCS["elem"], n, [a, b], "string")
    if isinstance(va, pa.ChunkedArray):
        va = va.combine_chunks()
    lens = pc.list_value_length(va).fill_null(0).to_numpy(zero_copy_only=False)
    oob = (vb < 0) | (vb >= lens.astype(np.int64))
    err = _or_masks(ea, eb, oob if oob.any() else None)
    idx = np.minimum(np.maximum(lens - 1, 0), vb)  # clamp; err rows masked anyway
    offsets = va.offsets.to_numpy(zero_copy_only=False)[:-1]
    taken = pc.take(va.values, pa.array(offsets + idx, type=pa.int64()))
    vt = arrow_type_to_vtype(va.type.value_type)
    if vt in _NP_DTYPES:
        return _to_np(taken, vt), err
    return taken, err


_register("elem", _mk_elem, _scalar_elem, _vec_elem)


# ---------------------------------------------------------------------------
# builtin operator sugar (Exprs.hs:57-79)
# ---------------------------------------------------------------------------

BUILTIN_SYMBOLS = {
    "==": "eq", "!=": "ne", "<": "lt", ">": "gt", "<=": "le", ">=": "ge",
    "~=": "regex", "*=": "contains", "^=": "hasPrefix", "$=": "hasSuffix",
    "::": "type",
}


def builtin(symbol: str, const_expr: Expr, col: str | None = None) -> Expr:
    """Expand ``field op const`` sugar exactly as mkBuiltIn does:
    type(var) for ``::``, regex(const, var) for ``~=``, else op(var, const).
    ``col=None`` produces tree-label vars; a name produces column vars."""
    name = BUILTIN_SYMBOLS.get(symbol)
    if name is None:
        raise BuildError(f"unexpected builtin symbol {symbol}")
    if name == "type":
        return func(name, [var(const_expr.vtype, col)])
    v = var(const_expr.vtype if name != "contains" or not const_expr.vtype.startswith("list_")
            else const_expr.vtype.removeprefix("list_"), col)
    if name == "regex":
        return func(name, [const_expr, var("string", col)])
    return func(name, [v, const_expr])
