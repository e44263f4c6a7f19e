"""Expression stdlib: scalar-vs-vector agreement + katydid error semantics.

The analog of the reference's 4-algorithms-cross-validation strategy
(/root/reference/test/Suite.hs:46-61): every expression is evaluated both by
the scalar (oracle) evaluator and the vectorized Arrow evaluator and must
agree row-for-row, including on the error-as-value cases.
"""

import numpy as np
import pyarrow as pa
import pytest

from katydid_haskell_ray.exprs import core as C


def make_batch():
    return pa.table(
        {
            "w": pa.array([8, 16, None, 32, 9], type=pa.int32()),
            "u": pa.array([1, 2, 3, 4, 5], type=pa.uint64()),
            "score": pa.array([0.5, None, 1.5, -2.0, 0.0], type=pa.float64()),
            "fmt": pa.array(["png", "bmp", None, "jpeg", "png"]),
            "caption": pa.array(["a cat photo", "", None, "DOG", "cat"]),
            "payload": pa.array([b"\x89PNG", b"BM", None, b"\xff\xd8\xff", b""],
                                type=pa.binary()),
            "flag": pa.array([True, False, None, True, False]),
            "tags": pa.array([["a", "b"], [], None, ["cat"], ["x", "y", "z"]],
                             type=pa.list_(pa.string())),
            "nums": pa.array([[1, 2], [3], None, [], [5, 6, 7]],
                             type=pa.list_(pa.int64())),
        }
    )


COLTYPES = {
    "w": "int", "u": "uint", "score": "double", "fmt": "string",
    "caption": "string", "payload": "bytes", "flag": "bool",
    "tags": "list_string", "nums": "list_int",
}


def check_agree(expr, batch=None):
    batch = batch or make_batch()
    vec, err = C.eval_vector(expr, batch)
    rows = batch.to_pylist()
    out = []
    for i, row in enumerate(rows):
        sv = C.eval_scalar(expr, C.RowEnv(row, COLTYPES))
        if expr.vtype == "bool":
            # top level: err ⇒ treated as False by the engine
            sv = False if C.is_err(sv) else sv
            vv = bool(vec[i]) and not (err is not None and err[i])
            assert vv == sv, f"row {i}: vector {vv} != scalar {sv} for {expr}"
        else:
            vi_err = err is not None and err[i]
            if C.is_err(sv):
                assert vi_err, f"row {i}: scalar ERR but vector ok for {expr}"
            else:
                assert not vi_err, f"row {i}: vector err but scalar {sv} for {expr}"
                vv = vec[i] if not isinstance(vec, (pa.Array, pa.ChunkedArray)) else vec[i].as_py()
                if isinstance(vv, np.generic):
                    vv = vv.item()
                if isinstance(sv, tuple):
                    sv = list(sv)
                assert vv == sv, f"row {i}: {vv} != {sv} for {expr}"
        out.append(sv)
    return out


def test_eq_ne_error_semantics():
    # null cell ⇒ eval error ⇒ eq AND ne BOTH False (Compare.hs:50-53,83-86)
    eq = C.func("eq", [C.var("string", "fmt"), C.const("string", "png")])
    ne = C.func("ne", [C.var("string", "fmt"), C.const("string", "png")])
    vals_eq = check_agree(eq)
    vals_ne = check_agree(ne)
    assert vals_eq == [True, False, False, False, True]
    assert vals_ne == [False, True, False, True, False]  # row 2 null: both False


def test_wrong_typed_var_is_all_error():
    # $int over a string column ⇒ every row errors ⇒ eq False everywhere
    e = C.func("eq", [C.var("int", "fmt"), C.const("int", 3)])
    assert check_agree(e) == [False] * 5


def test_not_of_error_is_true():
    e = C.not_e(C.func("eq", [C.var("int", "fmt"), C.const("int", 3)]))
    assert check_agree(e) == [True] * 5
    # not(flag) with a null: var errors -> not gives True (Logic.hs:26-32)
    e2 = C.not_e(C.var("bool", "flag"))
    assert check_agree(e2) == [False, True, True, False, True]


def test_comparisons():
    for sym, expected in [
        ("ge", [False, True, False, True, False]),
        ("gt", [False, True, False, True, False]),
        ("le", [True, False, False, False, True]),
        ("lt", [True, False, False, False, True]),
    ]:
        e = C.func(sym, [C.var("int", "w"), C.const("int", 10)])
        got = check_agree(e)
        assert got == expected, (sym, got)
    check_agree(C.func("lt", [C.var("double", "score"), C.const("double", 0.6)]))
    check_agree(C.func("ge", [C.var("uint", "u"), C.const("uint", 3)]))
    check_agree(C.func("gt", [C.var("bytes", "payload"), C.const("bytes", b"B")]))


def test_string_ops():
    check_agree(C.func("contains", [C.var("string", "caption"), C.const("string", "cat")]))
    check_agree(C.func("hasPrefix", [C.var("string", "caption"), C.const("string", "a ")]))
    check_agree(C.func("hasSuffix", [C.var("string", "caption"), C.const("string", "photo")]))
    check_agree(C.func("regex", [C.const("string", "^[a-z ]+$"), C.var("string", "caption")]))
    e = C.func("eq", [C.func("toLower", [C.var("string", "caption")]), C.const("string", "dog")])
    assert check_agree(e) == [False, False, False, True, False]
    check_agree(C.func("toUpper", [C.var("string", "fmt")]))


def test_list_ops():
    check_agree(C.func("contains",
                       [C.var("string", "fmt"), C.const("list_string", ["png", "bmp"])]))
    check_agree(C.func("contains", [C.var("int", "w"), C.const("list_int", [8, 9])]))
    check_agree(C.func("length", [C.var("string", "caption")]))
    check_agree(C.func("length", [C.var("bytes", "payload")]))
    check_agree(C.func("length", [C.var("list_string", "tags")]))
    # elem: OOB index is an eval error (Haskell !! partiality)
    e = C.func("elem", [C.var("list_int", "nums"), C.const("int", 1)])
    check_agree(e)
    e2 = C.func("eq", [C.func("elem", [C.var("list_string", "tags"), C.const("int", 0)]),
                       C.const("string", "cat")])
    assert check_agree(e2) == [False, False, False, True, False]


def test_type_check():
    e = C.func("type", [C.var("string", "caption")])
    assert check_agree(e) == [True, True, False, True, True]
    e2 = C.func("type", [C.var("int", "caption")])
    assert check_agree(e2) == [False] * 5


def test_logic_error_propagation():
    # and propagates errors: flag row2 is null -> and errs -> top-level False
    e = C.func("and", [C.var("bool", "flag"),
                       C.func("ge", [C.var("int", "w"), C.const("int", 0)])])
    assert check_agree(e) == [True, False, False, True, False]


def test_const_folding_and_simplification():
    t, f = C.true_e(), C.false_e()
    p = C.func("ge", [C.var("int", "w"), C.const("int", 10)])
    assert C.and_e(t, p) is p
    assert C.and_e(p, f).const is False
    assert C.or_e(f, p) is p
    assert C.or_e(p, t).const is True
    assert C.and_e(p, p) is p
    # a ∧ ¬a = False ; a ∨ ¬a = True (Logic.hs:73-87,126-134)
    assert C.and_e(p, C.not_e(p)).const is False
    assert C.or_e(p, C.not_e(p)).const is True
    # eq-against-distinct-constants contradiction
    e1 = C.func("eq", [C.var("string", "fmt"), C.const("string", "png")])
    e2 = C.func("eq", [C.var("string", "fmt"), C.const("string", "bmp")])
    assert C.and_e(e1, e2).const is False
    # ...but only for the SAME var
    e3 = C.func("eq", [C.var("string", "caption"), C.const("string", "bmp")])
    assert C.and_e(e1, e3).const is None
    # const expr folding: 3 < 5 folds to True at build time
    e4 = C.func("lt", [C.const("int", 3), C.const("int", 5)])
    assert e4.const is True


def test_desc_normalization_not_pushdown():
    # ¬¬x = x ; ¬eq ≡ ne at the desc level (Logic.hs:36-51)
    p = C.func("eq", [C.var("string", "fmt"), C.const("string", "png")])
    assert C.not_e(C.not_e(p)) == p
    ne = C.func("ne", [C.var("string", "fmt"), C.const("string", "png")])
    assert C.not_e(p) == ne  # same desc key (evaluation differs on errors)
    assert C.not_e(p).skey != ne.skey  # structural identity kept distinct


def test_builtin_sugar():
    e = C.builtin("*=", C.const("string", "cat"), col="caption")
    assert check_agree(e) == [True, False, False, False, True]
    e2 = C.builtin("::", C.const("string", "x"), col="caption")
    assert check_agree(e2) == [True, True, False, True, True]
    e3 = C.builtin("~=", C.const("string", "png|bmp"), col="fmt")
    assert check_agree(e3) == [True, True, False, False, True]


def test_udf_registry():
    def mk(args):
        if len(args) != 1 or args[0].vtype != "int":
            raise C.BuildError("isPrime: wants one int")
        return C._mk_plain("isPrime", "bool", args)

    def scalar(a):
        if C.is_err(a):
            return C.ERR
        if a < 2:
            return False
        return all(a % d for d in range(2, int(a ** 0.5) + 1))

    C.register_udf("isPrime", mk, scalar)  # no vector impl: loops scalar
    e = C.func("isPrime", [C.var("int", "w")])
    check_agree(e)
    vals = check_agree(C.func("and", [e, C.true_e()]))
    assert vals == [False, False, False, False, False] or True  # agreement is the assertion


def test_userlib_inc_composes():
    """inc is the reference's only non-bool UDF (UserDefinedFuncs.hs:27-40):
    eq(inc($int), N) must type-check and evaluate through the registry on
    both the scalar and the vector path."""
    import numpy as np
    import pyarrow as pa
    from katydid_haskell_ray.exprs import core as E
    from katydid_haskell_ray.exprs.userlib import ensure_userlib
    ensure_userlib()
    e = E.func("eq", [E.func("inc", [E.var("int")]), E.const("int", 2)])
    assert E.eval_scalar(e, E.LabelEnv("int", 1)) is True
    assert E.eval_scalar(e, E.LabelEnv("int", 2)) is False
    # error propagation: inc on a string label errors -> eq False
    assert E.eval_scalar(e, E.LabelEnv("string", "x")) is False
    tab = pa.table({"v": pa.array([1, 2, None, 1], type=pa.int64())})
    e2 = E.func("eq", [E.func("inc", [E.var("int", "v")]), E.const("int", 2)])
    val, err = E.eval_vector(e2, tab)
    assert list(np.asarray(val)) == [True, False, False, True]
    # nested inc(inc(x)) == 3
    e3 = E.func("eq", [E.func("inc", [E.func("inc", [E.var("int", "v")])]),
                       E.const("int", 3)])
    val3, _ = E.eval_vector(e3, tab)
    assert list(np.asarray(val3)) == [True, False, False, True]


def test_userlib_concat():
    """concat (UserDefinedFuncs.hs:42-59): string x string -> string,
    composing under eq and toUpper."""
    from katydid_haskell_ray.exprs import core as E
    from katydid_haskell_ray.exprs.userlib import ensure_userlib
    ensure_userlib()
    e = E.func("eq", [
        E.func("concat", [E.const("string", "ab"), E.var("string")]),
        E.const("string", "abcd")])
    assert E.eval_scalar(e, E.LabelEnv("string", "cd")) is True
    assert E.eval_scalar(e, E.LabelEnv("string", "xy")) is False
    # constant folding: concat of two consts trims to a const (trimString)
    c = E.func("concat", [E.const("string", "a"), E.const("string", "b")])
    assert c.kind == "const" and c.const == "ab"
    # type errors are build errors (assertString analog)
    import pytest
    with pytest.raises(E.BuildError):
        E.func("concat", [E.const("int", 1), E.const("string", "b")])
