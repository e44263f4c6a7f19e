"""Pattern algebra + derivative evaluation tests.

Covers: smart-constructor normalization (Smart.hs analog tests), JSON->tree
conventions (Json.hs:39-58), and validation semantics for every pattern
combinator, cross-validated between the plain evaluator (Derive.hs) and the
memoized evaluator (MemDerive.hs) — the reference's 4-algorithms-must-agree
strategy (/root/reference/test/Suite.hs:46-61).
"""

import pytest

from katydid_haskell_ray import derive as D
from katydid_haskell_ray import patterns as P
from katydid_haskell_ray import spec as S
from katydid_haskell_ray import trees as T
from katydid_haskell_ray.exprs import core as E


def validate_both(doc: dict, json_text: str) -> bool:
    g = S.compile_spec(doc)
    forest = T.json_to_forest(json_text)
    plain = D.validate_forest(g, forest)
    memo = D.MemDeriver(g).validate(forest)
    assert plain == memo, f"plain {plain} != memo {memo} for {doc} on {json_text}"
    return plain


# -- smart constructors ------------------------------------------------------


def test_smart_constructor_normalization():
    assert P.not_p(P.not_p(P.zany_p)) is P.zany_p
    assert P.concat_p(P.empty_p, P.zany_p) is P.zany_p
    assert P.concat_p(P.empty_set, P.zany_p) is P.empty_set
    leaf = P.node_p(E.builtin("==", E.const("string", "x")), P.empty_p)
    # ZAny·p·ZAny -> Contains p (Smart.hs:224)
    c = P.concat_p(P.zany_p, P.concat_p(leaf, P.zany_p))
    assert c.kind == P.CONTAINS and c.pat is leaf
    # or absorption
    assert P.or_p(leaf, P.zany_p) is P.zany_p
    assert P.or_p(leaf, P.empty_set) is leaf
    assert P.or_p(leaf, leaf) is leaf
    # and absorption
    assert P.and_p(leaf, P.zany_p) is leaf
    assert P.and_p(leaf, P.empty_set) is P.empty_set
    assert P.and_p(leaf, P.empty_p) is P.empty_set  # leaf not nullable
    # Node with statically-false expr -> EmptySet
    assert P.node_p(E.false_e(), P.empty_p) is P.empty_set
    # leaf-predicate merging inside or
    leaf2 = P.node_p(E.builtin("==", E.const("string", "y")), P.empty_p)
    merged = P.or_p(leaf, leaf2)
    assert merged.kind == P.NODE  # one node with or-ed predicate
    # interleave unit handling
    assert P.interleave_p(P.empty_p, leaf) is leaf
    assert P.interleave_p(P.empty_p, P.empty_p) is P.empty_p
    assert P.interleave_p(P.empty_set, leaf) is P.empty_set


def test_zippy():
    leaf = P.node_p(E.builtin("==", E.const("string", "x")), P.empty_p)
    state = [P.zany_p, leaf, P.empty_set, leaf]
    zs, zipper = D.zippy(state)
    assert zs == (leaf,)
    assert D.unzipby(zipper, [False]) == [True, False, False, False]
    assert D.unzipby(zipper, [True]) == [True, True, False, True]


def test_recursion_rejected():
    with pytest.raises(S.SpecError, match="recursion"):
        S.compile_spec({"main": {"ref": "a"},
                        "refs": {"a": {"concat": [{"ref": "a"}, "zany"]}}})


# -- json conventions --------------------------------------------------------


def test_json_forest_shape():
    f = T.json_to_forest('{"a": 1, "b": [true, "x"], "c": null}')
    # c: null -> node exists with no children?? NO: null VALUE -> key node with
    # no children (uValue JSNull = []); the KEY node itself still exists.
    assert len(f) == 3
    (la, ca), (lb, cb), (lc, cc) = f
    assert la == ("string", "a") and ca == ((("int", 1), ()),)
    assert lb == ("string", "b")
    assert cb[0][0] == ("int", 0) and cb[0][1][0][0] == ("bool", True)
    assert cb[1][0] == ("int", 1) and cb[1][1][0][0] == ("string", "x")
    assert lc == ("string", "c") and cc == ()
    # integral float -> Int (Json.hs:42-44)
    f2 = T.json_to_forest("[2.0, 2.5]")
    assert f2[0][1][0][0] == ("int", 2)
    assert f2[1][1][0][0] == ("double", 2.5)


# -- validation semantics per combinator ------------------------------------

FIELD_A1 = {"field": "a", "child": {"leaf": {"op": "==", "value": {"int": 1}}}}
FIELD_B = {"field": "b", "child": "zany"}


def test_validate_leaf_eq():
    assert validate_both({"main": FIELD_A1}, '{"a": 1}')
    assert not validate_both({"main": FIELD_A1}, '{"a": 2}')
    assert not validate_both({"main": FIELD_A1}, '{"b": 1}')
    # wrong type: a="1" (string) — eq errors -> False
    assert not validate_both({"main": FIELD_A1}, '{"a": "1"}')


def test_validate_concat_order():
    doc = {"main": {"concat": [FIELD_A1, FIELD_B]}}
    assert validate_both(doc, '{"a": 1, "b": 9}')
    assert not validate_both(doc, '{"b": 9, "a": 1}')  # concat is ordered
    assert not validate_both(doc, '{"a": 1}')


def test_validate_interleave_any_order():
    doc = {"main": {"interleave": [FIELD_A1, FIELD_B]}}
    assert validate_both(doc, '{"a": 1, "b": 9}')
    assert validate_both(doc, '{"b": 9, "a": 1}')  # interleave is unordered
    assert not validate_both(doc, '{"a": 1}')
    assert not validate_both(doc, '{"a": 1, "b": 9, "c": 0}')


def test_validate_or_and_not():
    doc = {"main": {"or": [FIELD_A1, FIELD_B]}}
    assert validate_both(doc, '{"a": 1}')
    assert validate_both(doc, '{"b": 2}')
    assert not validate_both(doc, '{"c": 3}')
    doc2 = {"main": {"and": [{"contains": FIELD_A1}, {"contains": FIELD_B}]}}
    assert validate_both(doc2, '{"x": 0, "a": 1, "b": 2}')
    assert not validate_both(doc2, '{"x": 0, "a": 1}')
    doc3 = {"main": {"not": FIELD_A1}}
    assert not validate_both(doc3, '{"a": 1}')
    assert validate_both(doc3, '{"a": 2}')
    assert validate_both(doc3, '{}')  # empty forest: Node not nullable -> not matches


def test_validate_star_optional():
    item = {"field": "x", "child": "zany"}
    doc = {"main": {"star": item}}
    assert validate_both(doc, "{}")
    assert validate_both(doc, '{"x": 1}')
    assert validate_both(doc, '{"x": 1, "x2": 2}') is False
    doc2 = {"main": {"concat": [FIELD_A1, {"optional": FIELD_B}]}}
    assert validate_both(doc2, '{"a": 1}')
    assert validate_both(doc2, '{"a": 1, "b": 2}')
    assert not validate_both(doc2, '{"a": 1, "b": 2, "c": 3}')


def test_validate_contains():
    doc = {"main": {"contains": FIELD_A1}}
    assert validate_both(doc, '{"x": 0, "a": 1, "y": 2}')
    assert validate_both(doc, '{"a": 1}')
    assert not validate_both(doc, '{"x": 0}')
    assert not validate_both(doc, "{}")


def test_validate_nested():
    # Person:{Name:*;(Addr:*)?;(Email:*)*} — the ParserSpec.hs:248-258 shape
    doc = {"main": {"field": "Person", "child": {"interleave": [
        {"field": "Name", "child": "zany"},
        {"optional": {"field": "Addr", "child": "zany"}},
        {"star": {"field": "Email", "child": "zany"}},
    ]}}}
    assert validate_both(doc, '{"Person": {"Name": "ann"}}')
    assert validate_both(doc, '{"Person": {"Addr": "x", "Name": "ann"}}')
    # Email is ONE node (the key) whose children are Int-indexed array items;
    # (Email:*)* with zany child matches it regardless of arity
    assert validate_both(
        doc, '{"Person": {"Email": ["a@b", "c@d"], "Name": "ann"}}')
    assert validate_both(
        doc, '{"Person": {"Name": "ann", "Email": ["a@b"]}}')
    assert not validate_both(doc, '{"Person": {}}')
    assert not validate_both(doc, '{"Person": {"Name": "ann", "Phone": 1}}')


def test_validate_references():
    doc = {
        "main": {"field": "r", "child": {"ref": "val"}},
        "refs": {"val": {"or": [
            {"leaf": {"op": ">=", "value": {"int": 10}}},
            {"leaf": {"op": "==", "value": {"string": "none"}}},
        ]}},
    }
    assert validate_both(doc, '{"r": 15}')
    assert validate_both(doc, '{"r": "none"}')
    assert not validate_both(doc, '{"r": 5}')
    assert not validate_both(doc, '{"r": "some"}')


def test_validate_zany_everything():
    doc = {"main": "zany"}
    for t in ["{}", '{"a":1}', '[1,2,3]', '"hello"', "5"]:
        assert validate_both(doc, t)
    doc2 = {"main": "emptyset"}
    for t in ["{}", '{"a":1}']:
        assert not validate_both(doc2, t)


def test_validate_top_level_forest():
    # a JSON array is a FOREST of Int-indexed nodes (Relapse.hs:10-14)
    doc = {"main": {"concat": [
        {"node": {"op": "==", "value": {"int": 0}},
         "child": {"leaf": {"op": "::", "value": {"int": 0}}}},
        {"node": {"op": "==", "value": {"int": 1}}, "child": "zany"},
    ]}}
    assert validate_both(doc, "[7, 8]")
    assert not validate_both(doc, "[7]")
    assert not validate_both(doc, '["x", 8]')


def test_memo_cache_grows_and_hits():
    g = S.compile_spec({"main": {"interleave": [
        {"field": "a", "child": "zany"},
        {"optional": {"field": "b", "child": "zany"}},
    ]}})
    m = D.MemDeriver(g)
    docs = ['{"a":1}', '{"a":1,"b":2}', '{"b":2,"a":1}', '{"a":5}', '{"c":1}']
    res = [m.validate(T.json_to_forest(d)) for d in docs]
    assert res == [True, True, True, True, False]
    calls1, returns1 = m.cache_sizes()
    # re-validating hits the warm cache without growth
    res2 = [m.validate(T.json_to_forest(d)) for d in docs]
    assert res2 == res
    assert m.cache_sizes() == (calls1, returns1)


def test_error_semantics_in_tree_context():
    # not(eq($int, 1)) on a STRING label: eq errors -> False -> not -> True
    doc = {"main": {"node": {"func": "not", "args": [
        {"func": "eq", "args": [{"var": "int"}, {"int": 1}]}]},
        "child": "zany"}}
    assert validate_both(doc, '{"a": 1}')  # label "a" is a string -> True
    assert validate_both(doc, "[5]") is True  # Int 5: not(5==1) = True... index label is Int 0
    doc2 = {"main": {"leaf": {"func": "not", "args": [
        {"func": "eq", "args": [{"var": "int"}, {"int": 5}]}]}}}
    assert not validate_both(doc2, "5")
    assert validate_both(doc2, "4")
    assert validate_both(doc2, '"five"')  # type-mismatch: eq False, not True


def test_condition_error_aborts_whole_tree():
    # A top-level condition eval error aborts the ENTIRE document with False
    # (reference: evalIf threads Either, any Left -> validate False,
    # MemDerive.hs / IfExprs.hs:50-54) — even when another or-branch would
    # have matched.  Bare $bool var on a string label errors.
    doc = {"main": {"or": [
        {"contains": {"node": {"var": "bool"}, "child": "empty"}},
        {"contains": {"leaf": {"op": "==", "value": {"string": "x"}}}},
    ]}}
    g = S.compile_spec(doc)
    forest = T.json_to_forest('"x"')
    assert D.validate_forest(g, forest) is False
    assert D.MemDeriver(g).validate(forest) is False
    assert D.VpaDeriver(g).validate(forest) is False
    # on a bool label the same grammar matches via the first branch
    forest_b = ((("bool", True), ()),)
    assert D.validate_forest(g, forest_b) is True
    assert D.MemDeriver(g).validate(forest_b) is True


# -- DeriveSpec.hs golden derivative tests (exact pattern structure) ---------


def _derive_concrete(grammar_src, labels):
    """Parse concrete syntax, derive w.r.t. leaf nodes with the given
    labels, return the resulting pattern object."""
    from katydid_haskell_ray import relapse_parser as RP
    g = RP.compile_relapse(grammar_src)
    forest = tuple(((t, v), ()) for t, v in labels)
    return D.derive_forest(g, forest)


def test_derive_golden_two_ors():
    # DeriveSpec.hs "two ors": d((==1 | !(==2)), Int 1) == *
    from katydid_haskell_ray import relapse_parser as RP
    got = _derive_concrete("(== 1 | !(== 2))", [("int", 1)])
    want = RP.compile_relapse("*").main
    assert got is want  # hash-consing: structural equality is identity


def test_derive_golden_two_interleaves():
    # DeriveSpec.hs "two interleaves":
    # d({==1 ; !(==2)}, Int 1) == ({<empty>;!(==2)} | {==1;*})
    from katydid_haskell_ray import relapse_parser as RP
    got = _derive_concrete("{== 1 ; !(== 2)}", [("int", 1)])
    want = RP.compile_relapse("({<empty>;!(== 2)}|{== 1;*})").main
    assert got is want, f"{got!r} != {want!r}"


def test_interleave_remove_one_for_each_three_way():
    # the removeOneForEach combinatorics (Derive.hs:96-101) through a
    # 3-way interleave: each alternative consumes the node in one slot
    from katydid_haskell_ray import relapse_parser as RP
    got = _derive_concrete("{a:<empty> ; b:<empty> ; c:<empty>}",
                           [("string", "b")])
    want = RP.compile_relapse("{a:<empty> ; c:<empty>}").main
    assert got is want
    got2 = _derive_concrete("{a:<empty> ; b:<empty> ; c:<empty>}",
                            [("string", "a"), ("string", "c")])
    want2 = RP.compile_relapse("b:<empty>").main
    assert got2 is want2
