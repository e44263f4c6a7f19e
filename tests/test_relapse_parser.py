"""Concrete Relapse syntax parser tests, shapes from the reference's
~100-case parser suite (/root/reference/test/ParserSpec.hs:56-350)."""

import pytest

from katydid_haskell_ray import derive as D
from katydid_haskell_ray import relapse_parser as RP
from katydid_haskell_ray import trees as T
from katydid_haskell_ray.exprs import core as E


def v(src, doc_json):
    g = RP.compile_relapse(src)
    return D.MemDeriver(g).validate(T.json_to_forest(doc_json))


def test_atoms():
    assert v("*", '{"anything": 1}')
    assert v("<empty>", "null")  # empty forest
    assert not v("<empty>", "5")
    assert not v("!(*)", "{}") and not v("!(*)", "5")


def test_person_page195():
    src = "Person:{Name:*;(Addr:*)?;(Email:*)*}"
    assert v(src, '{"Person": {"Name": "ann"}}')
    assert v(src, '{"Person": {"Addr": "x", "Name": "ann"}}')
    assert v(src, '{"Person": {"Name": "a", "Email": ["e1", "e2"]}}')
    assert not v(src, '{"Person": {"Phone": 1}}')
    assert not v(src, '{"Person": {}}')


def test_builtin_leaves():
    assert v("a:== 1", '{"a": 1}')
    assert not v("a:== 1", '{"a": 2}')
    assert v('a:~= "^c.t$"', '{"a": "cat"}')
    assert not v('a:~= "^c.t$"', '{"a": "dog"}')
    assert v('a :: $string', '{"a": "s"}')
    assert not v('a :: $string', '{"a": 5}')
    # name-direct builtin sugar (A == "x")
    assert v('a == "x"', '{"a": "x"}')
    assert not v('a == "x"', '{"a": "y"}')
    assert v("a -> eq($int, 3)", '{"a": 3}')
    assert v("a:>= 10", '{"a": 11}')
    assert v('a:^= "pre"', '{"a": "prefix"}')
    # literal bases: hex and octal (ParserSpec int cases)
    assert v("a:== 0xff", '{"a": 255}')
    assert v("a:== 017", '{"a": 15}')
    assert v("a:== -5", '{"a": -5}')
    assert v("a:== 2.5", '{"a": 2.5}')
    assert v("a:== true", '{"a": true}')


def test_arrow_function_leaves():
    assert v("a:->eq($int, 1)", '{"a": 1}')
    assert not v("a:->eq($int, 1)", '{"a": 2}')
    # error-as-value through the concrete syntax too: not(eq) of a
    # type-mismatch is True
    assert v("a:->not(eq($int, 1))", '{"a": "x"}')


def test_combinators():
    assert v("[a:*,b:*]", '{"a": 1, "b": 2}')
    assert not v("[a:*,b:*]", '{"b": 2, "a": 1}')
    assert v("{a:*;b:*}", '{"b": 2, "a": 1}')
    assert v("(a:*|b:*)", '{"b": 1}')
    assert v("(*&a:*)", '{"a": 1}')
    assert v("(a:*)*", "{}")
    assert v("(a:*)*", '{"a": 1}')
    assert v(".b:*", '{"a": 0, "b": 1, "c": 2}')
    assert not v(".b:*", '{"a": 0}')
    assert v("_:*", '{"whatever": 1}')
    assert not v("_:*", "{}")


def test_references_and_decls():
    src = "#main = @val #val = (a:*|b:*)"
    assert v(src, '{"a": 1}') and v(src, '{"b": 1}')
    assert not v(src, '{"c": 1}')
    # main as bare leading pattern + extra decls
    src2 = "@x #x = a:== 1"
    assert v(src2, '{"a": 1}')


def test_comments_and_whitespace():
    src = "/* block */ Person : { Name:* ; (Addr:*)? } // line\n"
    assert v(src, '{"Person": {"Name": "x"}}')


def test_bytes_literals():
    g = RP.parse("a:== []byte{46, 0x2E, '\\x2E'}")
    leaf = g["main"]["child"]["leaf"]
    import base64
    assert base64.b64decode(leaf["value"]["bytes"].removeprefix("base64:")) == b"..."


def test_parse_errors():
    for bad in ["(", "[]", "{a:*;", "a:", "#main", "/*bla", "@", "(a:*|b:*&c:*)"]:
        with pytest.raises(RP.RelapseSyntaxError):
            RP.parse(bad)


def test_parses_match_json_dsl():
    """The concrete-syntax path and the JSON-DSL path must compile to the
    SAME interned grammar object for equivalent inputs."""
    from katydid_haskell_ray import spec as S
    g1 = RP.compile_relapse("Person:{Name:*;(Addr:*)?}")
    g2 = S.compile_spec({"main": {"field": "Person", "child": {"interleave": [
        {"field": "Name", "child": "zany"},
        {"optional": {"field": "Addr", "child": "zany"}}]}}})
    assert g1.main is g2.main  # hash-consing: identical structure, same object


def test_name_choice():
    """ParserSpec.hs "name or": (a|b) is or(eq($string,a), eq($string,b))."""
    src = "(a|b):*"
    assert v(src, '{"a": 1}')
    assert v(src, '{"b": 1}')
    assert not v(src, '{"c": 1}')
    # three-way left fold
    src3 = "(a|b|c):*"
    assert v(src3, '{"c": 1}') and not v(src3, '{"d": 1}')


def test_name_negation():
    """ParserSpec.hs "not pattern, not name and != conflicts" — !(A):* is a
    node with negated name; !(*) stays a pattern-not."""
    assert v("!(A):*", '{"B": 2}')
    assert not v("!(A):*", '{"A": 2}')
    assert not v("!(*)", "{}")
    # nested: !((a|b)):* accepts anything but a and b
    assert v("!((a|b)):*", '{"c": 1}')
    assert not v("!((a|b)):*", '{"a": 1}')


def test_name_literals():
    """ParserSpec.hs name bool/int cases: typed name expressions."""
    # int name: JSON arrays index with Int labels
    assert v("(0|1):*", "[7]")
    assert not v("(2|3):*", "[7]")
    # bool name via explicit forest (JSON has no bool labels)
    g = RP.compile_relapse("true:*")
    assert D.MemDeriver(g).validate(((("bool", True), ()),))
    assert not D.MemDeriver(g).validate(((("string", "true"), ()),))


def test_name_grouping_rejected():
    """ParserSpec.hs failure "name grouping": ((a)) is not a name."""
    with pytest.raises(RP.RelapseSyntaxError):
        RP.parse("((a)):*")


def test_colon_free_depth_children():
    """Parser.hs _depthPattern: name[..], name{..}, name.p without ':'."""
    assert v("a[0:*,1:*]", '{"a": [5, 6]}')
    assert not v("a[0:*,1:*]", '{"a": [5]}')
    assert v("a{x:*;y:*}", '{"a": {"y": 1, "x": 2}}')
    # '.' is Contains = [*, p, *]: a top-level subsequence of the child
    # forest, not a deep search
    assert v("a.x:*", '{"a": {"q": 1, "x": 2, "r": 3}}')
    assert not v("a.x:*", '{"a": {"q": {"x": 1}}}')


def test_name_choice_matches_json_dsl():
    g1 = RP.compile_relapse("(a|b):*")
    from katydid_haskell_ray import spec as S
    g2 = S.compile_spec({"main": {"node": {"func": "or", "args": [
        {"func": "eq", "args": [{"var": "string"}, {"string": "a"}]},
        {"func": "eq", "args": [{"var": "string"}, {"string": "b"}]}]},
        "child": "zany"}})
    assert g1.main is g2.main


def test_cast_literals():
    """ParserSpec.hs:76-89 cast cases: int(oct), int(signed), uint, double
    in all its spellings."""
    p = RP._Parser(RP._tokenize("int(0114)"))
    assert p.literal() == {"int": 76}
    assert RP._Parser(RP._tokenize("int(-114)")).literal() == {"int": -114}
    assert RP._Parser(RP._tokenize("uint(114)")).literal() == {"uint": 114}
    assert RP._Parser(RP._tokenize("uint(025)")).literal() == {"uint": 21}
    for bad in ("uint(-12)", "int(-114", "double(1/2)"):
        with pytest.raises(RP.RelapseSyntaxError):
            RP._Parser(RP._tokenize(bad)).literal()
    assert RP._Parser(RP._tokenize("double(2.1)")).literal() == {"double": 2.1}
    assert RP._Parser(RP._tokenize("double(2)")).literal() == {"double": 2.0}
    assert RP._Parser(RP._tokenize("double(2E+2)")).literal() == {"double": 200.0}
    assert RP._Parser(RP._tokenize("double(2E-2)")).literal() == {"double": 0.02}
    assert RP._Parser(RP._tokenize("double(2.1E-2)")).literal() == {"double": 0.021}
    # end-to-end: uint equality only matches uint-typed labels
    assert v("a:== double(1.5)", '{"a": 1.5}')
    assert not v("a:== double(1.5)", '{"a": 1.6}')


def test_list_literals():
    """Parser.hs _listType/newList: typed lists; elements must already
    have the element type (assert, not convert)."""
    assert (RP._Parser(RP._tokenize("[]int{1,2}")).literal()
            == {"list_int": [1, 2]})
    assert (RP._Parser(RP._tokenize('[]string{"a", "b"}')).literal()
            == {"list_string": ["a", "b"]})
    assert (RP._Parser(RP._tokenize("[]double{2.1}")).literal()
            == {"list_double": [2.1]})
    assert (RP._Parser(RP._tokenize("[]uint{uint(1), uint(2)}")).literal()
            == {"list_uint": [1, 2]})
    assert (RP._Parser(RP._tokenize("[]bool{true}")).literal()
            == {"list_bool": [True]})
    b = RP._Parser(RP._tokenize("[][]byte{[]byte{46}, []byte{47}}")).literal()
    assert b == {"list_bytes": ["base64:Lg==", "base64:Lw=="]}
    with pytest.raises(RP.RelapseSyntaxError):  # int into []uint: no convert
        RP._Parser(RP._tokenize("[]uint{1}")).literal()
    with pytest.raises(RP.RelapseSyntaxError):
        RP._Parser(RP._tokenize("[]int{1.5}")).literal()
    # ParserSpec.hs:140 shape, end-to-end through a leaf function
    assert v("a:-> eq($int, length([]int{1,2}))", '{"a": 2}')
    assert not v("a:-> eq($int, length([]int{1,2}))", '{"a": 3}')
    # list membership via contains
    assert v('a:-> contains($string, []string{"x","y"})', '{"a": "y"}')
    assert not v('a:-> contains($string, []string{"x","y"})', '{"a": "z"}')


# Full grammar-level sweep of ParserSpec.hs (:56-350) — every success case
# must parse, every failure case must raise.
_PS_OK = [
    "<empty>", "*", "(*|*)", "(*|*|*)", "(*|*|*|*|*)", "(*&*)", "(*&*&*)",
    "(*)*", "(*)?", "!(*)", "@name", "[*,*]", "[*,*,*]", "{*;*}", "{*;*;*}",
    ".*", "== 1", "->eq($int, 1)", "a:*", "_:*", "_[*,*]", 'a:*="b"',
    '_:*="b"', '._:*="b"', '(._:*="b"|*)',
    "Person:{Name:*;(Addr:*)?;(Email:*)*}",
    '(~="^([ \\t\\r\\n\\v\\f])+$")*',
    'Person:{Name:*;(Addr:*)?;(Email:*)*;(~="^([ \\t\\r\\n\\v\\f])+$")*}',
    "#main = *", "#main = * #a = *", "* #a = *", "* #a = * #b = *",
    "!(A):*", "->type($string)", "<= 0", 'A == "F"',
    "(* & */*spaces*/ )", "A :: $string", "{*;*;}",
    "(a|b):*", "true:*", '"a":*', "!(a):*",
    "== int(0114)", "== uint(114)", "== double(2.1)",
    "->eq($int, length([]int{1,2}))",
]
_PS_FAIL = [
    "(*|*&*)", "(*)", "()", "[*]", "[]", "{}", "{*}", "* *", "((a)):*",
    "== uint(-12)", "eq($bool, 1):*",
]


def test_parserspec_sweep():
    for src in _PS_OK:
        RP.parse(src)  # must not raise
    for src in _PS_FAIL:
        with pytest.raises(Exception):
            RP.parse(src)


def test_relapsespec_mirror():
    """RelapseSpec.hs cases: parse ok/fail, validate, filter, UDF filter."""
    from katydid_haskell_ray import derive as D, trees as T
    from katydid_haskell_ray.exprs.userlib import ensure_userlib

    RP.parse("a == 1")                      # parseGrammar success
    with pytest.raises(Exception):          # parseGrammar failure
        RP.parse("{ a : 1 }")
    g = RP.compile_relapse("a == 1")
    m = D.MemDeriver(g)
    assert m.validate(T.json_to_forest('{"a":1}'))       # validate success
    assert not m.validate(T.json_to_forest('{"a":2}'))   # validate failure
    forests = [T.json_to_forest('{"a":1}'), T.json_to_forest('{"a":2}')]
    kept = [f for f in forests if m.validate(f)]         # filter
    assert kept == [forests[0]]
    ensure_userlib()                        # user defined function
    g2 = RP.compile_relapse("a->isPrime($int)")
    m2 = D.MemDeriver(g2)
    assert m2.validate(T.json_to_forest('{"a":3}'))
    assert not m2.validate(T.json_to_forest('{"a":4}'))
