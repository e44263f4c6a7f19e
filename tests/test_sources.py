"""XML and protobuf tree-source tests (SURVEY.md §2.1 parity).

Protobuf golden shape mirrors the reference's in-module goldens
(/root/reference/src/Data/Katydid/Parser/Protobuf/Protobuf.hs:85-153:
Person/PhoneNumber messages with repeated fields).
"""

import pytest

from katydid_haskell_ray import derive as D
from katydid_haskell_ray import spec as S
from katydid_haskell_ray import trees as T
from katydid_haskell_ray.sources import protobuf as PB


def test_xml_forest_shape():
    f = T.xml_to_forest("<a><b>5</b><c>hello</c></a>")
    (la, ca), = f
    assert la == ("string", "a")
    assert ca[0][0] == ("string", "b") and ca[0][1][0][0] == ("int", 5)
    assert ca[1][0] == ("string", "c") and ca[1][1][0][0] == ("string", "hello")
    # numeric text -> Int (Xml.hs:46-47); forest of multiple roots
    f2 = T.xml_to_forest("<x>1</x><x>two</x>")
    assert f2[0][1][0][0] == ("int", 1)
    assert f2[1][1][0][0] == ("string", "two")


def test_xml_validates_with_grammar():
    doc = {"main": {"field": "a", "child": {"concat": [
        {"field": "b", "child": {"leaf": {"op": "==", "value": {"int": 5}}}},
        {"field": "c", "child": "zany"},
    ]}}}
    g = S.compile_spec(doc)
    assert D.validate_forest(g, T.xml_to_forest("<a><b>5</b><c>x</c></a>"))
    assert not D.validate_forest(g, T.xml_to_forest("<a><b>6</b><c>x</c></a>"))
    assert not D.validate_forest(g, T.xml_to_forest("<a><c>x</c><b>5</b></a>"))


PHONE = {"fields": {1: {"name": "Number", "type": "string"},
                    2: {"name": "Type", "type": "int64"}}}
PERSON = {"fields": {1: {"name": "Name", "type": "string"},
                     2: {"name": "Id", "type": "sint64"},
                     3: {"name": "Phone", "type": "message", "repeated": True,
                         "message": PHONE},
                     4: {"name": "Score", "type": "double"}}}


def _person_bytes():
    phone1 = PB.encode_field(1, "string", "012345") + PB.encode_field(2, "int64", 1)
    phone2 = PB.encode_field(1, "string", "99999")
    return (PB.encode_field(1, "string", "ann")
            + PB.encode_field(2, "sint64", -7)
            + PB.encode_field(3, "message", phone1)
            + PB.encode_field(3, "message", phone2)
            + PB.encode_field(4, "double", 1.5)
            + PB.encode_field(9, "int64", 42))  # unknown field: skipped


def test_protobuf_decode_golden():
    forest = PB.decode_forest(_person_bytes(), PERSON)
    assert [t[0] for t in forest] == [("string", "Name"), ("string", "Id"),
                                      ("string", "Phone"), ("string", "Score")]
    name, pid, phones, score = forest
    assert name[1][0][0] == ("string", "ann")
    assert pid[1][0][0] == ("int", -7)  # zigzag decoded
    assert score[1][0][0] == ("double", 1.5)
    # repeated field -> Int-indexed children (Protobuf.hs:171-183)
    assert [c[0] for c in phones[1]] == [("int", 0), ("int", 1)]
    assert phones[1][0][1][0][0] == ("string", "Number")
    assert phones[1][0][1][0][1][0][0] == ("string", "012345")
    assert phones[1][1][1][0][1][0][0] == ("string", "99999")


def test_protobuf_validates_with_grammar():
    doc = {"main": {"interleave": [
        {"field": "Name", "child": {"leaf": {"op": "^=", "value": {"string": "a"}}}},
        {"field": "Id", "child": {"leaf": {"op": "<", "value": {"int": 0}}}},
        {"field": "Phone", "child": "zany"},
        {"field": "Score", "child": "zany"},
    ]}}
    g = S.compile_spec(doc)
    assert D.MemDeriver(g).validate(PB.decode_forest(_person_bytes(), PERSON))
    # flipping the Id sign breaks the < 0 leaf
    bad = (PB.encode_field(1, "string", "ann") + PB.encode_field(2, "sint64", 7)
           + PB.encode_field(3, "message", b"") + PB.encode_field(4, "double", 0.0))
    assert not D.MemDeriver(g).validate(PB.decode_forest(bad, PERSON))


def test_protobuf_malformed_is_error_not_crash():
    with pytest.raises(PB.ProtoError):
        PB.decode_forest(b"\xff\xff\xff", PERSON)
    with pytest.raises(PB.ProtoError):
        PB.decode_forest(PB.encode_field(1, "string", "ann")[:-2], PERSON)
